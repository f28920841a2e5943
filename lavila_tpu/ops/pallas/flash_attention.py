"""Fused (flash) attention Pallas kernel for TPU.

Online-softmax tiling over the KV sequence: the (Lq, Lk) score matrix is
never materialized in HBM — scores, softmax and the PV matmul happen in
VMEM per (q-block, kv-block) tile with running max/sum rescaling. Used
for the TimeSformer's divided space-time attention groups (CLS-prepended
keys) and the text towers' causal attention.

Layouts: q (B, H, Lq, d), k/v (B, H, Lk, d) — callers fold extra batch
axes (frames/positions groups) into B. Supports:
  * kv_len masking (padded keys),
  * causal masking (absolute, for equal q/kv lengths),
  * bf16 inputs with fp32 accumulation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
            scale: float, causal: bool, kv_len: int, block_q: int,
            block_k: int):
    """Blocks carry a folded (batch·head) leading axis of size block_bh —
    one program computes attention for several heads at once, keeping the
    MXU busy despite the short (~200-token) sequences."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[...]                    # (G, block_q, d)
    k = k_ref[...]                    # (G, block_k, d)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale   # (G, bq, bk)
    G = s.shape[0]

    kv_idx = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (G, block_q, block_k), 2)
    mask = kv_idx < kv_len
    if causal:
        qi = pl.program_id(1)
        q_idx = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (G, block_q, block_k), 1)
        mask = mask & (kv_idx <= q_idx)
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_scr[...]               # (G, block_q, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    correction = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)            # (G, bq, bk)
    l_new = l_scr[...] * correction + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    acc_scr[...] = acc_scr[...] * correction + pv
    m_scr[...] = m_new
    l_scr[...] = l_new

    @pl.when(ki == nk - 1)
    def _finish():
        o_ref[...] = (acc_scr[...] /
                      jnp.maximum(l_scr[...], 1e-30)).astype(o_ref.dtype)


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("causal", "scale", "block_q",
                                             "block_k", "block_bh",
                                             "interpret"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    causal: bool = False, scale: Optional[float] = None,
                    block_q: int = 256, block_k: int = 256,
                    block_bh: int = 8,
                    interpret: bool = False) -> jax.Array:
    """q (B, H, Lq, d), k/v (B, H, Lk, d) → (B, H, Lq, d)."""
    B, H, Lq, d = q.shape
    Lk = k.shape[2]
    scale = d ** -0.5 if scale is None else scale
    block_q = min(block_q, _round_up(Lq, 8))
    block_k = min(block_k, _round_up(Lk, 8))

    qp = _pad_to(_pad_to(q.reshape(B * H, Lq, d), 1, block_q), 0, block_bh)
    kp = _pad_to(_pad_to(k.reshape(B * H, Lk, d), 1, block_k), 0, block_bh)
    vp = _pad_to(_pad_to(v.reshape(B * H, Lk, d), 1, block_k), 0, block_bh)
    nbh = qp.shape[0] // block_bh
    nq = qp.shape[1] // block_q
    nk = kp.shape[1] // block_k

    kernel = functools.partial(_kernel, scale=scale, causal=causal,
                               kv_len=Lk, block_q=block_q, block_k=block_k)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        grid=(nbh, nq, nk),
        in_specs=[
            pl.BlockSpec((block_bh, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_bh, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_bh, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_bh, block_q, d),
                               lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_bh, block_q, 1), jnp.float32),
            pltpu.VMEM((block_bh, block_q, 1), jnp.float32),
            pltpu.VMEM((block_bh, block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :Lq].reshape(-1, Lq, d)[:B * H].reshape(B, H, Lq, d)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
