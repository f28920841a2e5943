"""Fused (flash) attention Pallas kernel for TPU.

Online-softmax tiling over the KV sequence: the (Lq, Lk) score matrix is
never materialized in HBM — scores, softmax and the PV matmul happen in
VMEM per (q-block, kv-block) tile with running max/sum rescaling.
Today this is the LAVILA_SPATIAL_BIG=flash comparison fallback for the
large-N spatial phase (the production N > 256 route is the token-major
ops/pallas/divided.py:spatial_phase_big, which beat it 336 → 272
ms/step on TSF-L@336 by avoiding the head-major relayout copies) and
the general-purpose fused attention for any (B, H, L, d) layout,
including causal masking.

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


# ==========================================================================
# Differentiable wrapper: custom VJP with Pallas forward+backward.
#
# Forward additionally produces the per-row logsumexp; backward recomputes
# the probabilities blockwise (flash-style) and accumulates dq / dk / dv
# in two kernels (dq gridded q-major, dk/dv gridded kv-major) — the score
# matrix never hits HBM in either direction.
# ==========================================================================


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                *, scale, causal, kv_len, block_q, block_k):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[...]
    k = k_ref[...]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
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

    m_prev = m_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_scr[...] * corr + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[...],
                             (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    acc_scr[...] = acc_scr[...] * corr + pv
    m_scr[...] = m_new
    l_scr[...] = l_new

    @pl.when(ki == nk - 1)
    def _done():
        l = jnp.maximum(l_scr[...], 1e-30)
        o_ref[...] = (acc_scr[...] / l).astype(o_ref.dtype)
        lse_ref[...] = m_scr[...] + jnp.log(l)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               acc_scr, *, scale, causal, kv_len, block_q, block_k):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[...]
    k = k_ref[...]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    G = s.shape[0]
    kv_idx = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (G, block_q, block_k), 2)
    mask = kv_idx < kv_len
    if causal:
        qi = pl.program_id(1)
        q_idx = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (G, block_q, block_k), 1)
        mask = mask & (kv_idx <= q_idx)
    p = jnp.where(mask, jnp.exp(s - lse_ref[...]), 0.0)

    dp = jax.lax.dot_general(do_ref[...].astype(jnp.float32),
                             v_ref[...].astype(jnp.float32),
                             (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[...])
    acc_scr[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale

    @pl.when(ki == nk - 1)
    def _done():
        dq_ref[...] = acc_scr[...].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref,
                dv_ref, dk_scr, dv_scr, *, scale, causal, kv_len, block_q,
                block_k):
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[...]
    k = k_ref[...]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    G = s.shape[0]
    ki2 = pl.program_id(1)
    kv_idx = ki2 * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (G, block_q, block_k), 2)
    mask = kv_idx < kv_len
    if causal:
        q_idx = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (G, block_q, block_k), 1)
        mask = mask & (kv_idx <= q_idx)
    p = jnp.where(mask, jnp.exp(s - lse_ref[...]), 0.0)

    do = do_ref[...].astype(jnp.float32)
    # dv += p^T @ do  — contract over the q axis
    dv_scr[...] += jax.lax.dot_general(
        p, do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v_ref[...].astype(jnp.float32),
                             (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[...])
    dk_scr[...] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale

    @pl.when(qi == nq - 1)
    def _done():
        dk_ref[...] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_scr[...].astype(dv_ref.dtype)


def _prep(q, k, v, block_q, block_k, block_bh):
    B, H, Lq, d = q.shape
    Lk = k.shape[2]
    qp = _pad_to(_pad_to(q.reshape(B * H, Lq, d), 1, block_q), 0, block_bh)
    kp = _pad_to(_pad_to(k.reshape(B * H, Lk, d), 1, block_k), 0, block_bh)
    vp = _pad_to(_pad_to(v.reshape(B * H, Lk, d), 1, block_k), 0, block_bh)
    return qp, kp, vp


def _specs(block_bh, block_q, block_k, d):
    qspec = pl.BlockSpec((block_bh, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((block_bh, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((block_bh, block_q, 1),
                           lambda b, i, j: (b, i, 0),
                           memory_space=pltpu.VMEM)
    return qspec, kspec, rowspec


def _fused_fwd_impl(q, k, v, causal, scale, block_q, block_k, block_bh,
                    interpret):
    B, H, Lq, d = q.shape
    Lk = k.shape[2]
    bq = min(block_q, _round_up(Lq, 8))
    bk = min(block_k, _round_up(Lk, 8))
    qp, kp, vp = _prep(q, k, v, bq, bk, block_bh)
    nbh, nq, nk = (qp.shape[0] // block_bh, qp.shape[1] // bq,
                   kp.shape[1] // bk)
    qspec, kspec, rowspec = _specs(block_bh, bq, bk, d)
    kernel = functools.partial(_fwd_kernel, scale=scale, causal=causal,
                               kv_len=Lk, block_q=bq, block_k=bk)
    o, lse = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(qp.shape, q.dtype),
                   jax.ShapeDtypeStruct(qp.shape[:2] + (1,), jnp.float32)),
        grid=(nbh, nq, nk),
        in_specs=[qspec, kspec, kspec],
        out_specs=(qspec, rowspec),
        scratch_shapes=[
            pltpu.VMEM((block_bh, bq, 1), jnp.float32),
            pltpu.VMEM((block_bh, bq, 1), jnp.float32),
            pltpu.VMEM((block_bh, bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qp, kp, vp)
    out = o[:, :Lq].reshape(-1, Lq, d)[:B * H].reshape(B, H, Lq, d)
    return out, (qp, kp, vp, lse, o)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(3, 4, 5, 6, 7, 8))
def fused_attention(q, k, v, causal=False, scale=None, block_q=256,
                    block_k=256, block_bh=8, interpret=False):
    """Differentiable fused attention: q (B, H, Lq, d), k/v (B, H, Lk, d).
    Forward and backward are both Pallas kernels — the (Lq, Lk) score
    matrix never materializes in HBM, removing the fp32 score temps that
    dominate HBM in the XLA path."""
    scale = (q.shape[-1] ** -0.5) if scale is None else scale
    out, _ = _fused_fwd_impl(q, k, v, causal, scale, block_q, block_k,
                             block_bh, interpret)
    return out


def _fused_fwd(q, k, v, causal, scale, block_q, block_k, block_bh,
               interpret):
    scale = (q.shape[-1] ** -0.5) if scale is None else scale
    out, res = _fused_fwd_impl(q, k, v, causal, scale, block_q, block_k,
                               block_bh, interpret)
    return out, res + (q.shape, k.shape)


def _fused_bwd(causal, scale, block_q, block_k, block_bh, interpret, res,
               g):
    qp, kp, vp, lse, op, q_shape, k_shape = res
    B, H, Lq, d = q_shape
    Lk = k_shape[2]
    scale = (d ** -0.5) if scale is None else scale
    bq = min(block_q, _round_up(Lq, 8))
    bk = min(block_k, _round_up(Lk, 8))
    nbh, nq, nk = (qp.shape[0] // block_bh, qp.shape[1] // bq,
                   kp.shape[1] // bk)

    gp = _pad_to(_pad_to(g.reshape(B * H, Lq, d), 1, bq), 0, block_bh)
    delta = jnp.sum(gp.astype(jnp.float32) * op.astype(jnp.float32),
                    axis=-1, keepdims=True)

    qspec, kspec, rowspec = _specs(block_bh, bq, bk, d)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, causal=causal,
                          kv_len=Lk, block_q=bq, block_k=bk),
        out_shape=jax.ShapeDtypeStruct(qp.shape, qp.dtype),
        grid=(nbh, nq, nk),
        in_specs=[qspec, kspec, kspec, qspec, rowspec, rowspec],
        out_specs=qspec,
        scratch_shapes=[pltpu.VMEM((block_bh, bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qp, kp, vp, gp, lse, delta)

    kvspec = pl.BlockSpec((block_bh, bk, d), lambda b, j, i: (b, j, 0),
                          memory_space=pltpu.VMEM)
    qspec2 = pl.BlockSpec((block_bh, bq, d), lambda b, j, i: (b, i, 0),
                          memory_space=pltpu.VMEM)
    rowspec2 = pl.BlockSpec((block_bh, bq, 1), lambda b, j, i: (b, i, 0),
                            memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, causal=causal,
                          kv_len=Lk, block_q=bq, block_k=bk),
        out_shape=(jax.ShapeDtypeStruct(kp.shape, kp.dtype),
                   jax.ShapeDtypeStruct(kp.shape, kp.dtype)),
        grid=(nbh, nk, nq),
        in_specs=[qspec2, kvspec, kvspec, qspec2, rowspec2, rowspec2],
        out_specs=(kvspec, kvspec),
        scratch_shapes=[pltpu.VMEM((block_bh, bk, d), jnp.float32),
                        pltpu.VMEM((block_bh, bk, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qp, kp, vp, gp, lse, delta)

    def unpad_q(x):
        return x[:, :Lq].reshape(-1, Lq, d)[:B * H].reshape(B, H, Lq, d)

    def unpad_k(x):
        return x[:, :Lk].reshape(-1, Lk, d)[:B * H].reshape(B, H, Lk, d)

    return unpad_q(dq), unpad_k(dk), unpad_k(dv)


fused_attention.defvjp(_fused_fwd, _fused_bwd)
