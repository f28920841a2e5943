"""Fused single-query decode attention over a flat (B, K, D) KV cache.

Inference-only (no VJP): one VMEM pass per layer per decode step for the
narrator's KV-cache self-attention — the default route for big decoders
(D >= 1280) at every B >= 16 since round 5 (measured over the XLA
forms: XL 29.7 vs 27.4 narr/s b16, 68.6 vs 52.3 b64, 82.7 vs 75.7
b128).

Why a kernel: at B >= 128 the XLA mul-reduce formulation
(models/gpt2.py:_mulreduce_decode_attention) leaves the f32 product,
probs broadcast and reductions partially unfused — the adopted-path
xplane trace showed ~5-8 ms/step of standalone `reduce` /
`broadcast_in_dim` / `convert_multiply` ops re-streaming (B, K, D)
temporaries through HBM. Here the whole per-layer attention is computed
from one read of the k/v slabs:

  * per batch row, scores are a full-width MXU dot of the (K, D) key
    slab against q ⊙ seg — the head-segment matrix trick from
    ops/pallas/divided.py; never lane-slice 64-dim heads out of D
    (Mosaic pays VPU repacks for in-lane segment reductions).
  * softmax (f32) over the K cached positions PLUS the current token's
    precomputed per-head score (`score_new`, built by the caller — a
    1-row segmented dot, which Mosaic cannot lower, but XLA does fine).
  * the output accumulates probs @ segᵀ ⊙ v with a sublane reduce
    over K; the current token's probability row is RETURNED (B, H) and
    applied to (k_new, v_new) by the caller in XLA.

HBM traffic = k + v slabs in, (B, D) out — the floor. The kernel is
numerically the same math as models/gpt2.py:_segmented_decode_attention
(equivalence-tested in interpret mode, tests/test_decode_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, seg_ref, segt_ref, sn_ref, bias_ref,
            out_ref, pnew_ref, *, scale: float, block_b: int):
    # q/score_new/outputs are blocked (block_b, 1, X): Mosaic constrains
    # the LAST TWO block dims ((8, 128)-divisible or equal to the array
    # dims) — a middle singleton makes them (1, X), both array-equal, so
    # any block_b (e.g. 4 at B=16, where (4, X) is illegal) lowers
    segf = seg_ref[...].astype(jnp.float32)               # (D, H)
    segt = segt_ref[...]                                  # (H, D)
    bias = bias_ref[...].astype(jnp.float32)              # (K, 1)
    for i in range(block_b):
        # minor-dim insertion is only lowerable for 32-bit types, so the
        # (D,) -> (D, 1) step happens in f32 and casts back for the dot
        qcol = q_ref[i, 0].astype(jnp.float32)[:, None]   # (D, 1)
        q_seg = (qcol * segf).astype(k_ref.dtype)         # (D, H)
        scores = jax.lax.dot(
            k_ref[i], q_seg,
            preferred_element_type=jnp.float32)           # (K, H)
        scores = scores * scale + bias
        s_new = sn_ref[i, 0].astype(jnp.float32) * scale  # (H,)
        m = jnp.maximum(jnp.max(scores, axis=0), s_new)   # (H,)
        e_old = jnp.exp(scores - m[None])                 # (K, H)
        e_new = jnp.exp(s_new - m)                        # (H,)
        z = jnp.sum(e_old, axis=0) + e_new
        p_old = (e_old / z[None]).astype(k_ref.dtype)
        pnew_ref[i, 0] = (e_new / z).astype(pnew_ref.dtype)
        p_exp = jax.lax.dot(
            p_old, segt,
            preferred_element_type=jnp.float32)           # (K, D)
        out = jnp.sum(p_exp * v_ref[i].astype(jnp.float32), axis=0)
        out_ref[i, 0] = out.astype(out_ref.dtype)


def max_block_b(K: int, D: int, itemsize: int = 2) -> int:
    """Largest batch-block whose double-buffered k/v slabs + f32 temps
    fit a ~10 MB VMEM budget (16 MB scoped on v5e, slack for Mosaic
    temporaries — same discipline as divided.py:_time_nblock). Returns
    0 when even one row does not fit: callers must then fall back to
    the XLA formulation instead of letting Mosaic fail at K ~ 256+."""
    per_row = (2 * 2 * K * D * itemsize      # k, v slabs, double-buffered
               + 2 * K * D * 4)              # f32 scores/p_exp temps
    return int(1e7) // per_row


def effective_block_b(B: int, K: int, D: int, itemsize: int = 2,
                      block_b: int = 8) -> int:
    """Batch block the kernel will actually run at: the largest divisor
    of B within the VMEM cap (edge blocks would softmax garbage rows,
    so the block must divide B). A prime B (131 → 1) degrades the
    kernel to one-row blocks where the unrolled loop loses to the XLA
    mul-reduce — callers must route away when this drops below 2
    (block_b=2 is the measured-winning XL b128 config; models/gpt2.py's
    B >= 128 branch guards on it). 0 = slabs don't fit VMEM at all.

    Note the divisor search, not halving: the cap is usually odd-ish
    (XL K=77 → cap 5) and halving from it would run B=128 at block 2
    when 4 divides it."""
    cap = min(block_b, max_block_b(K, D, itemsize), B)
    if cap < 1:
        return 0
    for bb in range(cap, 0, -1):
        if B % bb == 0:
            return bb
    return 1


def decode_attention_fused(q, k_cache, v_cache, k_new, v_new,
                           num_valid, n_head: int, head_dim: int,
                           block_b: int = 8, interpret: bool = False):
    """(B, 1, D) single-query attention; same contract as
    models/gpt2.py:_segmented_decode_attention with a non-None new
    token. ``num_valid``: cache positions < it are attended (the
    current token is always attended via (k_new, v_new))."""
    B, _, D = q.shape
    K = k_cache.shape[1]
    H, d = n_head, head_dim
    dtype = q.dtype
    qf = q[:, 0]
    from lavila_tpu.ops.basic import head_segments
    seg = head_segments(H, d, dtype)                      # (D, H)
    # current token's per-head score: 1-row segmented dot — Mosaic
    # can't lower 1-row dots, XLA can (divided.py has the same split)
    score_new = jnp.einsum("bD,Dh->bh",
                           qf * k_new[:, 0].astype(dtype), seg,
                           preferred_element_type=jnp.float32)
    bias = jnp.where(jnp.arange(K) < num_valid, 0.0,
                     jnp.finfo(jnp.float32).min)[:, None]  # (K, 1)
    scale = 1.0 / float(d) ** 0.5

    block_b = effective_block_b(B, K, D, jnp.dtype(dtype).itemsize,
                                block_b)
    if block_b < 1:
        raise ValueError(
            f"(K={K}, D={D}) k/v slabs exceed the VMEM budget even at "
            "block_b=1 — route to the XLA formulation instead "
            "(check effective_block_b before calling)")
    grid = (pl.cdiv(B, block_b),)
    bspec = lambda *shape: pl.BlockSpec(                  # noqa: E731
        (block_b,) + shape, lambda b: (b,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(                   # noqa: E731
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
    out_old, p_new = pl.pallas_call(
        functools.partial(_kernel, scale=scale, block_b=block_b),
        out_shape=(jax.ShapeDtypeStruct((B, 1, D), dtype),
                   jax.ShapeDtypeStruct((B, 1, H), jnp.float32)),
        grid=grid,
        in_specs=[bspec(1, D), bspec(K, D), bspec(K, D),
                  full(D, H), full(H, D), bspec(1, H), full(K, 1)],
        out_specs=(bspec(1, D), bspec(1, H)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(qf[:, None], k_cache.astype(dtype), v_cache.astype(dtype), seg,
      seg.T, score_new[:, None], bias)
    out = (out_old[:, 0]
           + (p_new[:, 0].astype(dtype) @ seg.T) * v_new[:, 0].astype(dtype))
    return out[:, None]
