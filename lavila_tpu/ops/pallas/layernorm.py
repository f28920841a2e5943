"""Fused LayerNorm (TPU Pallas): one HBM pass each way.

Why: the round-3 xplane ledger (scripts/parse_xplane.py over a TSF-B
batch-16 step) attributed ~18 ms of the 90 ms step to LayerNorm — ~9.2
ms of backward stat fusions (f32[R] mean/ms recomputes + dgamma/dbeta
reduces) and most of a 9.3 ms convert_reduce bucket (forward fp32
stats) — for an op whose FLOPs are negligible. XLA materializes fp32
row stats in HBM and re-reads x across the fused reduce passes.

Layout lesson (measured): the first version flattened inputs to
(rows, D). That reshape is NOT free on TPU — the last TWO dims are
tiled (8, 128), so merging (…, 196, 768) row axes repacks sublanes
(196 % 8 != 0) and cost ~6 ms/step of reshape+copy. This version keeps
the input as (G, R, D): leading axes merge freely (only the minor two
are tiled), each block is one (1, rb, D) slab, and no relayout is ever
generated.

Each direction is a single pass over slabs held in VMEM:

  * forward: read x slab(s) → fp32 mean / one-pass variance (E[x²]−E[x]²,
    matching ops/basic.py:LayerNorm) → y in the input dtype. No stats
    land in HBM.
  * backward: read x (or recompute it from the residual pair) and dy
    slabs → RECOMPUTE mean/rstd in VMEM (VPU work is free next to the
    HBM stream; saving (R,) stats would cost lane-padded f32 writes
    bigger than the win) → dx, plus dgamma/dbeta accumulated across the
    sequential grid (same pattern as the dck/dcv accumulators in
    ops/pallas/divided.py).

Three public variants share the two kernels below via static flags:

  * ``fused_layernorm(x)``                — y = LN(x)
  * ``fused_add_layernorm(a, b)``         — (LN(a+b), a+b): the sum is
    needed again as the residual carry, so fwd emits it and bwd reads
    it back (2 reads + 2 writes fwd, 3 reads + 1 write bwd, the
    upstream d(sum) folding into dx in VMEM)
  * ``fused_add_layernorm_nosum(a, b)``   — LN(a+b) when the sum is NOT
    needed downstream: it never touches HBM; bwd recomputes it from
    (a, b) in VMEM (2 reads + 1 write fwd, 3 reads + 1 write bwd)

HBM traffic is the floor for every direction. The elementwise math
mirrors the reference's fp16-safe LayerNorm semantics
(reference: lavila/models/openai_model.py:168-174) with fp32 statistics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats(x, eps: float):
    d = x.shape[-1]
    mean = jnp.sum(x, axis=-1, keepdims=True) / d
    ms = jnp.sum(x * x, axis=-1, keepdims=True) / d
    var = jnp.maximum(ms - mean * mean, 0.0)
    return mean, jax.lax.rsqrt(var + eps)


def _fwd_kernel(*refs, eps: float, two_inputs: bool, emit_sum: bool):
    """y = LN(x) with x = a + b when ``two_inputs`` (optionally also
    writing the sum when ``emit_sum``)."""
    refs = list(refs)
    if two_inputs:
        x = refs.pop(0)[0].astype(jnp.float32) \
            + refs.pop(0)[0].astype(jnp.float32)
    else:
        x = refs.pop(0)[0].astype(jnp.float32)          # (rb, D)
    s_ref, b_ref, y_ref = refs[0], refs[1], refs[2]
    if emit_sum:
        refs[3][0] = x.astype(refs[3].dtype)
    mean, rstd = _stats(x, eps)
    y = (x - mean) * rstd * s_ref[...].astype(jnp.float32) \
        + b_ref[...].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)


def _bwd_kernel(*refs, eps: float, num_rows: int, two_inputs: bool,
                has_dsum: bool):
    """dx (+ upstream d(sum) when ``has_dsum``) and grid-accumulated
    dgamma/dbeta; x is read directly or recomputed as a + b."""
    refs = list(refs)
    if two_inputs:
        x = refs.pop(0)[0].astype(jnp.float32)
        x = x + refs.pop(0)[0].astype(jnp.float32)
    else:
        x = refs.pop(0)[0].astype(jnp.float32)          # (rb, D)
    sc_ref, dy_ref = refs.pop(0), refs.pop(0)
    dsum_ref = refs.pop(0) if has_dsum else None
    dx_ref, ds_ref, db_ref = refs

    g = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when(jnp.logical_and(g == 0, r == 0))
    def _init():
        ds_ref[...] = jnp.zeros_like(ds_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dy = dy_ref[0].astype(jnp.float32)
    scale = sc_ref[...].astype(jnp.float32)             # (1, D)
    rb = x.shape[0]
    d = x.shape[-1]
    mean, rstd = _stats(x, eps)
    xhat = (x - mean) * rstd
    gg = dy * scale
    gm = jnp.sum(gg, axis=-1, keepdims=True) / d
    gxm = jnp.sum(gg * xhat, axis=-1, keepdims=True) / d
    dx = rstd * (gg - gm - xhat * gxm)
    if has_dsum:
        dx = dx + dsum_ref[0].astype(jnp.float32)       # upstream ds folds in
    dx_ref[0] = dx.astype(dx_ref.dtype)
    # R-edge blocks are padded past num_rows with unspecified values;
    # the dgamma/dbeta reductions must not see them (dx writes in the
    # padding are discarded by the block writer)
    row = r * rb + jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)
    valid = row < num_rows
    ds_ref[...] += jnp.sum(jnp.where(valid, dy * xhat, 0.0),
                           axis=0, keepdims=True)
    db_ref[...] += jnp.sum(jnp.where(valid, dy, 0.0),
                           axis=0, keepdims=True)


def _row_block(R: int, D: int, itemsize: int, bwd: bool) -> int:
    """Row tile from a ~6 MB VMEM budget (16 MB scoped on v5e, slack for
    Mosaic temporaries): double-buffered in/out slabs + live fp32
    temps."""
    per = (2 * (2 + (3 if bwd else 0)) * D * itemsize   # x[,dy,dx] dbuf
           + (4 if bwd else 3) * D * 4)                 # fp32 temps
    cap = max(8, (int(6e6) // per) // 8 * 8)
    if cap >= R:
        return R
    nblocks = pl.cdiv(R, cap)
    return min(cap, -(-pl.cdiv(R, nblocks) // 8) * 8)


def _specs(G, R, D, rb):
    slab = pl.BlockSpec((1, rb, D), lambda g, r: (g, r, 0),
                        memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, D), lambda g, r: (0, 0),
                       memory_space=pltpu.VMEM)
    return slab, vec, (G, pl.cdiv(R, rb))


def _fwd_call(xs: tuple, scale, bias, eps, interpret, emit_sum: bool):
    """xs: one (G, R, D) input, or the (a, b) residual pair."""
    G, R, D = xs[0].shape
    two = len(xs) == 2
    rb = _row_block(R, D, xs[0].dtype.itemsize, bwd=two)  # 3-4 slabs live
    slab, vec, grid = _specs(G, R, D, rb)
    sds = jax.ShapeDtypeStruct(xs[0].shape, xs[0].dtype)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, two_inputs=two,
                          emit_sum=emit_sum),
        out_shape=(sds, sds) if emit_sum else sds,
        grid=grid,
        in_specs=[slab] * len(xs) + [vec, vec],
        out_specs=(slab, slab) if emit_sum else slab,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*xs, scale.reshape(1, D), bias.reshape(1, D))


def _bwd_call(xs: tuple, scale, dy, dsum, eps, interpret):
    """xs: the saved sum (or plain x), or the (a, b) pair to re-add;
    ``dsum``: upstream gradient of the emitted sum (or None)."""
    G, R, D = xs[0].shape
    rb = _row_block(R, D, xs[0].dtype.itemsize, bwd=True)
    slab, vec, grid = _specs(G, R, D, rb)
    operands = list(xs) + [scale.reshape(1, D), dy]
    in_specs = [slab] * len(xs) + [vec, slab]
    if dsum is not None:
        operands.append(dsum)
        in_specs.append(slab)
    dx, ds, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, num_rows=R,
                          two_inputs=len(xs) == 2, has_dsum=dsum is not None),
        out_shape=(jax.ShapeDtypeStruct(xs[0].shape, xs[0].dtype),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32)),
        grid=grid,
        in_specs=in_specs,
        out_specs=(slab, vec, vec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*operands)
    return dx, ds.reshape(D), db.reshape(D)


# -- y = LN(x) ------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layernorm(x, scale, bias, eps: float = 1e-5,
                    interpret: bool = False):
    """LayerNorm over the last axis of 3-D ``x`` (G, R, D) with fp32
    statistics; ``scale``/``bias`` are (D,) fp32. Returns ``x.dtype``.
    Callers merge LEADING axes only — the minor two dims are TPU-tiled,
    so (…, R, D) must arrive un-flattened (see ops/basic.py:LayerNorm)."""
    return _fwd_call((x,), scale, bias, eps, interpret, emit_sum=False)


def _vjp_fwd(x, scale, bias, eps, interpret):
    return (_fwd_call((x,), scale, bias, eps, interpret, emit_sum=False),
            (x, scale))


def _vjp_bwd(eps, interpret, res, dy):
    x, scale = res
    return _bwd_call((x,), scale, dy, None, eps, interpret)


fused_layernorm.defvjp(_vjp_fwd, _vjp_bwd)


# -- (y, s) = (LN(a + b), a + b) ------------------------------------------
# The transformer-block pattern `s = x + attn_out; y = norm(s)` costs XLA
# an extra full pass over s (the add fuses into neither the LN stats nor
# a Pallas LN's boundary — measured 5.2 ms/step of add_add fusions once
# plain fused LN replaced the XLA LN).


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_add_layernorm(a, b, scale, bias, eps: float = 1e-5,
                        interpret: bool = False):
    """``(LN(a + b), a + b)`` over the last axis of 3-D (G, R, D) inputs.
    The sum is returned because transformer blocks need it as the
    residual carry; fusing keeps it to one HBM round trip."""
    return _fwd_call((a, b), scale, bias, eps, interpret, emit_sum=True)


def _add_vjp_fwd(a, b, scale, bias, eps, interpret):
    y, s = _fwd_call((a, b), scale, bias, eps, interpret, emit_sum=True)
    return (y, s), (s, scale)


def _add_vjp_bwd(eps, interpret, res, grads):
    dy, dsum = grads
    s, scale = res
    dx, ds, db = _bwd_call((s,), scale, dy, dsum, eps, interpret)
    # s = a + b: both inputs receive the same gradient
    return dx, dx, ds, db


fused_add_layernorm.defvjp(_add_vjp_fwd, _add_vjp_bwd)


# -- y = LN(a + b), sum not needed downstream -----------------------------
# (e.g. the frozen-in-time block's time residual, which only feeds
# norm1 — the spatial residual reconnects to the block input,
# reference timesformer.py:191-193)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_add_layernorm_nosum(a, b, scale, bias, eps: float = 1e-5,
                              interpret: bool = False):
    """``LN(a + b)`` when the sum itself is NOT needed downstream — the
    sum never touches HBM in either direction."""
    return _fwd_call((a, b), scale, bias, eps, interpret, emit_sum=False)


def _addns_vjp_fwd(a, b, scale, bias, eps, interpret):
    return (_fwd_call((a, b), scale, bias, eps, interpret, emit_sum=False),
            (a, b, scale))


def _addns_vjp_bwd(eps, interpret, res, dy):
    a, b, scale = res
    dx, ds, db = _bwd_call((a, b), scale, dy, None, eps, interpret)
    return dx, dx, ds, db


fused_add_layernorm_nosum.defvjp(_addns_vjp_fwd, _addns_vjp_bwd)
