"""Fused divided space-time attention phase kernels (TPU Pallas).

The XLA formulations of the TimeSformer's divided attention
(reference timesformer.py:87-144) are HBM-bound: grouped relayouts, CLS
k/v concatenation and fp32 score/prob temps all materialize in HBM, and
measured on v5e they cost ~86 ms of a 153 ms TSF-B step (batch 16) for
<5% of the FLOPs. These kernels compute a WHOLE phase per block in VMEM:

  * inputs stay token-major ``(B, F, N, D)`` with ``D = H·dh``
    contiguous — a free reshape of the qkv projection output; no grouped
    transpose or CLS concat ever hits HBM;
  * per block, per head: scores, softmax (fp32) and the PV combine all
    live in VMEM; the only HBM traffic is q/k/v in, out (+ tiny lse);
  * the CLS token's key/value is passed as a separate ``(B, D)`` row and
    folded into every group's softmax (reference semantics: CLS k/v are
    visible to every group);
  * the CLS token's own (global) query row is computed by the caller —
    it is one query over L keys, cheap in XLA;
  * custom VJP: the backward recomputes probabilities blockwise from the
    saved row statistics (lse) and accumulates dq/dk/dv/dcls in one
    kernel pass per phase. Scores never hit HBM in either direction.

Spatial phase: one grid step per (batch, frame), groups of N+1 keys on
the MXU. Temporal phase: one grid step per (batch, N-slab), F·(F+1) score
planes as VPU mul-reduces (F ≤ 8 makes MXU matmuls pointless here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


# ==========================================================================
# spatial phase: grid (B, F); block = one frame's (N, D) tokens
# ==========================================================================


def _space_fwd_kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, o_ref, lse_ref,
                      *, heads: int, scale: float):
    dh = q_ref.shape[-1] // heads
    for h in range(heads):
        sl = pl.ds(h * dh, dh)
        qh = q_ref[0, 0, :, sl]                          # (N, dh)
        kh = k_ref[0, 0, :, sl]
        vh = v_ref[0, 0, :, sl]
        ckh = ck_ref[0, :, sl]                           # (1, dh)
        cvh = cv_ref[0, :, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (N, N)
        # CLS column as a VPU mul-reduce: Mosaic can't lower a dot with a
        # 1-row operand (vector.broadcast elt-type verify failure).
        s_cls = jnp.sum(qh.astype(jnp.float32) * ckh.astype(jnp.float32),
                        axis=-1, keepdims=True) * scale   # (N, 1)
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_cls)
        p = jnp.exp(s - m)
        p_cls = jnp.exp(s_cls - m)
        l = jnp.sum(p, axis=-1, keepdims=True) + p_cls
        o = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o = (o + p_cls * cvh.astype(jnp.float32)) / l
        o_ref[0, 0, :, sl] = o.astype(o_ref.dtype)
        lse_ref[0, 0, :, h] = (m + jnp.log(l))[:, 0]


def _space_bwd_kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, do_ref, lse_ref,
                      delta_ref, dq_ref, dk_ref, dv_ref, dck_ref, dcv_ref,
                      *, heads: int, scale: float):
    f = pl.program_id(1)

    @pl.when(f == 0)
    def _init():
        dck_ref[...] = jnp.zeros_like(dck_ref)
        dcv_ref[...] = jnp.zeros_like(dcv_ref)

    dh = q_ref.shape[-1] // heads
    for h in range(heads):
        sl = pl.ds(h * dh, dh)
        qh = q_ref[0, 0, :, sl]
        kh = k_ref[0, 0, :, sl]
        vh = v_ref[0, 0, :, sl]
        ckh = ck_ref[0, :, sl].astype(jnp.float32)
        cvh = cv_ref[0, :, sl].astype(jnp.float32)
        doh = do_ref[0, 0, :, sl].astype(jnp.float32)
        lse = lse_ref[0, 0, :, h][:, None]                # (N, 1)
        delta = delta_ref[0, 0, :, h][:, None]            # (N, 1)

        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s_cls = jnp.sum(qh.astype(jnp.float32) * ckh, axis=-1,
                        keepdims=True) * scale
        p = jnp.exp(s - lse)                               # (N, N)
        p_cls = jnp.exp(s_cls - lse)                       # (N, 1)

        dp = jax.lax.dot_general(
            doh, vh.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (N, N)
        dp_cls = jnp.sum(doh * cvh, axis=-1, keepdims=True)
        ds = p * (dp - delta)
        ds_cls = p_cls * (dp_cls - delta)                  # (N, 1)

        dq = jax.lax.dot_general(
            ds.astype(kh.dtype), kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq = (dq + ds_cls * ckh) * scale
        dk = jax.lax.dot_general(
            ds.astype(qh.dtype), qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dv = jax.lax.dot_general(
            p.astype(doh.dtype), doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_ref[0, 0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, 0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0, :, sl] = dv.astype(dv_ref.dtype)
        dck = jnp.sum(ds_cls * qh.astype(jnp.float32), axis=0,
                      keepdims=True) * scale               # (1, dh)
        dcv = jnp.sum(p_cls * doh, axis=0, keepdims=True)
        dck_ref[0, :, sl] += dck.astype(dck_ref.dtype)
        dcv_ref[0, :, sl] += dcv.astype(dcv_ref.dtype)


# ==========================================================================
# temporal phase: grid (B, N/Nb); block = an (F, Nb, D) slab of one clip.
# F is tiny, so scores are VPU mul-reduces — no matmuls, no relayout.
# ==========================================================================


def _time_scores(qh, kh, ckh, scale):
    """qh/kh: (F, N, dh); ckh (1, dh) → fp32 scores (F, N, F+1)."""
    F = qh.shape[0]
    q32 = qh.astype(jnp.float32)
    cols = [jnp.sum(q32 * kh[g][None].astype(jnp.float32), axis=-1)
            for g in range(F)]                            # each (F, N)
    cols.append(jnp.sum(q32 * ckh[None].astype(jnp.float32), axis=-1))
    return jnp.stack(cols, axis=-1) * scale               # (F, N, F+1)


def _time_fwd_kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, o_ref, lse_ref,
                     *, heads: int, num_frames: int, scale: float):
    F = num_frames
    dh = q_ref.shape[-1] // heads
    for h in range(heads):
        sl = pl.ds(h * dh, dh)
        qh = q_ref[0, :, :, sl]                           # (F, N, dh)
        kh = k_ref[0, :, :, sl]
        vh = v_ref[0, :, :, sl]
        ckh = ck_ref[0, :, sl]                            # (1, dh)
        cvh = cv_ref[0, :, sl]
        s = _time_scores(qh, kh, ckh, scale)              # (F, N, F+1)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pn = (p / l).astype(q_ref.dtype)                  # (F, N, F+1)
        o = pn[:, :, F:F + 1] * cvh[None].astype(q_ref.dtype)
        for g in range(F):
            o = o + pn[:, :, g:g + 1] * vh[g][None]
        o_ref[0, :, :, sl] = o.astype(o_ref.dtype)
        lse_ref[0, :, :, h] = (m + jnp.log(l))[..., 0]


def _time_bwd_kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, do_ref, lse_ref,
                     delta_ref, dq_ref, dk_ref, dv_ref, dck_ref, dcv_ref,
                     *, heads: int, num_frames: int, num_tokens: int,
                     scale: float):
    F = num_frames
    n = pl.program_id(1)  # grid (B, ⌈N/Nb⌉): dck/dcv accumulate over n-steps

    @pl.when(n == 0)
    def _init():
        dck_ref[...] = jnp.zeros_like(dck_ref)
        dcv_ref[...] = jnp.zeros_like(dcv_ref)

    # Edge blocks are padded past num_tokens with unspecified values; rows
    # beyond the true N must not contribute to the dck/dcv reductions
    # (dq/dk/dv writes in the padded region are simply discarded).
    Nb = q_ref.shape[2]
    row = n * Nb + jax.lax.broadcasted_iota(jnp.int32, (1, Nb, 1), 1)
    valid = row < num_tokens                              # (1, Nb, 1)

    dh = q_ref.shape[-1] // heads
    for h in range(heads):
        sl = pl.ds(h * dh, dh)
        qh = q_ref[0, :, :, sl]
        kh = k_ref[0, :, :, sl]
        vh = v_ref[0, :, :, sl]
        ckh = ck_ref[0, :, sl]
        cvh = cv_ref[0, :, sl]
        doh = do_ref[0, :, :, sl].astype(jnp.float32)     # (F, N, dh)
        lse = lse_ref[0, :, :, h][..., None]              # (F, N, 1)
        delta = delta_ref[0, :, :, h][..., None]

        s = _time_scores(qh, kh, ckh, scale)
        p = jnp.exp(s - lse)                              # (F, N, F+1)

        # dp[..., g] = do · v_g ; dp[..., F] = do · cv
        dp_cols = [jnp.sum(doh * vh[g][None].astype(jnp.float32), axis=-1)
                   for g in range(F)]
        dp_cols.append(jnp.sum(doh * cvh[None].astype(jnp.float32),
                               axis=-1))
        dp = jnp.stack(dp_cols, axis=-1)                  # (F, N, F+1)
        ds = p * (dp - delta)                             # fp32

        # dq = Σ_g ds_g k_g + ds_cls ck (scaled)
        dq = ds[:, :, F:F + 1] * ckh[None].astype(jnp.float32)
        for g in range(F):
            dq = dq + ds[:, :, g:g + 1] * kh[g][None].astype(jnp.float32)
        dq_ref[0, :, :, sl] = (dq * scale).astype(dq_ref.dtype)

        # dk_g = Σ_f ds[f,:,g] q_f ; dv_g = Σ_f p[f,:,g] do_f
        q32 = qh.astype(jnp.float32)
        for g in range(F):
            dk = jnp.sum(ds[:, :, g:g + 1] * q32, axis=0) * scale
            dv = jnp.sum(p[:, :, g:g + 1] * doh, axis=0)
            dk_ref[0, g, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[0, g, :, sl] = dv.astype(dv_ref.dtype)
        dck = jnp.sum(jnp.where(valid, ds[:, :, F:F + 1] * q32, 0.0),
                      axis=(0, 1), keepdims=False) * scale  # (dh,)
        dcv = jnp.sum(jnp.where(valid, p[:, :, F:F + 1] * doh, 0.0),
                      axis=(0, 1), keepdims=False)
        dck_ref[0, :, sl] += dck[None].astype(dck_ref.dtype)
        dcv_ref[0, :, sl] += dcv[None].astype(dcv_ref.dtype)


# ==========================================================================
# pallas_call plumbing + custom VJP
# ==========================================================================


def _space_specs(B, F, N, D, H):
    tok = pl.BlockSpec((1, 1, N, D), lambda b, f: (b, f, 0, 0),
                       memory_space=pltpu.VMEM)
    cls = pl.BlockSpec((1, 1, D), lambda b, f: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    lse = pl.BlockSpec((1, 1, N, H), lambda b, f: (b, f, 0, 0),
                       memory_space=pltpu.VMEM)
    return tok, cls, lse


def _time_nblock(N, cap):
    """Patch-dim tile for the temporal grid.

    Temporal attention is independent per patch position, so the grid can
    tile N freely; small blocks keep the kernel's per-head fp32
    temporaries inside the 16 MB scoped-VMEM budget (a whole-N block OOMs
    at N=196, D=768, H=12; measured caps on v5e: fwd fits at 64, the bwd
    at 48 — 56 overflows by 3.6M). Pallas TPU requires the sublane block
    dim be a multiple of 8 (or the full dim), so edge blocks are padded;
    the backward kernel masks padded rows out of its dck/dcv reductions.
    """
    return N if N <= cap else cap


def _time_specs(B, F, N, D, H, cap=64):
    Nb = _time_nblock(N, cap)
    tok = pl.BlockSpec((1, F, Nb, D), lambda b, n: (b, 0, n, 0),
                       memory_space=pltpu.VMEM)
    cls = pl.BlockSpec((1, 1, D), lambda b, n: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    lse = pl.BlockSpec((1, F, Nb, H), lambda b, n: (b, 0, n, 0),
                       memory_space=pltpu.VMEM)
    return tok, cls, lse, (B, pl.cdiv(N, Nb))


def _phase_fwd(qp, kp, vp, ck, cv, axis, heads, scale, interpret):
    B, F, N, D = qp.shape
    if axis == "space":
        tok, cls, lse_spec = _space_specs(B, F, N, D, heads)
        grid = (B, F)
        kernel = functools.partial(_space_fwd_kernel, heads=heads,
                                   scale=scale)
    else:
        tok, cls, lse_spec, grid = _time_specs(B, F, N, D, heads)
        kernel = functools.partial(_time_fwd_kernel, heads=heads,
                                   num_frames=F, scale=scale)
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(qp.shape, qp.dtype),
                   jax.ShapeDtypeStruct((B, F, N, heads), jnp.float32)),
        grid=grid,
        in_specs=[tok, tok, tok, cls, cls],
        out_specs=(tok, lse_spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * len(grid)),
        interpret=interpret,
    )(qp, kp, vp, ck.reshape(B, 1, D), cv.reshape(B, 1, D))
    return out, lse


def _phase_bwd(qp, kp, vp, ck, cv, do, lse, out, axis, heads, scale,
               interpret):
    B, F, N, D = qp.shape
    delta = jnp.sum(
        do.astype(jnp.float32).reshape(B, F, N, heads, D // heads)
        * out.astype(jnp.float32).reshape(B, F, N, heads, D // heads),
        axis=-1)                                          # (B, F, N, H)
    if axis == "space":
        tok, cls, lse_spec = _space_specs(B, F, N, D, heads)
        grid = (B, F)
        kernel = functools.partial(_space_bwd_kernel, heads=heads,
                                   scale=scale)
        sem = ("parallel", "arbitrary")
        dcls_shape = (B, 1, D)
    else:
        tok, cls, lse_spec, grid = _time_specs(B, F, N, D, heads, cap=48)
        kernel = functools.partial(_time_bwd_kernel, heads=heads,
                                   num_frames=F, num_tokens=N, scale=scale)
        sem = ("parallel", "arbitrary")
        dcls_shape = (B, 1, D)
    dq, dk, dv, dck, dcv = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(qp.shape, qp.dtype),
                   jax.ShapeDtypeStruct(qp.shape, qp.dtype),
                   jax.ShapeDtypeStruct(qp.shape, qp.dtype),
                   jax.ShapeDtypeStruct(dcls_shape, jnp.float32),
                   jax.ShapeDtypeStruct(dcls_shape, jnp.float32)),
        grid=grid,
        in_specs=[tok, tok, tok, cls, cls, tok, lse_spec, lse_spec],
        out_specs=(tok, tok, tok, cls, cls),
        compiler_params=pltpu.CompilerParams(dimension_semantics=sem),
        interpret=interpret,
    )(qp, kp, vp, ck.reshape(B, 1, D), cv.reshape(B, 1, D), do, lse, delta)
    return (dq, dk, dv, dck.reshape(B, D).astype(ck.dtype),
            dcv.reshape(B, D).astype(cv.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def divided_phase(qp, kp, vp, ck, cv, axis, heads, scale, interpret=False):
    """Patch-token divided attention for one phase.

    qp/kp/vp: (B, F, N, D) token-major (D = heads · head_dim contiguous);
    ck/cv: (B, D) — the CLS token's key/value row, visible to every
    group. Returns patch outputs (B, F, N, D). The CLS token's own output
    row (global attention) is NOT computed here — do it in XLA.
    """
    out, _ = _phase_fwd(qp, kp, vp, ck, cv, axis, heads, scale, interpret)
    return out


def _divided_phase_fwd(qp, kp, vp, ck, cv, axis, heads, scale, interpret):
    out, lse = _phase_fwd(qp, kp, vp, ck, cv, axis, heads, scale, interpret)
    return out, (qp, kp, vp, ck, cv, lse, out)


def _divided_phase_bwd(axis, heads, scale, interpret, res, g):
    qp, kp, vp, ck, cv, lse, out = res
    dq, dk, dv, dck, dcv = _phase_bwd(qp, kp, vp, ck, cv, g, lse, out,
                                      axis, heads, scale, interpret)
    return dq, dk, dv, dck, dcv


divided_phase.defvjp(_divided_phase_fwd, _divided_phase_bwd)
