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
the MXU; the backward's CLS-column grads and delta are head-SEGMENTED
(full-width MXU dots against a 0/1 head-segment matrix) instead of
per-head lane slices. Temporal phase: one grid step per (batch, N-slab)
with the fully segmented formulation — see the section comment below.
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
        ckh = ck_ref[0, :, sl]
        cvh = cv_ref[0, :, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (N, N)
        # CLS column as a VPU mul-reduce: Mosaic can't lower a dot with
        # a 1-row operand, and a lane-slice of a precomputed (N, Hp)
        # column table measured slower than recomputing it here
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


def _space_bwd_kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, do_ref, o_ref,
                      lse_ref, dq_ref, dk_ref, dv_ref, dck_ref, dcv_ref,
                      *, heads: int, scale: float):
    f = pl.program_id(1)

    @pl.when(f == 0)
    def _init():
        dck_ref[...] = jnp.zeros_like(dck_ref)
        dcv_ref[...] = jnp.zeros_like(dcv_ref)

    D = q_ref.shape[-1]
    Hp = lse_ref.shape[-1]
    dh = D // heads
    dt = q_ref.dtype
    f32 = jnp.float32
    seg, segT = _seg_masks(D, dh, Hp, dt)
    q = q_ref[0, 0]                                       # (N, D)
    do = do_ref[0, 0]
    lse_all = lse_ref[0, 0]                               # (N, Hp) f32
    # head-segmented full-width precomputes: delta, CLS column grads
    delta_all = _seg_dot(do * o_ref[0, 0], seg)           # (N, Hp) f32
    s_cls_all = _seg_dot(q * ck_ref[0], seg) * scale
    dp_cls_all = _seg_dot(do * cv_ref[0], seg)
    # lanes >= heads hold garbage lse (the fwd only writes real heads'
    # columns): mask them or exp() manufactures inf -> NaN·0 below
    valid_h = jax.lax.broadcasted_iota(
        jnp.int32, lse_all.shape, 1) < heads
    p_cls_all = jnp.where(valid_h, jnp.exp(s_cls_all - lse_all), 0.0)
    ds_cls_all = p_cls_all * (dp_cls_all - delta_all)     # (N, Hp) f32
    bcls = _seg_dot(ds_cls_all.astype(dt), segT)          # (N, D) f32
    bpcls = _seg_dot(p_cls_all.astype(dt), segT)
    dck_ref[0] += (jnp.sum(bcls * q.astype(f32), axis=0, keepdims=True)
                   * scale).astype(dck_ref.dtype)
    dcv_ref[0] += jnp.sum(bpcls * do.astype(f32), axis=0,
                          keepdims=True).astype(dcv_ref.dtype)

    for h in range(heads):
        sl = pl.ds(h * dh, dh)
        qh = q_ref[0, 0, :, sl]
        kh = k_ref[0, 0, :, sl]
        vh = v_ref[0, 0, :, sl]
        doh = do_ref[0, 0, :, sl].astype(jnp.float32)
        lse = lse_all[:, h:h + 1]                         # (N, 1)
        delta = delta_all[:, h:h + 1]

        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse)                               # (N, N)
        dp = jax.lax.dot_general(
            doh, vh.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (N, N)
        ds = p * (dp - delta)

        dq = jax.lax.dot_general(
            ds.astype(kh.dtype), kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            ds.astype(qh.dtype), qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dv = jax.lax.dot_general(
            p.astype(doh.dtype), doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_ref[0, 0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, 0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0, :, sl] = dv.astype(dv_ref.dtype)
    # the CLS key's contribution to dq, full-width in one pass
    dq_ref[0, 0] = (dq_ref[0, 0].astype(f32)
                    + bcls * ck_ref[0].astype(f32) * scale
                    ).astype(dq_ref.dtype)


# ==========================================================================
# temporal phase: grid (B, N/Nb); block = an (F, Nb, D) slab of one clip.
#
# Head-SEGMENTED formulation: per-head score/broadcast reductions are
# expressed as full-width MXU dots against a 0/1 segment matrix
# Seg[d, h] = (d // dh == h), so the kernel never lane-slices the 12
# heads out of the D=H·dh axis (sub-tile slices at 64-lane offsets cost
# VPU repacks that made the v1 kernel 2× slower than XLA's unrolled
# path). For each frame pair (f, g):
#   scores  s[n, h] = Σ_d (q_f ⊙ k_g)[n, d] · Seg[d, h]   — (Nb,D)@(D,Hp)
#   combine o[n, d] += (p_g @ Segᵀ)[n, d] · v_g[n, d]      — (Nb,Hp)@(Hp,D)
# with Hp = H padded to the 128-lane tile. All elementwise work is
# full-lane (Nb, D)/(Nb, Hp); the only loops are over the F frame pairs.
# ==========================================================================


def _seg_masks(D, dh, Hp, dtype):
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (D, Hp), 0) // dh
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (D, Hp), 1)
    seg = (d_ids == h_ids).astype(dtype)                  # (D, Hp)
    segT = seg.T                                          # (Hp, D)
    return seg, segT


def _seg_dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _time_fwd_kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, o_ref, lse_ref,
                     *, heads: int, num_frames: int, scale: float):
    F = num_frames
    D = q_ref.shape[-1]
    Hp = lse_ref.shape[-1]
    dt = q_ref.dtype
    f32 = jnp.float32
    seg, segT = _seg_masks(D, D // heads, Hp, dt)
    for f in range(F):
        qf = q_ref[0, f]                                  # (Nb, D)
        cols = [_seg_dot(qf * k_ref[0, g], seg) * scale for g in range(F)]
        cols.append(_seg_dot(qf * ck_ref[0], seg) * scale)
        m = cols[0]
        for c in cols[1:]:
            m = jnp.maximum(m, c)                         # (Nb, Hp) f32
        ps = [jnp.exp(c - m) for c in cols]
        l = ps[0]
        for p in ps[1:]:
            l = l + p
        inv = 1.0 / l
        acc = _seg_dot((ps[F] * inv).astype(dt), segT) * \
            cv_ref[0].astype(f32)
        for g in range(F):
            acc = acc + _seg_dot((ps[g] * inv).astype(dt), segT) * \
                v_ref[0, g].astype(f32)
        o_ref[0, f] = acc.astype(o_ref.dtype)
        lse_ref[0, f] = m + jnp.log(l)


def _time_bwd_kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, do_ref, o_ref,
                     lse_ref, dq_ref, dk_ref, dv_ref, dck_ref, dcv_ref,
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
    D = q_ref.shape[-1]
    Hp = lse_ref.shape[-1]
    dt = q_ref.dtype
    f32 = jnp.float32
    row = n * Nb + jax.lax.broadcasted_iota(jnp.int32, (Nb, 1), 0)
    valid = row < num_tokens                              # (Nb, 1)
    seg, segT = _seg_masks(D, D // heads, Hp, dt)

    dk_acc = [jnp.zeros((Nb, D), f32) for _ in range(F)]
    dv_acc = [jnp.zeros((Nb, D), f32) for _ in range(F)]
    dck_acc = jnp.zeros((1, D), f32)
    dcv_acc = jnp.zeros((1, D), f32)
    for f in range(F):
        qf = q_ref[0, f]                                  # (Nb, D)
        dof = do_ref[0, f]
        do32 = dof.astype(f32)
        lse = lse_ref[0, f]                               # (Nb, Hp) f32
        # delta[n, h] = Σ_d do[n, d]·out[n, d] within head h
        delta = _seg_dot(dof * o_ref[0, f], seg)          # (Nb, Hp) f32

        cols = [_seg_dot(qf * k_ref[0, g], seg) * scale for g in range(F)]
        cols.append(_seg_dot(qf * ck_ref[0], seg) * scale)
        ps = [jnp.exp(c - lse) for c in cols]
        dps = [_seg_dot(dof * v_ref[0, g], seg) for g in range(F)]
        dps.append(_seg_dot(dof * cv_ref[0], seg))
        dss = [(p * (dp - delta)).astype(dt)
               for p, dp in zip(ps, dps)]                 # (Nb, Hp) bf16

        bcls = _seg_dot(dss[F], segT)                     # (Nb, D) f32
        dq = bcls * ck_ref[0].astype(f32)
        for g in range(F):
            bds = _seg_dot(dss[g], segT)                  # (Nb, D) f32
            dq = dq + bds * k_ref[0, g].astype(f32)
            dk_acc[g] = dk_acc[g] + bds * qf.astype(f32)
            dv_acc[g] = dv_acc[g] + \
                _seg_dot(ps[g].astype(dt), segT) * do32
        dq_ref[0, f] = (dq * scale).astype(dq_ref.dtype)
        dck_acc = dck_acc + jnp.sum(
            jnp.where(valid, bcls * qf.astype(f32), 0.0),
            axis=0, keepdims=True)
        dcv_acc = dcv_acc + jnp.sum(
            jnp.where(valid, _seg_dot(ps[F].astype(dt), segT) * do32, 0.0),
            axis=0, keepdims=True)
    for g in range(F):
        dk_ref[0, g] = (dk_acc[g] * scale).astype(dk_ref.dtype)
        dv_ref[0, g] = dv_acc[g].astype(dv_ref.dtype)
    dck_ref[0] += (dck_acc * scale).astype(dck_ref.dtype)
    dcv_ref[0] += dcv_acc.astype(dcv_ref.dtype)


# ==========================================================================
# pallas_call plumbing + custom VJP
# ==========================================================================


def _space_specs(B, F, N, D, H):
    Hp = -(-H // 128) * 128
    tok = pl.BlockSpec((1, 1, N, D), lambda b, f: (b, f, 0, 0),
                       memory_space=pltpu.VMEM)
    cls = pl.BlockSpec((1, 1, D), lambda b, f: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    lse = pl.BlockSpec((1, 1, N, Hp), lambda b, f: (b, f, 0, 0),
                       memory_space=pltpu.VMEM)
    return tok, cls, lse, Hp


def _time_nblock(N, F, D, Hp, itemsize, bwd):
    """Patch-dim tile for the temporal grid.

    Temporal attention is independent per patch position, so the grid can
    tile N freely. The tile is sized from a ~10 MB VMEM budget (16 MB
    scoped limit on v5e, leaving slack for Mosaic temporaries): per
    Nb-row the kernel holds the double-buffered token blocks
    (4 fwd / 7 bwd tensors of (F, Nb, D)), the (F, Nb, Hp) lse rows, and
    the live (Nb, Hp)/(Nb, D) fp32 temporaries. Blocks are then evened
    out over the grid (ceil split) and rounded up to the 8-sublane tile;
    the backward kernel masks padded rows out of its dck/dcv reductions.

    For F > 8 an extra ~F·(F+1)·Hp term models Mosaic's stack liveness
    across the unrolled frame loop: measured on v5e, the F=16 D=768
    backward allocated 20.26 MB of scoped VMEM at the linear model's
    Nb=16 (4.26 MB over the 16 MB limit — the per-frame (Nb, Hp) f32
    col/prob/dp temporaries of all unrolled iterations stay live on the
    stack), while F=16 D=1024 compiled and ran at the Nb=8 the same
    budget happened to pick. The term is gated at F > 8 so every
    measured F ≤ 8 geometry (incl. the F=4 bench headline, Nb=56 bwd)
    keeps its exact tiling.
    """
    if not bwd:
        per = (2 * (4 * F * D * itemsize + F * Hp * 4)
               + 2 * (F + 1) * Hp * 4 + 4 * D * 4)
        if F > 8:
            per += 2 * F * (F + 1) * Hp * 4
    else:
        per = (2 * (7 * F * D * itemsize + F * Hp * 4)
               + 3 * (F + 1) * Hp * 4 + 2 * F * D * 4 + 6 * D * 4)
        if F > 8:
            per += 3 * F * (F + 1) * Hp * 4
    cap = max(8, (int(10e6) // per) // 8 * 8)
    if cap >= N:
        return N
    nblocks = pl.cdiv(N, cap)
    return min(cap, -(-pl.cdiv(N, nblocks) // 8) * 8)


def _time_specs(B, F, N, D, H, itemsize, bwd=False):
    Hp = -(-H // 128) * 128
    Nb = _time_nblock(N, F, D, Hp, itemsize, bwd)
    tok = pl.BlockSpec((1, F, Nb, D), lambda b, n: (b, 0, n, 0),
                       memory_space=pltpu.VMEM)
    cls = pl.BlockSpec((1, 1, D), lambda b, n: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    lse = pl.BlockSpec((1, F, Nb, Hp), lambda b, n: (b, 0, n, 0),
                       memory_space=pltpu.VMEM)
    return tok, cls, lse, Hp, (B, pl.cdiv(N, Nb))


def _phase_fwd(qp, kp, vp, ck, cv, axis, heads, scale, interpret):
    B, F, N, D = qp.shape
    if axis == "space":
        tok, cls, lse_spec, Hp = _space_specs(B, F, N, D, heads)
        grid = (B, F)
        lse_shape = (B, F, N, Hp)
        kernel = functools.partial(_space_fwd_kernel, heads=heads,
                                   scale=scale)
    else:
        tok, cls, lse_spec, Hp, grid = _time_specs(
            B, F, N, D, heads, qp.dtype.itemsize)
        lse_shape = (B, F, N, Hp)
        kernel = functools.partial(_time_fwd_kernel, heads=heads,
                                   num_frames=F, scale=scale)
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(qp.shape, qp.dtype),
                   jax.ShapeDtypeStruct(lse_shape, jnp.float32)),
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
    if axis == "space":
        tok, cls, lse_spec, Hp = _space_specs(B, F, N, D, heads)
        grid = (B, F)
        kernel = functools.partial(_space_bwd_kernel, heads=heads,
                                   scale=scale)
        # delta is computed in-kernel from (do, out) — head-segmented
        in_specs = [tok, tok, tok, cls, cls, tok, tok, lse_spec]
        inputs = (qp, kp, vp, ck.reshape(B, 1, D), cv.reshape(B, 1, D),
                  do, out, lse)
    else:
        tok, cls, lse_spec, Hp, grid = _time_specs(
            B, F, N, D, heads, qp.dtype.itemsize, bwd=True)
        kernel = functools.partial(_time_bwd_kernel, heads=heads,
                                   num_frames=F, num_tokens=N, scale=scale)
        # delta is computed in-kernel from (do, out) — head-segmented
        in_specs = [tok, tok, tok, cls, cls, tok, tok, lse_spec]
        inputs = (qp, kp, vp, ck.reshape(B, 1, D), cv.reshape(B, 1, D),
                  do, out, lse)
    dcls_shape = (B, 1, D)
    dq, dk, dv, dck, dcv = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(qp.shape, qp.dtype),
                   jax.ShapeDtypeStruct(qp.shape, qp.dtype),
                   jax.ShapeDtypeStruct(qp.shape, qp.dtype),
                   jax.ShapeDtypeStruct(dcls_shape, jnp.float32),
                   jax.ShapeDtypeStruct(dcls_shape, jnp.float32)),
        grid=grid,
        in_specs=in_specs,
        out_specs=(tok, tok, tok, cls, cls),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*inputs)
    return (dq, dk, dv, dck.reshape(B, D).astype(ck.dtype),
            dcv.reshape(B, D).astype(cv.dtype))


# ==========================================================================
# LARGE-N spatial phase (the 336px towers' N = 576 frames): grid
# (B, H, F); block = ONE (frame, head)'s (N, dh) slice, cut straight out
# of the token-major (B, F, N, D) layout by the block system — no
# head-major transpose, no CLS concatenate and no fp32 score temp ever
# materializes in HBM (the flash-attention route this replaces paid
# ~31 ms/step of relayout copies for exactly those, measured on the
# TSF-L@336 batch-4 step).
#
# Scores are computed TRANSPOSED, sT = K_all Qᵀ of shape (N+1, N) with
# the CLS key folded in as row 0 by an in-VMEM concat, so that
#   * softmax statistics (m, l, lse) are (1, N) ROW vectors that
#     broadcast over sublanes with no in-kernel transposes;
#   * the backward's delta needs no (N, 1) column either:
#     delta[n] = Σ_d do·o = Σ_j pT[j, n] · dpT[j, n] — an elementwise
#     multiply + sublane reduce of two temps it already has;
#   * dq/dk/dv contract over the (N+1)-deep token axis — full-depth MXU
#     dots — and the whole backward is ONE kernel (5 dots/head vs the
#     8 of a split dq/dkv flash pair, with q/k/v/do read once).
# Per program the live fp32 temps are O(N²) for a single head
# (~1.4 MB at N=576 — the whole-frame kernel above keeps every head's
# alive at once, which is why it stops at N = 256).
# ==========================================================================


def _space_big_hf(D, H):
    """Heads folded per program: the smallest fold whose lane width is a
    legal Mosaic block minor dim (multiple of 128, or the full D)."""
    dh = D // H
    hf = max(1, 128 // dh) if (128 % dh == 0) else H
    while H % hf or (hf * dh) % 128:
        hf += 1
        if hf >= H:
            return H
    return hf


def _space_big_fwd_kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, o_ref,
                          lse_ref, *, heads_per_block: int, scale: float):
    f = pl.program_id(2)
    dh = q_ref.shape[-1] // heads_per_block
    for i in range(heads_per_block):
        sl = pl.ds(i * dh, dh)
        q = q_ref[0, 0, :, sl]                        # (N, dh)
        k_all = jnp.concatenate([ck_ref[0, :, sl], k_ref[0, 0, :, sl]],
                                axis=0)               # (N+1, dh)
        v_all = jnp.concatenate([cv_ref[0, :, sl], v_ref[0, 0, :, sl]],
                                axis=0)
        sT = jax.lax.dot_general(
            k_all, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (N+1, N)
        m = jnp.max(sT, axis=0, keepdims=True)        # (1, N)
        p = jnp.exp(sT - m)
        l = jnp.sum(p, axis=0, keepdims=True)         # (1, N)
        pn = (p / l).astype(v_all.dtype)              # normalized probs
        o = jax.lax.dot_general(
            pn, v_all, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (N, dh)
        o_ref[0, 0, :, sl] = o.astype(o_ref.dtype)
        lse_ref[0, i, f, :] = (m + jnp.log(l))[0]


def _space_big_bwd_kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, do_ref,
                          lse_ref, dq_ref, dk_ref, dv_ref, dck_ref,
                          dcv_ref, *, heads_per_block: int, scale: float):
    f = pl.program_id(2)

    @pl.when(f == 0)
    def _init():
        dck_ref[...] = jnp.zeros_like(dck_ref)
        dcv_ref[...] = jnp.zeros_like(dcv_ref)

    dt = q_ref.dtype
    dh = q_ref.shape[-1] // heads_per_block
    for i in range(heads_per_block):
        sl = pl.ds(i * dh, dh)
        q = q_ref[0, 0, :, sl]                        # (N, dh)
        do = do_ref[0, 0, :, sl]
        lse = lse_ref[0, i, f, :][None]               # (1, N) f32
        k_all = jnp.concatenate([ck_ref[0, :, sl], k_ref[0, 0, :, sl]],
                                axis=0)
        v_all = jnp.concatenate([cv_ref[0, :, sl], v_ref[0, 0, :, sl]],
                                axis=0)
        sT = jax.lax.dot_general(
            k_all, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        pT = jnp.exp(sT - lse)                        # (N+1, N), normalized
        dpT = jax.lax.dot_general(
            v_all, do, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (N+1, N)
        # delta[n] = Σ_d do·o = Σ_j pT[j,n]·dpT[j,n]: no (N,1) column
        delta = jnp.sum(pT * dpT, axis=0, keepdims=True)   # (1, N)
        dsT = (pT * (dpT - delta)).astype(dt)         # (N+1, N)
        dq = jax.lax.dot_general(
            dsT, k_all, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # (N, dh)
        dk_all = jax.lax.dot_general(
            dsT, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # (N+1, dh)
        dv_all = jax.lax.dot_general(
            pT.astype(dt), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (N+1, dh)
        dq_ref[0, 0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, 0, :, sl] = dk_all[1:].astype(dk_ref.dtype)
        dv_ref[0, 0, :, sl] = dv_all[1:].astype(dv_ref.dtype)
        dck_ref[0, :, sl] += dk_all[0:1]
        dcv_ref[0, :, sl] += dv_all[0:1]


def _space_big_specs(B, F, N, D, H):
    hf = _space_big_hf(D, H)
    w = hf * (D // H)
    tok = pl.BlockSpec((1, 1, N, w), lambda b, h, f: (b, f, 0, h),
                       memory_space=pltpu.VMEM)
    cls = pl.BlockSpec((1, 1, w), lambda b, h, f: (b, 0, h),
                       memory_space=pltpu.VMEM)
    # one (head-fold, F, N) lse slab per (b, h) — revisited across the
    # innermost f axis, each step filling its frame's rows
    lse = pl.BlockSpec((1, hf, F, N), lambda b, h, f: (b, h, 0, 0),
                       memory_space=pltpu.VMEM)
    # dck/dcv blocks are constant across the innermost f axis so the
    # accumulator stays resident in VMEM between revisits
    dcls = pl.BlockSpec((1, 1, w), lambda b, h, f: (b, 0, h),
                        memory_space=pltpu.VMEM)
    return tok, cls, lse, dcls, hf, (B, H // hf, F)


def _space_big_fwd(qp, kp, vp, ck, cv, heads, scale, interpret):
    B, F, N, D = qp.shape
    tok, cls, lse_spec, _, hf, grid = _space_big_specs(B, F, N, D, heads)
    out, lse = pl.pallas_call(
        functools.partial(_space_big_fwd_kernel, heads_per_block=hf,
                          scale=scale),
        out_shape=(jax.ShapeDtypeStruct(qp.shape, qp.dtype),
                   jax.ShapeDtypeStruct((B, heads, F, N), jnp.float32)),
        grid=grid,
        in_specs=[tok, tok, tok, cls, cls],
        out_specs=(tok, lse_spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qp, kp, vp, ck.reshape(B, 1, D), cv.reshape(B, 1, D))
    return out, lse


def _space_big_bwd(qp, kp, vp, ck, cv, do, lse, heads, scale, interpret):
    B, F, N, D = qp.shape
    tok, cls, lse_spec, dcls, hf, grid = _space_big_specs(B, F, N, D, heads)
    dq, dk, dv, dck, dcv = pl.pallas_call(
        functools.partial(_space_big_bwd_kernel, heads_per_block=hf,
                          scale=scale),
        out_shape=(jax.ShapeDtypeStruct(qp.shape, qp.dtype),
                   jax.ShapeDtypeStruct(qp.shape, qp.dtype),
                   jax.ShapeDtypeStruct(qp.shape, qp.dtype),
                   jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, D), jnp.float32)),
        grid=grid,
        in_specs=[tok, tok, tok, cls, cls, tok, lse_spec],
        out_specs=(tok, tok, tok, dcls, dcls),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qp, kp, vp, ck.reshape(B, 1, D), cv.reshape(B, 1, D), do, lse)
    return (dq, dk, dv, dck.reshape(B, D).astype(ck.dtype),
            dcv.reshape(B, D).astype(cv.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def spatial_phase_big(qp, kp, vp, ck, cv, heads, scale, interpret=False):
    """Spatial divided attention for LARGE frames (N > 256).

    Same contract as ``divided_phase(..., axis='space')``: qp/kp/vp are
    (B, F, N, D) token-major patch tokens, ck/cv (B, D) the CLS key/value
    row folded into every frame's softmax; returns patch outputs
    (B, F, N, D). The CLS token's own output row stays with the caller.
    """
    out, _ = _space_big_fwd(qp, kp, vp, ck, cv, heads, scale, interpret)
    return out


def _spatial_big_vjp_fwd(qp, kp, vp, ck, cv, heads, scale, interpret):
    out, lse = _space_big_fwd(qp, kp, vp, ck, cv, heads, scale, interpret)
    return out, (qp, kp, vp, ck, cv, lse)


def _spatial_big_vjp_bwd(heads, scale, interpret, res, g):
    qp, kp, vp, ck, cv, lse = res
    return _space_big_bwd(qp, kp, vp, ck, cv, g, lse, heads, scale,
                          interpret)


spatial_phase_big.defvjp(_spatial_big_vjp_fwd, _spatial_big_vjp_bwd)


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
