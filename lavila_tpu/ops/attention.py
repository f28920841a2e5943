"""Attention primitives, TPU-first.

The TimeSformer "divided space-time" attention
(reference: lavila/models/timesformer.py:87-144) has an awkward ragged
structure in the reference: the CLS token attends over all ``1 + F*N``
tokens, while each patch token attends within its group (same frame for
spatial attention / same spatial position for temporal attention) plus the
CLS key/value broadcast into every group.

Here it is formulated as two fully static batched attentions:

  * CLS: a single-query attention over the full token sequence.
  * Patches: reshape tokens to ``(B, F, N, H, d)``, pick the group axis,
    prepend the broadcast CLS key/value along the key axis, and run one
    batched softmax-attention — no ragged ops, no gather, everything maps
    onto the MXU as one big batched matmul.

This module is the XLA path; ``lavila_tpu.ops.pallas`` holds fused kernels
that can be swapped in behind the same signatures.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# 'pallas' (fused divided-phase kernels for BOTH phases — the production
# TPU path, see ops/pallas/divided.py; the DEFAULT on TPU backends),
# 'xla' (unrolled VPU temporal path + grouped-matmul spatial; the default
# everywhere else), or 'grouped' (force the transposed-matmul formulation
# everywhere; oracle/testing). Set LAVILA_ATTENTION or call
# set_attention_backend() to override. Resolution is lazy so importing
# this module never initializes a JAX backend.
_BACKEND = os.environ.get("LAVILA_ATTENTION") or None


def set_attention_backend(name: str) -> None:
    global _BACKEND
    assert name in ("xla", "pallas", "grouped"), name
    _BACKEND = name


def get_attention_backend() -> str:
    """Active backend; on first use without an explicit choice, picks
    'pallas' on TPU and 'xla' elsewhere (the production kernel is the
    production default — no env var needed)."""
    global _BACKEND
    if _BACKEND is None:
        _BACKEND = ("pallas" if jax.default_backend() == "tpu" else "xla")
    return _BACKEND


# Sequence parallelism for long clips (num_frames >> 16): when a ring mesh
# is set, the TEMPORAL phase of divided attention runs ring attention with
# the frame axis sharded over the given mesh axis
# (ops/ring_attention.py:divided_time_ring) — no chip holds all frames'
# keys. Works for any SpaceTimeTransformer forward, no model changes.
_RING_MESH = None


def set_ring_mesh(mesh, axis_name: str = "model") -> None:
    """Enable (mesh, axis_name) sequence-parallel temporal attention;
    pass ``None`` to disable."""
    global _RING_MESH
    _RING_MESH = None if mesh is None else (mesh, axis_name)


def get_ring_mesh():
    return _RING_MESH


def _softmax_f32(scores: jax.Array) -> jax.Array:
    """Softmax with fp32 accumulation, cast back to the input dtype."""
    out = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return out.astype(scores.dtype)


def attention(q: jax.Array, k: jax.Array, v: jax.Array,
              mask: jax.Array | None = None,
              scale: float | None = None) -> jax.Array:
    """Multi-head attention over (B, L, H, d) tensors.

    ``mask`` is an additive bias broadcastable to (B, H, Lq, Lk)
    (use -inf/0, torch-style).
    """
    d = q.shape[-1]
    scale = d ** -0.5 if scale is None else scale
    scores = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _time_attention_unrolled(qp: jax.Array, kp: jax.Array, vp: jax.Array,
                             cls_k: jax.Array, cls_v: jax.Array,
                             scale: float) -> jax.Array:
    """Temporal divided attention WITHOUT the grouped relayout.

    The grouped formulation transposes tokens to position-major
    (B, N, F, H, d) — pure HBM traffic (~36 ms of a 152 ms TSF-B step on
    v5e) — to run (F × F+1) matmuls too small for the MXU anyway. With
    F ≤ 8 it is faster to unroll attention over frame pairs as fused
    VPU elementwise ops in the NATIVE frame-major layout: for each pair
    (f, g), score[b,n,h] = Σ_d q[b,f,n,h,d]·k[b,g,n,h,d] touches only
    contiguous (B, N, H·d) slices; no transpose ever hits HBM.

    qp/kp/vp: (B, F, N, H, d) patch tokens (raw, unscaled); cls_k/cls_v:
    (B, 1, H, d), visible to every group. Returns patch outputs
    (B, F, N, H, d); the CLS query row is handled by the caller.
    Semantics match the grouped path exactly
    (reference timesformer.py:116-137)."""
    B, F, N, H, d = qp.shape
    f32 = jnp.float32

    outs = []
    for f in range(F):
        qf = qp[:, f]                                   # (B, N, H, d)
        # scores vs every frame g and vs CLS: F+1 fused mul-reduces
        scores = [jnp.sum(qf.astype(f32) * kp[:, g].astype(f32),
                          axis=-1) for g in range(F)]
        scores.append(jnp.sum(qf.astype(f32) * cls_k.astype(f32), axis=-1))
        s = jnp.stack(scores, axis=-1) * scale          # (B, N, H, F+1)
        p = jax.nn.softmax(s, axis=-1).astype(qp.dtype)
        out = p[..., F:F + 1] * cls_v                   # CLS value term
        for g in range(F):
            out = out + p[..., g:g + 1] * vp[:, g]
        outs.append(out)
    return jnp.stack(outs, axis=1)                      # (B, F, N, H, d)


@jax.custom_vjp
def _cls_row_attention(cls_q, cls_k, cls_v, kp, vp):
    """The CLS token's (global) attention row over [itself; all patches].

    cls_q/cls_k/cls_v: (B, 1, H, d); kp/vp: (B, F, N, H, d) token-major.
    Returns (B, 1, H, d).

    Formulated as token-major mul-reduces, NOT einsums: a batched (b, h)
    dot_general here makes XLA's layout assignment prefer head-major
    layouts for the FULL kp/vp tensors and insert whole-tensor relayout
    copies around the token-major phase kernels (measured ~5 ms/step on
    v5e). The reduction is only B·F·N·H·d MACs — VPU work fused into the
    surrounding elementwise ops. The custom VJP keeps the backward in
    the same form: jax's autodiff of the fp32-promoted forward would
    materialize fp32 (B, F, N, H, d) temporaries (+4 ms/step measured);
    here every full-size backward tensor stays in the input dtype.

    Precision (deliberate tradeoff): under bf16 inputs the q·k and p·v
    PRODUCTS round to bf16 before the fp32 sum-reduce — slightly looser
    than a dot_general with preferred_element_type=f32, which would keep
    the products in fp32, but that relayouts kp/vp head-major (see
    above). Max/softmax/normalization stay fp32. The bf16-vs-fp32
    deviation is bounded by tests/test_attention.py::
    test_cls_row_attention_bf16_tolerance (~1e-2 absolute on unit-scale
    inputs, i.e. within bf16's own 2^-8 relative grid).
    """
    out, _ = _cls_row_fwd_impl(cls_q, cls_k, cls_v, kp, vp)
    return out


def _cls_row_fwd_impl(cls_q, cls_k, cls_v, kp, vp):
    f32 = jnp.float32
    d = kp.shape[-1]
    scale = d ** -0.5
    s_self = jnp.sum(cls_q.astype(f32) * cls_k.astype(f32),
                     axis=-1) * scale                       # (B, 1, H)
    clsq = cls_q[:, 0][:, None, None]                       # (B,1,1,H,d)
    s_pat = jnp.sum((clsq * kp).astype(f32), axis=-1) * scale  # (B,F,N,H)
    m = jnp.maximum(jnp.max(s_pat, axis=(1, 2)), s_self[:, 0])  # (B, H)
    p_self = jnp.exp(s_self - m[:, None])                   # (B, 1, H)
    p_pat = jnp.exp(s_pat - m[:, None, None])               # (B, F, N, H)
    denom = p_self + jnp.sum(p_pat, axis=(1, 2))[:, None]   # (B, 1, H)
    inv = 1.0 / denom
    p_self = p_self * inv
    p_pat = p_pat * inv[:, 0][:, None, None]                # normalized
    out = (p_self[..., None] * cls_v.astype(f32)
           + jnp.sum((p_pat.astype(kp.dtype)[..., None] * vp).astype(f32),
                     axis=(1, 2))[:, None])                 # (B, 1, H, d)
    return out.astype(kp.dtype), (p_self, p_pat)


def _cls_row_vjp_fwd(cls_q, cls_k, cls_v, kp, vp):
    out, (p_self, p_pat) = _cls_row_fwd_impl(cls_q, cls_k, cls_v, kp, vp)
    return out, (cls_q, cls_k, cls_v, kp, vp, p_self, p_pat, out)


def _cls_row_vjp_bwd(res, g):
    cls_q, cls_k, cls_v, kp, vp, p_self, p_pat, out = res
    f32 = jnp.float32
    dt = kp.dtype
    d = kp.shape[-1]
    scale = d ** -0.5
    g32 = g.astype(f32)
    delta = jnp.sum(g32 * out.astype(f32), axis=-1)         # (B, 1, H)
    gb = g[:, 0][:, None, None]                             # (B,1,1,H,d)
    dp_pat = jnp.sum((gb * vp).astype(f32), axis=-1)        # (B, F, N, H)
    ds_pat = (p_pat * (dp_pat - delta[:, 0][:, None, None])
              ).astype(dt)                                  # (B, F, N, H)
    dp_self = jnp.sum(g32 * cls_v.astype(f32), axis=-1)     # (B, 1, H)
    ds_self = (p_self * (dp_self - delta)).astype(dt)       # (B, 1, H)

    clsq = cls_q[:, 0][:, None, None]                       # (B,1,1,H,d)
    dkp = (ds_pat[..., None] * clsq * scale).astype(dt)
    dvp = (p_pat.astype(dt)[..., None] * gb).astype(dt)
    dcls_q = (jnp.sum((ds_pat[..., None] * kp).astype(f32), axis=(1, 2)
                      )[:, None]
              + ds_self.astype(f32)[..., None] * cls_k.astype(f32))
    dcls_q = (dcls_q * scale).astype(dt)
    dcls_k = (ds_self[..., None] * cls_q * scale).astype(dt)
    dcls_v = (p_self.astype(dt)[..., None] * g).astype(dt)
    return dcls_q, dcls_k, dcls_v, dkp, dvp


_cls_row_attention.defvjp(_cls_row_vjp_fwd, _cls_row_vjp_bwd)


def _time_attention_grouped_direct(qp: jax.Array, kp: jax.Array,
                                   vp: jax.Array, cls_k: jax.Array,
                                   cls_v: jax.Array,
                                   scale: float) -> jax.Array:
    """Grouped temporal attention as direct batched einsums in the NATIVE
    frame-major layout — no explicit transposes, no CLS key/value concat.

    The classic grouped path (the einsum at the bottom of
    :func:`divided_attention_split`) transposes q/k/v to position-major
    and concatenates a broadcast CLS key/value row before its batched
    matmuls; at F=16 the XLA layout assignment around those explicit
    permutes chained ~20 ms/step of relayout copies into the TSF-B b4
    step (trace: docs/PERF.md "16 frames"). Here the einsums are issued
    directly on the (B, F, N, H, d) tensors with n as a batch dim, and
    the CLS key contributes a SEPARATE score column (softmax is
    permutation-invariant over keys, so column order doesn't matter):

      s[b,n,h,f,g] = Σ_d q[b,f,n,h,d]·k[b,g,n,h,d]
      s_cls[b,n,h,f] = Σ_d q[b,f,n,h,d]·cls_k[b,h,d]

    XLA then picks ONE layout for the batched dots instead of honoring
    the hand-written permute chain, and the CLS term never materializes
    an (F+1)-keys copy of k/v in HBM. Semantics match the grouped path
    exactly (reference lavila/models/timesformer.py:116-137); equivalence
    is test-enforced (tests/test_attention.py).
    """
    B, F, N, H, d = qp.shape
    f32 = jnp.float32
    s = jnp.einsum("bfnhd,bgnhd->bnhfg", qp, kp,
                   preferred_element_type=f32) * scale    # (B,N,H,F,F)
    s_cls = jnp.einsum("bfnhd,bhd->bnhf", qp, cls_k[:, 0],
                       preferred_element_type=f32) * scale
    # The score concat + prob slices are measured CHEAPER than a manual
    # two-piece softmax that would avoid them (109.9 vs 116.5 ms/step at
    # 16f b4 — splitting the softmax by hand breaks XLA's softmax fusion
    # patterns; docs/PERF.md "16 frames").
    scores = jnp.concatenate([s, s_cls[..., None]], axis=-1)
    p = jax.nn.softmax(scores, axis=-1).astype(qp.dtype)  # (B,N,H,F,F+1)
    out = jnp.einsum("bnhfg,bgnhd->bfnhd", p[..., :F], vp)
    return out + jnp.einsum("bnhf,bhd->bfnhd", p[..., F], cls_v[:, 0])


def _spatial_flash(qp: jax.Array, kp: jax.Array, vp: jax.Array,
                   cls_k: jax.Array, cls_v: jax.Array,
                   scale: float) -> jax.Array:
    """Key-tiled flash route for large-N spatial attention — kept as the
    LAVILA_SPATIAL_BIG=flash comparison fallback; the production N > 256
    route is ops/pallas/divided.py:spatial_phase_big (token-major blocks,
    merged backward — measured 336 → 272 ms/step on TSF-L@336 b4).

    The whole-frame kernel in ops/pallas/divided.py holds every head's
    (N, N) fp32 score block on the Mosaic stack at once — ~40 MB at
    N=576, over v5e's 16 MB scoped VMEM. Here each (frame, head-fold)
    tile streams k/v blocks with an online softmax instead
    (ops/pallas/flash_attention.py:fused_attention, custom VJP), so
    VMEM use is O(block_q · block_k) regardless of N. The grouped
    head-major relayout this needs costs one (B, F, N, D) transpose
    each way — far cheaper than the fp32 (B, H, F, N, N+1) score
    tensor the grouped XLA formulation would spill to HBM (~0.7 GB at
    TSF-L@336 batch 8). 336px is a PRETRAIN shape in the reference
    (docs/PRETRAIN.md:24-35), so the backward matters as much as the
    forward.

    qp/kp/vp: (B, F, N, H, d) patch tokens (unscaled); cls_k/cls_v:
    (B, 1, H, d) folded in as key 0 of every frame. Returns patch
    outputs (B, F, N, H, d); the CLS query row stays with the caller.
    """
    from lavila_tpu.ops.pallas.flash_attention import fused_attention

    B, F, N, H, d = qp.shape
    ck = jnp.broadcast_to(cls_k[:, None], (B, F, 1, H, d))
    cv = jnp.broadcast_to(cls_v[:, None], (B, F, 1, H, d))
    kg = jnp.concatenate([ck, kp], axis=2)               # (B, F, N+1, H, d)
    vg = jnp.concatenate([cv, vp], axis=2)

    def to_heads(t):  # (B, F, L, H, d) → (B·F, H, L, d)
        L = t.shape[2]
        return t.transpose(0, 1, 3, 2, 4).reshape(B * F, H, L, d)

    # block_q 192 divides N=576 exactly (no padded q rows); two key
    # tiles cover the 577 keys. ~4 MB of fp32 score/prob temps per
    # program at the default head-fold of 8. LAVILA_FLASH_BLOCK_{Q,K,BH}
    # are experiment knobs (read at trace time) for sweeping the tiling
    # on real hardware — see docs/PERF.md for the measured sweep.
    block_q = (int(os.environ.get("LAVILA_FLASH_BLOCK_Q", "0"))
               or (192 if N % 192 == 0 else 256))
    block_k = (int(os.environ.get("LAVILA_FLASH_BLOCK_K", "0"))
               or -(-((N + 2) // 2) // 8) * 8)
    block_bh = int(os.environ.get("LAVILA_FLASH_BLOCK_BH", "0")) or 8
    out = fused_attention(to_heads(qp), to_heads(kg), to_heads(vg),
                          False, scale, block_q, block_k, block_bh,
                          jax.default_backend() != "tpu")
    return out.reshape(B, F, H, N, d).transpose(0, 1, 3, 2, 4)


def divided_attention_split(cls_q: jax.Array, cls_k: jax.Array,
                            cls_v: jax.Array, qp: jax.Array, kp: jax.Array,
                            vp: jax.Array, axis: str) -> tuple:
    """Divided space-time attention in the CLS-SEPARATE layout.

    The production entry point: keeping the CLS token out of the patch
    tensor means no per-block slice (``x[:, 1:]``) / ``concatenate``
    copies ever materialize in HBM around the attention kernels
    (measured ~1 ms/block fwd+bwd on v5e), and the patch tensor's
    ``(B, F, N, H·d)`` shape is a FREE reshape of the qkv projection
    output.

    Args:
      cls_q/cls_k/cls_v: (B, 1, H, d) — the CLS token's rows.
      qp/kp/vp: (B, F, N, H, d) patch tokens, frame-major, unscaled.
      axis: 'time' | 'space' (group = spatial position / frame).

    Returns:
      (cls_out (B, 1, H, d), patches_out (B, F, N, H, d)). CLS attends
      over ALL tokens; each patch attends within its group plus CLS
      (reference lavila/models/timesformer.py:116-137).
    """
    B, F, N, H, d = qp.shape
    scale = d ** -0.5
    f32 = jnp.float32

    if axis == "time" and _RING_MESH is not None:
        from lavila_tpu.ops.ring_attention import divided_time_ring
        q = jnp.concatenate([cls_q, qp.reshape(B, F * N, H, d)], axis=1)
        k = jnp.concatenate([cls_k, kp.reshape(B, F * N, H, d)], axis=1)
        v = jnp.concatenate([cls_v, vp.reshape(B, F * N, H, d)], axis=1)
        out = divided_time_ring(q, k, v, F, *_RING_MESH)
        return out[:, :1], out[:, 1:].reshape(B, F, N, H, d)

    cls_out = _cls_row_attention(cls_q, cls_k, cls_v, kp, vp)

    # The fused spatial kernel holds one whole frame (N tokens) per VMEM
    # block and its unrolled per-head (N, N) fp32 score/prob temps live
    # on the Mosaic stack together: fine up to N = 256 (TSF-L/224,
    # measured), but N = 576 (336px towers — a PRETRAIN shape, reference
    # docs/PRETRAIN.md:24-35) needs ~40 MB of scoped VMEM and fails to
    # compile. Large-N spatial routes to the key-tiled flash kernel
    # instead (online softmax, O(block) VMEM — _spatial_flash above).
    _space_fits_vmem = N <= 256
    _spatial_pref = os.environ.get("LAVILA_SPATIAL_BIG", "")
    if (get_attention_backend() == "pallas" and axis == "space"
            and (not _space_fits_vmem or _spatial_pref == "big")):
        # Default: token-major (B, H, F)-gridded kernel with per-head
        # O(N²) VMEM temps and a single merged backward — no head-major
        # relayout or CLS concat in HBM (ops/pallas/divided.py:
        # spatial_phase_big). LAVILA_SPATIAL_BIG=flash keeps the older
        # key-tiled flash route for comparison sweeps; =big forces this
        # kernel at N <= 256 too for A/B against the whole-frame kernel.
        if (_spatial_pref != "flash" and d % 8 == 0):
            from lavila_tpu.ops.pallas.divided import spatial_phase_big
            D = H * d
            patches = spatial_phase_big(
                qp.reshape(B, F, N, D), kp.reshape(B, F, N, D),
                vp.reshape(B, F, N, D), cls_k.reshape(B, D),
                cls_v.reshape(B, D), H, scale,
                jax.default_backend() != "tpu")
            return cls_out, patches.reshape(B, F, N, H, d)
        return cls_out, _spatial_flash(qp, kp, vp, cls_k, cls_v, scale)
    # Temporal-phase routing: the fused time kernel wins at F <= 8 (the
    # pretrain shape), but at F > 8 its liveness budget forces Nb=16/8
    # tiles (13/25-program grids per layer, each a 16-deep unrolled
    # frame loop) and it measured 56 ms of a 138 ms 16f no-remat step —
    # 18x its HBM floor — while the XLA grouped-direct path ran the
    # same step at 109.9 ms (36.39 vs 28.10 clips/s b4; a kernel v2
    # can't beat it — seg-dot issue-waste analysis in docs/PERF.md "16
    # frames"). So F > 8 defaults to the grouped-direct path (spatial
    # stays fused). LAVILA_TIME_ATTENTION overrides per phase: 'pallas'
    # forces the fused kernel at any F, 'grouped'/'xla' force the XLA
    # paths at any F.
    _time_pref = os.environ.get("LAVILA_TIME_ATTENTION", "")
    _time_fused = (_time_pref == "pallas"
                   or (F <= 8 and _time_pref not in ("grouped", "xla")))
    if get_attention_backend() == "pallas" and (
            (axis == "time" and _time_fused)
            or (axis == "space" and _space_fits_vmem)):
        # fused divided-phase kernels for BOTH phases (scores, softmax,
        # PV, CLS key folded in — the whole phase per block in VMEM from
        # the token-major layout; no grouped relayout, no fp32 score
        # temps in HBM, ops/pallas/divided.py). The temporal kernel uses
        # the head-SEGMENTED formulation (MXU dots against a 0/1
        # head-segment matrix instead of per-head lane slices): measured
        # 0.3 ms/block fwd+bwd on v5e vs ~1.7 for the unrolled XLA path
        # in context — and sharing the spatial kernel's layout removes
        # the per-block relayout flip-flop XLA otherwise inserts between
        # the token-lane layout its unrolled path prefers and the
        # token-major layout the spatial kernel needs.
        from lavila_tpu.ops.pallas.divided import divided_phase
        D = H * d
        patches = divided_phase(
            qp.reshape(B, F, N, D), kp.reshape(B, F, N, D),
            vp.reshape(B, F, N, D), cls_k.reshape(B, D),
            cls_v.reshape(B, D), axis, H, scale,
            jax.default_backend() != "tpu")
        return cls_out, patches.reshape(B, F, N, H, d)

    if axis == "time" and F <= 8 and (
            get_attention_backend() == "xla" or _time_pref == "xla"):
        # XLA temporal path: unrolled VPU formulation, no relayout
        patches = _time_attention_unrolled(qp, kp, vp, cls_k, cls_v, scale)
        return cls_out, patches

    # F > 8 temporal (and LAVILA_TIME_ATTENTION=grouped): the direct
    # einsum formulation — no hand permutes / CLS concat for XLA's layout
    # assignment to chain relayout copies around. LAVILA_TIME_GROUPED=v1
    # keeps the classic transpose+concat path for A/B sweeps.
    if axis == "time" and os.environ.get("LAVILA_TIME_GROUPED", "") != "v1":
        return cls_out, _time_attention_grouped_direct(
            qp, kp, vp, cls_k, cls_v, scale)

    # --- patch tokens: grouped attention with CLS k/v prepended ----------
    def group(t):
        if axis == "time":
            t = t.transpose(0, 2, 1, 3, 4)  # (B, N, F, H, d): group=position
        return t  # space: (B, F, N, H, d): group=frame

    qg = group(qp) * scale                  # (B, G, S, H, d)
    kg = group(kp)
    vg = group(vp)
    G, S = qg.shape[1], qg.shape[2]

    # broadcast the CLS key/value into every group as key index 0
    ck = jnp.broadcast_to(cls_k[:, :, None], (B, G, 1, H, d))
    cv = jnp.broadcast_to(cls_v[:, :, None], (B, G, 1, H, d))
    kg = jnp.concatenate([ck, kg], axis=2)  # (B, G, 1+S, H, d)
    vg = jnp.concatenate([cv, vg], axis=2)

    scores = jnp.einsum("bgqhd,bgkhd->bhgqk", qg, kg,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(qp.dtype)
    out = jnp.einsum("bhgqk,bgkhd->bgqhd", probs,
                     vg)                           # (B, G, S, H, d)

    if axis == "time":
        out = out.transpose(0, 2, 1, 3, 4)  # back to (B, F, N, H, d)
    return cls_out, out


def divided_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                      num_frames: int, axis: str) -> jax.Array:
    """Divided space-time attention over a CLS-prefixed token sequence.

    Compatibility wrapper over :func:`divided_attention_split` (the
    CLS-separate production path used by the model): splits off the CLS
    row, runs the phase, and re-concatenates.

    Args:
      q, k, v: (B, 1 + F*N, H, d) — token 0 is CLS, the rest are patch
        tokens in frame-major order (frame f, position n) → index 1 + f*N + n.
      num_frames: F.
      axis: 'time' — each patch attends to the F tokens sharing its spatial
        position (plus CLS); 'space' — each patch attends to the N tokens of
        its own frame (plus CLS).

    Returns:
      (B, 1 + F*N, H, d). CLS attends over all tokens
      (reference behaviour: lavila/models/timesformer.py:116-137).
    """
    if axis == "time" and _RING_MESH is not None:
        from lavila_tpu.ops.ring_attention import divided_time_ring
        return divided_time_ring(q, k, v, num_frames, *_RING_MESH)

    B, L, H, d = q.shape
    F = num_frames
    N = (L - 1) // F
    assert 1 + F * N == L, (L, F)
    cls_out, patches = divided_attention_split(
        q[:, :1], k[:, :1], v[:, :1],
        q[:, 1:].reshape(B, F, N, H, d), k[:, 1:].reshape(B, F, N, H, d),
        v[:, 1:].reshape(B, F, N, H, d), axis)
    return jnp.concatenate([cls_out, patches.reshape(B, F * N, H, d)],
                           axis=1)


def causal_mask(length: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask (1, 1, L, L): 0 on/below diagonal, -inf above."""
    neg = jnp.finfo(jnp.float32).min
    m = jnp.triu(jnp.full((length, length), neg, dtype=jnp.float32), k=1)
    return m[None, None].astype(dtype)


def padding_bias(attn_mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(B, L) {0,1} key-padding mask → additive bias (B, 1, 1, L)."""
    neg = jnp.finfo(jnp.float32).min
    bias = jnp.where(attn_mask > 0, 0.0, neg)
    return bias[:, None, None, :].astype(dtype)
