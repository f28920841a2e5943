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

# 'xla' (default; unrolled VPU temporal path + grouped-matmul spatial),
# 'pallas' (fused divided-phase kernels for BOTH phases — the production
# TPU path, see ops/pallas/divided.py), or 'grouped' (force the
# transposed-matmul formulation everywhere; oracle/testing). Set
# LAVILA_ATTENTION or call set_attention_backend().
_BACKEND = os.environ.get("LAVILA_ATTENTION", "xla")


def set_attention_backend(name: str) -> None:
    global _BACKEND
    assert name in ("xla", "pallas", "grouped"), name
    _BACKEND = name


def get_attention_backend() -> str:
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


def _time_attention_unrolled(q: jax.Array, k: jax.Array, v: jax.Array,
                             F: int, scale: float) -> jax.Array:
    """Temporal divided attention WITHOUT the grouped relayout.

    The grouped formulation transposes tokens to position-major
    (B, N, F, H, d) — pure HBM traffic (~36 ms of a 152 ms TSF-B step on
    v5e) — to run (F × F+1) matmuls too small for the MXU anyway. With
    F ≤ 8 it is faster to unroll attention over frame pairs as fused
    VPU elementwise ops in the NATIVE frame-major layout: for each pair
    (f, g), score[b,n,h] = Σ_d q[b,f,n,h,d]·k[b,g,n,h,d] touches only
    contiguous (B, N, H·d) slices; no transpose ever hits HBM.

    q/k/v: (B, 1+F·N, H, d) CLS-prefixed, frame-major (raw, unscaled).
    Returns PATCH outputs (B, F·N, H, d); the CLS row is handled by the
    caller. Semantics match the grouped path exactly
    (reference timesformer.py:116-137)."""
    B, L, H, d = q.shape
    N = (L - 1) // F
    f32 = jnp.float32

    def frame(t, f):  # contiguous slice, no relayout
        return t[:, 1 + f * N: 1 + (f + 1) * N]        # (B, N, H, d)

    cls_k = k[:, :1]                                    # (B, 1, H, d)
    cls_v = v[:, :1]

    outs = []
    for f in range(F):
        qf = frame(q, f)
        # scores vs every frame g and vs CLS: F+1 fused mul-reduces
        scores = [jnp.sum(qf.astype(f32) * frame(k, g).astype(f32),
                          axis=-1) for g in range(F)]
        scores.append(jnp.sum(qf.astype(f32) * cls_k.astype(f32), axis=-1))
        s = jnp.stack(scores, axis=-1) * scale          # (B, N, H, F+1)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        out = p[..., F:F + 1] * cls_v                   # CLS value term
        for g in range(F):
            out = out + p[..., g:g + 1] * frame(v, g)
        outs.append(out)
    return jnp.concatenate(outs, axis=1)                # (B, F*N, H, d)


def divided_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                      num_frames: int, axis: str) -> jax.Array:
    """Divided space-time attention over a CLS-prefixed token sequence.

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
    scale = d ** -0.5

    # --- CLS query attends over the full sequence ------------------------
    cls_q = q[:, :1] * scale                                  # (B, 1, H, d)
    cls_scores = jnp.einsum("bqhd,bkhd->bhqk", cls_q, k,
                            preferred_element_type=jnp.float32)
    cls_probs = jax.nn.softmax(cls_scores, axis=-1).astype(q.dtype)
    cls_out = jnp.einsum("bhqk,bkhd->bqhd", cls_probs, v)     # (B, 1, H, d)

    if _BACKEND == "pallas" and (axis == "space" or F > 8):
        # fused divided-phase kernel: the whole phase (scores, softmax,
        # PV, CLS key folded in) computed per block in VMEM from the
        # token-major layout — no grouped relayout, no CLS concat, no
        # fp32 score temps in HBM (ops/pallas/divided.py). The CLS row
        # (global attention) is the XLA einsum above. The TEMPORAL phase
        # at F <= 8 instead uses the unrolled VPU path below: measured on
        # v5e it beats the fused kernel (3.3 vs 4.7 ms/block fwd+bwd) —
        # both stream the same HBM bytes, and XLA's fusion of the
        # elementwise score/PV ops is tighter than Mosaic's lane-sliced
        # per-head loop.
        from lavila_tpu.ops.pallas.divided import divided_phase
        D = H * d
        patches = divided_phase(
            q[:, 1:].reshape(B, F, N, D), k[:, 1:].reshape(B, F, N, D),
            v[:, 1:].reshape(B, F, N, D), k[:, 0].reshape(B, D),
            v[:, 0].reshape(B, D), axis, H, scale)
        patches = patches.reshape(B, F * N, H, d)
        return jnp.concatenate([cls_out, patches], axis=1)

    if axis == "time" and F <= 8 and _BACKEND in ("xla", "pallas"):
        # default temporal path: unrolled VPU formulation, no relayout
        patches = _time_attention_unrolled(q, k, v, F, scale)
        return jnp.concatenate([cls_out, patches], axis=1)

    # --- patch tokens: grouped attention with CLS k/v prepended ----------
    def group(t):
        t = t.reshape(B, F, N, H, d)
        if axis == "time":
            t = t.transpose(0, 2, 1, 3, 4)  # (B, N, F, H, d): group=position
        return t  # space: (B, F, N, H, d): group=frame

    qg = group(q[:, 1:]) * scale            # (B, G, S, H, d)
    kg = group(k[:, 1:])
    vg = group(v[:, 1:])
    G, S = qg.shape[1], qg.shape[2]

    # broadcast the CLS key/value into every group as key index 0
    cls_k = jnp.broadcast_to(k[:, :1][:, :, None], (B, G, 1, H, d))
    cls_v = jnp.broadcast_to(v[:, :1][:, :, None], (B, G, 1, H, d))
    kg = jnp.concatenate([cls_k, kg], axis=2)  # (B, G, 1+S, H, d)
    vg = jnp.concatenate([cls_v, vg], axis=2)

    scores = jnp.einsum("bgqhd,bgkhd->bhgqk", qg, kg,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhgqk,bgkhd->bgqhd", probs,
                     vg)                           # (B, G, S, H, d)

    if axis == "time":
        out = out.transpose(0, 2, 1, 3, 4)  # back to (B, F, N, H, d)
    out = out.reshape(B, F * N, H, d)
    return jnp.concatenate([cls_out, out], axis=1)


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
