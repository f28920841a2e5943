"""Fused temporal-attention kernel for divided space-time attention.

The temporal phase attends each patch token to the F tokens at the same
spatial position (plus the broadcast CLS key/value). F is tiny (4-16),
so on the XLA path the cost is dominated not by FLOPs but by the
(B, F, N, H, d) ↔ (B, N, F, H, d) HBM relayouts of q/k/v/out — measured
at ~24% of the TSF-B train step. This kernel eliminates them: blocks are
read straight from the frame-major layout (one strided DMA per frame
row), the per-position softmax over the F+1 candidates is unrolled in
VMEM on (bn, H, d) tiles, and a custom VJP runs the matching backward
kernel (CLS k/v grads are emitted as per-block partials and reduced
outside).

Shapes: patch tensors (B, F, N, H, d); CLS k/v (B, H, d). The CLS QUERY
row (global attention over all tokens) stays on the XLA path — it is one
query per clip.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, o_ref, *, F, scale):
    bn = q_ref.shape[2]
    q = [q_ref[0, f].astype(jnp.float32) * scale for f in range(F)]
    k = [k_ref[0, f].astype(jnp.float32) for f in range(F)]
    v = [v_ref[0, f].astype(jnp.float32) for f in range(F)]
    ck = ck_ref[0][None].astype(jnp.float32)       # (1, H, d)
    cv = cv_ref[0][None].astype(jnp.float32)

    for f in range(F):
        # scores: key 0 = CLS, keys 1..F = frames (reference key order)
        s = [jnp.sum(q[f] * ck, axis=-1, keepdims=True)]
        s += [jnp.sum(q[f] * k[g], axis=-1, keepdims=True)
              for g in range(F)]
        m = s[0]
        for t in s[1:]:
            m = jnp.maximum(m, t)
        e = [jnp.exp(t - m) for t in s]
        z = e[0]
        for t in e[1:]:
            z = z + t
        inv = 1.0 / z
        out = (e[0] * inv) * cv
        for g in range(F):
            out = out + (e[g + 1] * inv) * v[g]
        o_ref[0, f] = out.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, do_ref, dq_ref,
                dk_ref, dv_ref, dck_ref, dcv_ref, *, F, scale):
    q = [q_ref[0, f].astype(jnp.float32) for f in range(F)]
    k = [k_ref[0, f].astype(jnp.float32) for f in range(F)]
    v = [v_ref[0, f].astype(jnp.float32) for f in range(F)]
    do = [do_ref[0, f].astype(jnp.float32) for f in range(F)]
    ck = ck_ref[0][None].astype(jnp.float32)
    cv = cv_ref[0][None].astype(jnp.float32)

    dk_acc = [jnp.zeros_like(k[0]) for _ in range(F)]
    dv_acc = [jnp.zeros_like(v[0]) for _ in range(F)]
    dck = jnp.zeros_like(q[0])
    dcv = jnp.zeros_like(q[0])

    for f in range(F):
        qf = q[f] * scale
        s = [jnp.sum(qf * ck, axis=-1, keepdims=True)]
        s += [jnp.sum(qf * k[g], axis=-1, keepdims=True) for g in range(F)]
        m = s[0]
        for t in s[1:]:
            m = jnp.maximum(m, t)
        e = [jnp.exp(t - m) for t in s]
        z = e[0]
        for t in e[1:]:
            z = z + t
        p = [t / z for t in e]                       # F+1 probs (bn, H, 1)
        # dp_g = <do_f, v_g>; softmax bwd: ds = p*(dp - sum p*dp)
        dp = [jnp.sum(do[f] * cv, axis=-1, keepdims=True)]
        dp += [jnp.sum(do[f] * v[g], axis=-1, keepdims=True)
               for g in range(F)]
        dot = p[0] * dp[0]
        for g in range(F):
            dot = dot + p[g + 1] * dp[g + 1]
        ds = [p[i] * (dp[i] - dot) for i in range(F + 1)]

        dqf = ds[0] * ck
        for g in range(F):
            dqf = dqf + ds[g + 1] * k[g]
        dq_ref[0, f] = (dqf * scale).astype(dq_ref.dtype)

        dck = dck + ds[0] * qf
        dcv = dcv + p[0] * do[f]
        for g in range(F):
            dk_acc[g] = dk_acc[g] + ds[g + 1] * qf
            dv_acc[g] = dv_acc[g] + p[g + 1] * do[f]

    for g in range(F):
        dk_ref[0, g] = dk_acc[g].astype(dk_ref.dtype)
        dv_ref[0, g] = dv_acc[g].astype(dv_ref.dtype)
    # CLS grads: reduce the bn axis -> per-block partials (H, d)
    dck_ref[0, 0] = jnp.sum(dck, axis=0).astype(dck_ref.dtype)
    dcv_ref[0, 0] = jnp.sum(dcv, axis=0).astype(dcv_ref.dtype)


def _pad_n(x, bn):
    pad = (-x.shape[2]) % bn
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[2] = (0, pad)
    return jnp.pad(x, widths)


def _specs(F, bn, H, d):
    patch = pl.BlockSpec((1, F, bn, H, d), lambda b, j: (b, 0, j, 0, 0),
                         memory_space=pltpu.VMEM)
    cls = pl.BlockSpec((1, H, d), lambda b, j: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    return patch, cls


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def time_attention(q, k, v, cls_k, cls_v, F: int,
                   scale: Optional[float] = None, interpret: bool = False):
    """q/k/v (B, F, N, H, d) frame-major patches; cls_k/v (B, H, d).
    Returns (B, F, N, H, d): each (f, n) token attends over
    {CLS, (0..F-1, n)}."""
    out, _ = _fwd_impl(q, k, v, cls_k, cls_v, F, scale, interpret)
    return out


def _fwd_impl(q, k, v, cls_k, cls_v, F, scale, interpret, bn: int = 32):
    B, _, N, H, d = q.shape
    scale = d ** -0.5 if scale is None else scale
    qp, kp, vp = (_pad_n(t, bn) for t in (q, k, v))
    nb = qp.shape[2] // bn
    patch, cls = _specs(F, bn, H, d)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, F=F, scale=scale),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        grid=(B, nb),
        in_specs=[patch, patch, patch, cls, cls],
        out_specs=patch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qp, kp, vp, cls_k, cls_v)
    return out[:, :, :N], (q, k, v, cls_k, cls_v)


def _fwd_rule(q, k, v, cls_k, cls_v, F, scale, interpret):
    return _fwd_impl(q, k, v, cls_k, cls_v, F, scale, interpret)


def _bwd_rule(F, scale, interpret, res, g, bn: int = 32):
    q, k, v, cls_k, cls_v = res
    B, _, N, H, d = q.shape
    scale_v = d ** -0.5 if scale is None else scale
    qp, kp, vp = (_pad_n(t, bn) for t in (q, k, v))
    gp = _pad_n(g, bn)
    nb = qp.shape[2] // bn
    patch, cls = _specs(F, bn, H, d)
    partial_spec = pl.BlockSpec((1, 1, H, d), lambda b, j: (b, j, 0, 0),
                                memory_space=pltpu.VMEM)
    dq, dk, dv, dck_p, dcv_p = pl.pallas_call(
        functools.partial(_bwd_kernel, F=F, scale=scale_v),
        out_shape=(
            jax.ShapeDtypeStruct(qp.shape, q.dtype),
            jax.ShapeDtypeStruct(kp.shape, k.dtype),
            jax.ShapeDtypeStruct(vp.shape, v.dtype),
            jax.ShapeDtypeStruct((B, nb, H, d), jnp.float32),
            jax.ShapeDtypeStruct((B, nb, H, d), jnp.float32),
        ),
        grid=(B, nb),
        in_specs=[patch, patch, patch, cls, cls, patch],
        out_specs=(patch, patch, patch, partial_spec, partial_spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qp, kp, vp, cls_k, cls_v, gp)
    return (dq[:, :, :N], dk[:, :, :N], dv[:, :, :N],
            dck_p.sum(axis=1).astype(cls_k.dtype),
            dcv_p.sum(axis=1).astype(cls_v.dtype))


time_attention.defvjp(_fwd_rule, _bwd_rule)
