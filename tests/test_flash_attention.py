"""Pallas flash attention vs the reference einsum path (interpret mode on
CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lavila_tpu.ops.attention import attention, causal_mask
from lavila_tpu.ops.pallas.flash_attention import flash_attention


def ref_attention(q, k, v, causal=False):
    # q,k,v: (B, H, L, d) → reference via the einsum path (B, L, H, d)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    mask = causal_mask(q.shape[2]) if causal else None
    out = attention(qt, kt, vt, mask=mask)
    return out.transpose(0, 2, 1, 3)


@pytest.mark.parametrize("lq,lk,causal", [
    (197, 197, False),   # TimeSformer space-attention group size
    (64, 197, False),    # uneven q/kv
    (77, 77, True),      # CLIP text causal
    (130, 260, False),   # multi-block both axes
])
def test_flash_matches_reference(lq, lk, causal):
    rng = np.random.default_rng(0)
    B, H, d = 2, 3, 64
    q = jnp.asarray(rng.normal(size=(B, H, lq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, lk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, lk, d)), jnp.float32)
    got = flash_attention(q, k, v, causal=causal, interpret=True)
    want = ref_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_flash_bf16():
    rng = np.random.default_rng(1)
    B, H, L, d = 1, 2, 96, 64
    q = jnp.asarray(rng.normal(size=(B, H, L, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, L, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, L, d)), jnp.bfloat16)
    got = flash_attention(q, k, v, interpret=True)
    want = ref_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32))
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=3e-2, rtol=3e-2)


def test_fused_attention_custom_vjp_matches_xla_grads():
    """Pallas fwd+bwd (custom VJP) vs autodiff through the einsum path."""
    from lavila_tpu.ops.pallas.flash_attention import fused_attention
    rng = np.random.default_rng(2)
    B, H, Lq, Lk, d = 1, 2, 67, 70, 32
    q = jnp.asarray(rng.normal(size=(B, H, Lq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, Lk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, Lk, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(B, H, Lq, d)), jnp.float32)

    def loss_fused(q, k, v):
        o = fused_attention(q, k, v, False, None, 64, 64, 2, True)
        return jnp.sum(o * w)

    def loss_ref(q, k, v):
        return jnp.sum(ref_attention(q, k, v) * w)

    o_f = fused_attention(q, k, v, False, None, 64, 64, 2, True)
    np.testing.assert_allclose(np.asarray(o_f),
                               np.asarray(ref_attention(q, k, v)),
                               atol=2e-5, rtol=1e-4)
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_f, g_r, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3,
                                   err_msg=f"d{name}")


def test_fused_attention_causal_grads():
    from lavila_tpu.ops.pallas.flash_attention import fused_attention
    rng = np.random.default_rng(3)
    B, H, L, d = 1, 1, 40, 16
    q = jnp.asarray(rng.normal(size=(B, H, L, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, L, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, L, d)), jnp.float32)

    def loss_fused(q):
        return jnp.sum(fused_attention(q, k, v, True, None, 32, 32, 1,
                                       True) ** 2)

    def loss_ref(q):
        return jnp.sum(ref_attention(q, k, v, causal=True) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_fused)(q)),
        np.asarray(jax.grad(loss_ref)(q)), atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("axis", ["time", "space"])
def test_divided_phase_kernel_matches_grouped(axis):
    """Fused divided-phase kernel (token-major, CLS folded in) vs the
    grouped einsum oracle, fwd + grads incl. the CLS k/v rows
    (interpret mode)."""
    from lavila_tpu.ops import attention as A
    from lavila_tpu.ops.pallas.divided import divided_phase
    rng = np.random.default_rng(5)
    B, F, N, H, dh = 2, 4, 24, 3, 16
    D = H * dh
    L = 1 + F * N
    scale = dh ** -0.5
    q = jnp.asarray(rng.normal(size=(B, L, H, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, H, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, H, dh)), jnp.float32)

    old = A.get_attention_backend()
    A.set_attention_backend("grouped")
    try:
        want = A.divided_attention(q, k, v, F, axis)[:, 1:]

        def loss_ref(q, k, v):
            out = A.divided_attention(q, k, v, F, axis)[:, 1:]
            return jnp.sum(out.astype(jnp.float32) ** 2)

        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    finally:
        A.set_attention_backend(old)

    def kern(q, k, v):
        return divided_phase(
            q[:, 1:].reshape(B, F, N, D), k[:, 1:].reshape(B, F, N, D),
            v[:, 1:].reshape(B, F, N, D), k[:, 0].reshape(B, D),
            v[:, 0].reshape(B, D), axis, H, scale, True)

    got = kern(q, k, v).reshape(B, F * N, H, dh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)

    def loss_kern(q, k, v):
        return jnp.sum(kern(q, k, v).astype(jnp.float32) ** 2)

    gk = jax.grad(loss_kern, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, gr, "qkv"):
        # patch rows always; CLS rows for k/v (the kernel loss has no
        # CLS-query term, so dq[:, 0] differs by construction)
        np.testing.assert_allclose(np.asarray(a)[:, 1:],
                                   np.asarray(b)[:, 1:],
                                   atol=5e-4, rtol=1e-3, err_msg=name)
        if name != "q":
            np.testing.assert_allclose(np.asarray(a)[:, 0],
                                       np.asarray(b)[:, 0],
                                       atol=5e-4, rtol=1e-3,
                                       err_msg=name + "_cls")


@pytest.mark.parametrize("F,N", [(12, 8), (4, 52)])
def test_divided_phase_time_kernel_tiled_geometries(F, N, monkeypatch):
    """The segmented temporal kernel across its Nb-tiling regimes:
    F > 8 (the long-clip branch, reachable via
    LAVILA_TIME_ATTENTION=pallas now that F > 8 defaults to the XLA
    grouped phase) and an N that does not divide the forced Nb=16 tile
    (edge-block padding + dck/dcv row masking). A separate F=16 case
    added nothing (same branches, same untiled nblock at toy D) and
    cost ~30 s of interpret-mode grads on this 1-CPU host."""
    from lavila_tpu.ops import attention as A
    from lavila_tpu.ops.pallas import divided as DV
    divided_phase = DV.divided_phase
    if N > 16:
        monkeypatch.setattr(
            DV, "_time_nblock",
            lambda N_, F_, D_, Hp_, it_, bwd: min(N_, 16))
    rng = np.random.default_rng(11)
    B, H, dh = 2, 3, 16
    D = H * dh
    L = 1 + F * N
    scale = dh ** -0.5
    q = jnp.asarray(rng.normal(size=(B, L, H, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, H, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, H, dh)), jnp.float32)

    old = A.get_attention_backend()
    A.set_attention_backend("grouped")
    try:
        want = A.divided_attention(q, k, v, F, "time")[:, 1:]

        def loss_ref(q, k, v):
            out = A.divided_attention(q, k, v, F, "time")[:, 1:]
            return jnp.sum(out.astype(jnp.float32) ** 2)

        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    finally:
        A.set_attention_backend(old)

    def kern(q, k, v):
        return divided_phase(
            q[:, 1:].reshape(B, F, N, D), k[:, 1:].reshape(B, F, N, D),
            v[:, 1:].reshape(B, F, N, D), k[:, 0].reshape(B, D),
            v[:, 0].reshape(B, D), "time", H, scale, True)

    got = kern(q, k, v).reshape(B, F * N, H, dh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)

    def loss_kern(q, k, v):
        return jnp.sum(kern(q, k, v).astype(jnp.float32) ** 2)

    gk = jax.grad(loss_kern, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a)[:, 1:],
                                   np.asarray(b)[:, 1:],
                                   atol=5e-4, rtol=1e-3, err_msg=name)
        if name != "q":
            np.testing.assert_allclose(np.asarray(a)[:, 0],
                                       np.asarray(b)[:, 0],
                                       atol=5e-4, rtol=1e-3,
                                       err_msg=name + "_cls")


@pytest.mark.parametrize("axis", ["time", "space"])
def test_divided_phase_kernel_tsf_l_geometry(axis):
    """TSF-L head geometry (H=16, head_dim=64, D=1024, N=(224/14)^2=256
    patches) through the fused kernels — the flagship-large shape the
    bench's --model tsf_l mode runs (interpret mode, small B/F)."""
    from lavila_tpu.ops import attention as A
    from lavila_tpu.ops.pallas.divided import divided_phase
    rng = np.random.default_rng(6)
    B, F, N, H, dh = 1, 2, 256, 16, 64
    D = H * dh
    L = 1 + F * N
    scale = dh ** -0.5
    q = jnp.asarray(rng.normal(size=(B, L, H, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, H, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, H, dh)), jnp.float32)

    old = A.get_attention_backend()
    A.set_attention_backend("grouped")
    try:
        want = A.divided_attention(q, k, v, F, axis)[:, 1:]
    finally:
        A.set_attention_backend(old)

    got = divided_phase(
        q[:, 1:].reshape(B, F, N, D), k[:, 1:].reshape(B, F, N, D),
        v[:, 1:].reshape(B, F, N, D), k[:, 0].reshape(B, D),
        v[:, 0].reshape(B, D), axis, H, scale, True)
    np.testing.assert_allclose(
        np.asarray(got).reshape(B, F * N, H, dh), np.asarray(want),
        atol=2e-5, rtol=1e-4)
