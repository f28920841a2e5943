"""Fused Pallas LayerNorm vs the XLA formulation (interpret mode)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def ref_ln(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    ms = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    var = jnp.maximum(ms - mean * mean, 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return y.astype(x.dtype)


@pytest.mark.parametrize("G,R,D", [(4, 196, 768), (2, 300, 512), (1, 2048, 128)])
def test_fused_layernorm_matches_reference(G, R, D):
    """Forward and all three gradients, incl. non-multiple-of-block row
    counts (edge-block masking in the dgamma/dbeta accumulators)."""
    from lavila_tpu.ops.pallas.layernorm import fused_layernorm
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(G, R, D)) * 2 + 0.5, jnp.float32)
    scale = jnp.asarray(rng.normal(size=(D,)) * 0.3 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
    fused = functools.partial(fused_layernorm, eps=1e-5, interpret=True)

    got = fused(x, scale, bias)
    want = ref_ln(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    w = jnp.asarray(rng.normal(size=(G, R, D)), jnp.float32)

    def loss(fn):
        return lambda x, s, b: jnp.sum(fn(x, s, b).astype(jnp.float32) * w)

    g_got = jax.grad(loss(fused), argnums=(0, 1, 2))(x, scale, bias)
    g_want = jax.grad(loss(ref_ln), argnums=(0, 1, 2))(x, scale, bias)
    for a, b, name in zip(g_got, g_want, ["dx", "dscale", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_fused_layernorm_bf16():
    """bf16 activations keep fp32 statistics: outputs match the fp32-stat
    reference within the bf16 grid."""
    from lavila_tpu.ops.pallas.layernorm import fused_layernorm
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 512, 256)), jnp.bfloat16)
    scale = jnp.ones((256,), jnp.float32)
    bias = jnp.zeros((256,), jnp.float32)
    got = fused_layernorm(x, scale, bias, 1e-5, True).astype(jnp.float32)
    want = ref_ln(x, scale, bias).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


def test_layernorm_module_routes_to_fused(monkeypatch):
    """ops.basic.LayerNorm picks the fused kernel under the pallas
    backend for 128-aligned dims and matches the XLA path."""
    from lavila_tpu.ops import attention as A
    from lavila_tpu.ops import basic
    from lavila_tpu.ops.pallas import layernorm as LNK

    calls = []
    orig = LNK.fused_layernorm

    def spy(x, s, b, eps=1e-5, interpret=False):
        calls.append(x.shape)
        return orig(x, s, b, eps, True)  # interpret on CPU

    monkeypatch.setattr(LNK, "fused_layernorm", spy)
    ln = basic.LayerNorm()
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 300, 128)),
                    jnp.float32)
    params = ln.init(jax.random.key(0), x)
    want = ln.apply(params, x)  # xla backend (cpu default)
    old = A.get_attention_backend()
    A.set_attention_backend("pallas")
    try:
        got = ln.apply(params, x)
    finally:
        A.set_attention_backend(old)
    assert calls == [(2, 300, 128)]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("variant", ["sum", "nosum"])
def test_fused_add_layernorm_matches_reference(variant):
    """(y, s) = (LN(a+b), a+b) fused — fwd + grads for a, b, scale, bias,
    incl. the upstream gradient flowing into the returned sum."""
    from lavila_tpu.ops.pallas.layernorm import (fused_add_layernorm,
                                                 fused_add_layernorm_nosum)
    rng = np.random.default_rng(3)
    G, R, D = 3, 196, 256
    a = jnp.asarray(rng.normal(size=(G, R, D)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(G, R, D)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(D,)) * 0.2 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
    wy = jnp.asarray(rng.normal(size=(G, R, D)), jnp.float32)
    ws = jnp.asarray(rng.normal(size=(G, R, D)), jnp.float32)

    if variant == "sum":
        def fused(a, b, s, bi):
            y, sm = fused_add_layernorm(a, b, s, bi, 1e-5, True)
            return jnp.sum(y * wy) + jnp.sum(sm * ws)

        def ref(a, b, s, bi):
            sm = a + b
            return jnp.sum(ref_ln(sm, s, bi) * wy) + jnp.sum(sm * ws)
    else:
        def fused(a, b, s, bi):
            return jnp.sum(
                fused_add_layernorm_nosum(a, b, s, bi, 1e-5, True) * wy)

        def ref(a, b, s, bi):
            return jnp.sum(ref_ln(a + b, s, bi) * wy)

    np.testing.assert_allclose(float(fused(a, b, scale, bias)),
                               float(ref(a, b, scale, bias)), rtol=1e-5)
    g_got = jax.grad(fused, argnums=(0, 1, 2, 3))(a, b, scale, bias)
    g_want = jax.grad(ref, argnums=(0, 1, 2, 3))(a, b, scale, bias)
    for x, y, name in zip(g_got, g_want, ["da", "db", "dscale", "dbias"]):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=3e-4, rtol=3e-4, err_msg=name)


def test_layernorm_module_residual_paths():
    """Module-level residual semantics on the XLA path: (y, s) pair and
    the return_sum=False form match the unfused math."""
    from lavila_tpu.ops import basic
    rng = np.random.default_rng(4)
    ln = basic.LayerNorm()
    x = jnp.asarray(rng.normal(size=(2, 20, 64)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(2, 20, 64)), jnp.float32)
    params = ln.init(jax.random.key(0), x)
    y_plain = ln.apply(params, x + r)
    y, s = ln.apply(params, x, r)
    np.testing.assert_allclose(np.asarray(s), np.asarray(x + r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_plain), rtol=1e-6)
    y2 = ln.apply(params, x, r, False)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y_plain),
                               rtol=1e-6)


def test_vision_ln_knob_routes_4d(monkeypatch):
    """LAVILA_VISION_LN=fused routes 4-D tower activations through the
    fused kernel via a leading-axes reshape — outputs (and the residual
    pair) must match the XLA path bit-for-bit-ish."""
    from lavila_tpu.ops import attention as A
    from lavila_tpu.ops import basic
    monkeypatch.setattr(A, "_BACKEND", "pallas")
    rng = np.random.default_rng(7)
    ln = basic.LayerNorm()
    x = jnp.asarray(rng.normal(size=(2, 4, 64, 128)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(2, 4, 64, 128)), jnp.float32)
    params = ln.init(jax.random.key(0), x)
    monkeypatch.delenv("LAVILA_VISION_LN", raising=False)
    want = ln.apply(params, x)
    wy, ws = ln.apply(params, x, r)
    monkeypatch.setenv("LAVILA_VISION_LN", "fused")
    got = ln.apply(params, x)
    gy, gs = ln.apply(params, x, r)
    assert got.shape == x.shape and gy.shape == x.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(wy),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ws),
                               atol=1e-6, rtol=1e-6)
