"""Fused decode-attention kernel == the segmented XLA formulation."""

import jax.numpy as jnp
import numpy as np
import pytest

from lavila_tpu.models.gpt2 import _segmented_decode_attention
from lavila_tpu.ops.pallas.decode_attention import decode_attention_fused


@pytest.mark.parametrize("num_valid", [0, 5, 12])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_matches_segmented(num_valid, dtype):
    rng = np.random.default_rng(7)
    B, K, H, d = 16, 12, 4, 16
    D = H * d
    mk = lambda *s: jnp.asarray(rng.normal(size=s), dtype)  # noqa: E731
    q, kn, vn = mk(B, 1, D), mk(B, 1, D), mk(B, 1, D)
    kc, vc = mk(B, K, D), mk(B, K, D)
    want = _segmented_decode_attention(q, kc, vc, kn, vn, num_valid, H, d)
    got = decode_attention_fused(q, kc, vc, kn, vn, num_valid, H, d,
                                 block_b=8, interpret=True)
    tol = 2e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=tol, rtol=tol)


def test_fused_odd_batch_falls_back_to_smaller_blocks():
    rng = np.random.default_rng(1)
    B, K, H, d = 6, 4, 2, 8
    D = H * d
    mk = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)  # noqa
    q, kn, vn = mk(B, 1, D), mk(B, 1, D), mk(B, 1, D)
    kc, vc = mk(B, K, D), mk(B, K, D)
    want = _segmented_decode_attention(q, kc, vc, kn, vn, 3, H, d)
    got = decode_attention_fused(q, kc, vc, kn, vn, 3, H, d,
                                 block_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_odd_lane_filling_batch_routes_to_mulreduce():
    """A prime B >= 128 (131) degrades the kernel's divisor search to
    block_b=1, slower than the mul-reduce it replaced — the routing
    guard in models/gpt2.py requires effective_block_b >= 2 (ADVICE
    r3)."""
    import jax
    from lavila_tpu.ops import attention as A
    from lavila_tpu.ops.pallas.decode_attention import effective_block_b

    B, K, H, d = 131, 77, 20, 64          # XL-geometry decode, prime B
    D = H * d
    assert effective_block_b(B, K, D) == 1    # divisor search degrades
    assert effective_block_b(128, K, D) >= 2  # the even batch stays fused
    # divisor search beats halving: XL geometry cap=5 must pick 4 for
    # B=128, not halve 5 -> 2
    assert effective_block_b(128, 77, 1600) == 4
    import lavila_tpu.ops.pallas.decode_attention as DA
    old = A.get_attention_backend()
    A.set_attention_backend("pallas")
    orig_fused = DA.decode_attention_fused

    def must_not_be_called(*a, **k):
        raise AssertionError("kernel reached despite degraded block_b")

    DA.decode_attention_fused = must_not_be_called
    try:
        sd = jax.ShapeDtypeStruct
        out = jax.eval_shape(
            lambda q, kc, vc, kn, vn: _segmented_decode_attention(
                q, kc, vc, kn, vn, 5, H, d),
            sd((B, 1, D), jnp.bfloat16), sd((B, K, D), jnp.bfloat16),
            sd((B, K, D), jnp.bfloat16), sd((B, 1, D), jnp.bfloat16),
            sd((B, 1, D), jnp.bfloat16))
        assert out.shape == (B, 1, D)
    finally:
        DA.decode_attention_fused = orig_fused
        A.set_attention_backend(old)


def test_decode_kernel_off_disables_every_dispatch(monkeypatch):
    """LAVILA_DECODE_KERNEL=off must mean the XLA forms at EVERY batch.
    Round-5 review: the B >= 128 branch used to re-dispatch the kernel
    without consulting the knob, so an 'off' A/B at b128 silently
    measured kernel-vs-kernel."""
    import jax
    import lavila_tpu.ops.pallas.decode_attention as DA
    from lavila_tpu.ops import attention as A

    B, K, H, d = 128, 12, 20, 64          # kernel-eligible: D=1280
    D = H * d
    assert DA.effective_block_b(B, K, D) >= 2
    old = A.get_attention_backend()
    A.set_attention_backend("pallas")
    orig_fused = DA.decode_attention_fused
    hits = []
    DA.decode_attention_fused = (
        lambda *a, **k: hits.append(1) or orig_fused(*a, **k))
    sd = jax.ShapeDtypeStruct
    args = (sd((B, 1, D), jnp.bfloat16), sd((B, K, D), jnp.bfloat16),
            sd((B, K, D), jnp.bfloat16), sd((B, 1, D), jnp.bfloat16),
            sd((B, 1, D), jnp.bfloat16))
    fn = lambda q, kc, vc, kn, vn: _segmented_decode_attention(  # noqa
        q, kc, vc, kn, vn, 5, H, d)
    try:
        jax.eval_shape(fn, *args)
        assert hits, "default at this geometry should dispatch the kernel"
        hits.clear()
        monkeypatch.setenv("LAVILA_DECODE_KERNEL", "off")
        out = jax.eval_shape(fn, *args)
        assert not hits, "'off' must disable the B >= 128 dispatch too"
        assert out.shape == (B, 1, D)
    finally:
        DA.decode_attention_fused = orig_fused
        A.set_attention_backend(old)


def test_large_k_routes_to_mulreduce_not_kernel():
    """Decode lengths whose k/v slabs exceed the kernel's VMEM budget
    (max_block_b == 0) must route to the XLA mul-reduce instead of
    raising from the kernel — checked at trace time via eval_shape."""
    import jax
    from lavila_tpu.models.gpt2 import _segmented_decode_attention
    from lavila_tpu.ops import attention as A
    from lavila_tpu.ops.pallas.decode_attention import max_block_b

    B, K, H, d = 128, 512, 20, 64
    D = H * d
    assert max_block_b(K, D) < 1          # the geometry under test
    old = A.get_attention_backend()
    A.set_attention_backend("pallas")     # kernel-eligible backend
    try:
        sd = jax.ShapeDtypeStruct
        out = jax.eval_shape(
            lambda q, kc, vc, kn, vn: _segmented_decode_attention(
                q, kc, vc, kn, vn, 5, H, d),
            sd((B, 1, D), jnp.bfloat16), sd((B, K, D), jnp.bfloat16),
            sd((B, K, D), jnp.bfloat16), sd((B, 1, D), jnp.bfloat16),
            sd((B, 1, D), jnp.bfloat16))
        assert out.shape == (B, 1, D)
    finally:
        A.set_attention_backend(old)
