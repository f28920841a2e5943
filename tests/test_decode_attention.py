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
