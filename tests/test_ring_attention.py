"""Ring attention on the 8-device mesh vs single-device attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from lavila_tpu.ops.attention import attention, causal_mask
from lavila_tpu.ops.ring_attention import ring_attention


def full_ref(q, k, v, causal):
    qt, kt, vt = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
    mask = causal_mask(q.shape[2]) if causal else None
    return attention(qt, kt, vt, mask=mask).transpose(0, 2, 1, 3)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_full(causal):
    rng = np.random.default_rng(0)
    B, H, L, d = 2, 3, 64, 16   # L sharded 8-way → 8 tokens per device
    q = jnp.asarray(rng.normal(size=(B, H, L, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, L, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, L, d)), jnp.float32)

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("sp",))
    fn = shard_map(
        lambda q, k, v: ring_attention(q, k, v, "sp", causal=causal),
        mesh=mesh,
        in_specs=(P(None, None, "sp"),) * 3,
        out_specs=P(None, None, "sp"))
    got = fn(q, k, v)
    want = full_ref(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_ring_attention_grads_flow():
    rng = np.random.default_rng(1)
    B, H, L, d = 1, 2, 32, 8
    q = jnp.asarray(rng.normal(size=(B, H, L, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, L, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, L, d)), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("sp",))
    fn = shard_map(
        lambda q, k, v: ring_attention(q, k, v, "sp"),
        mesh=mesh, in_specs=(P(None, None, "sp"),) * 3,
        out_specs=P(None, None, "sp"))
    g_ring = jax.grad(lambda q: jnp.sum(fn(q, k, v) ** 2))(q)
    g_ref = jax.grad(lambda q: jnp.sum(full_ref(q, k, v, False) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref),
                               atol=5e-4, rtol=1e-3)


def test_divided_time_ring_matches_dense():
    """Sequence-parallel temporal divided attention == the dense
    divided_attention(axis='time') path, CLS semantics included."""
    from lavila_tpu.ops.attention import divided_attention
    from lavila_tpu.ops.ring_attention import divided_time_ring
    rng = np.random.default_rng(2)
    B, F, N, H, d = 2, 8, 5, 3, 16   # F=8 sharded over 4 devices
    L = 1 + F * N
    q = jnp.asarray(rng.normal(size=(B, L, H, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, H, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, H, d)), jnp.float32)

    want = divided_attention(q, k, v, num_frames=F, axis="time")
    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("seq",))
    got = divided_time_ring(q, k, v, F, mesh, "seq")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_ring_mesh_wires_into_spacetime_transformer():
    """set_ring_mesh routes every temporal phase of a real
    SpaceTimeTransformer forward through the ring path — outputs match
    the dense model bit-for-tolerance. This is the num_frames >> 16
    long-clip capability switch."""
    from lavila_tpu.models.timesformer import SpaceTimeTransformer
    from lavila_tpu.ops import attention as A

    model = SpaceTimeTransformer(img_size=32, patch_size=16, embed_dim=32,
                                 depth=2, num_heads=4, num_frames=8,
                                 ln_pre=True, act="quick_gelu")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]
    want = model.apply({"params": params}, x)

    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("seq",))
    A.set_ring_mesh(mesh, "seq")
    try:
        got = model.apply({"params": params}, x)
    finally:
        A.set_ring_mesh(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)
