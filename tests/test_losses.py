"""Loss math tests, incl. multi-device equivalence of the shard_map path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from lavila_tpu import losses


def rand_embeds(n=16, d=8, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, d)).astype(np.float32)
    b = rng.normal(size=(n, d)).astype(np.float32)
    return jnp.array(a), jnp.array(b)


def test_clip_loss_matches_manual():
    img, txt = rand_embeds()
    scale = jnp.float32(10.0)
    out = losses.clip_loss(img, txt, scale)
    logits = 10.0 * np.asarray(img) @ np.asarray(txt).T

    def xent(lg):
        m = lg.max(axis=1, keepdims=True)
        logz = m[:, 0] + np.log(np.exp(lg - m).sum(axis=1))
        return np.mean(logz - lg[np.arange(len(lg)), np.arange(len(lg))])

    want = 0.5 * (xent(logits) + xent(logits.T))
    np.testing.assert_allclose(float(out["loss"]), want, rtol=1e-5)
    assert 0.0 <= float(out["clip_acc"]) <= 100.0


def test_clip_loss_perfect_alignment_low_loss():
    d = 32
    img = jnp.eye(d, dtype=jnp.float32)[:8]
    out = losses.clip_loss(img, img, jnp.float32(100.0))
    assert float(out["loss"]) < 1e-3
    assert float(out["clip_acc"]) == 100.0


def test_clip_loss_local_matches_global_on_mesh():
    """The shard_map local-loss formulation must equal the global one."""
    img, txt = rand_embeds(n=16, d=8)
    scale = jnp.float32(5.0)
    want = losses.clip_loss(img, txt, scale)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), axis_names=("data",))
    fn = shard_map(
        lambda i, t: losses.clip_loss_local(i, t, scale),
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P(),
    )
    got = fn(img, txt)
    np.testing.assert_allclose(float(got["loss"]), float(want["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(got["clip_acc"]),
                               float(want["clip_acc"]), rtol=1e-5)


def test_clip_loss_gradients_flow_through_gather():
    """Gradients through the local (all_gather) path must match the global
    path — the property the reference needs GatherLayer for
    (reference distributed_utils.py:51-89)."""
    img, txt = rand_embeds(n=8, d=4)
    scale = jnp.float32(3.0)

    g_global = jax.grad(
        lambda i: losses.clip_loss(i, txt, scale)["loss"])(img)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), axis_names=("data",))

    def local_loss(i, t):
        return losses.clip_loss_local(i, t, scale)["loss"]

    fn = shard_map(local_loss, mesh=mesh, in_specs=(P("data"), P("data")),
                   out_specs=P())
    g_local = jax.grad(lambda i: fn(i, txt))(img)
    np.testing.assert_allclose(np.asarray(g_local), np.asarray(g_global),
                               rtol=1e-4, atol=1e-6)


def test_ssl_clip_loss_temperature_matrix():
    img, txt = rand_embeds(n=6, d=4, seed=3)
    ind = jnp.array([1, 1, 0, 0, 1, 0], jnp.int32)
    scale, pscale = jnp.float32(10.0), jnp.float32(5.0)
    out = losses.ssl_clip_loss(img, txt, scale, pscale, ind)
    # manual: temperature by indicator-pair
    s = np.asarray(img) @ np.asarray(txt).T
    indn = np.asarray(ind)
    m = indn[None, :] + indn[:, None]
    sm = np.where(m == 2, 10.0, np.where(m == 0, 5.0, np.sqrt(50.0)))
    logits = sm * s

    def xent(lg):
        m = lg.max(axis=1, keepdims=True)
        logz = m[:, 0] + np.log(np.exp(lg - m).sum(axis=1))
        return np.mean(logz - lg[np.arange(len(lg)), np.arange(len(lg))])

    want = 0.5 * (xent(logits) + xent(logits.T))
    np.testing.assert_allclose(float(out["loss"]), want, rtol=1e-5)
    assert float(out["num_gt"]) == 3
    assert float(out["num_pseudo"]) == 3


def test_ssl_clip_loss_local_matches_global_incl_grads():
    """ssl_clip_loss_local (shard_map, B_local x B_global logit rows) must
    reproduce the global two-temperature loss exactly, including the
    gradients through both embeddings and both temperatures."""
    img, txt = rand_embeds(n=16, d=8, seed=5)
    ind = jnp.array([1, 0] * 8, jnp.int32)
    scale, pscale = jnp.float32(10.0), jnp.float32(5.0)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), axis_names=("data",))
    fn = shard_map(
        lambda i, t, s, ps, d: losses.ssl_clip_loss_local(i, t, s, ps, d),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P(), P(), P("data")),
        out_specs=P())

    want = losses.ssl_clip_loss(img, txt, scale, pscale, ind)
    got = fn(img, txt, scale, pscale, ind)
    for k in want:
        np.testing.assert_allclose(float(got[k]), float(want[k]), rtol=1e-5,
                                   err_msg=k)

    def g_loss(i, t, s, ps):
        return losses.ssl_clip_loss(i, t, s, ps, ind)["loss"]

    def l_loss(i, t, s, ps):
        return fn(i, t, s, ps, ind)["loss"]

    g = jax.grad(g_loss, argnums=(0, 1, 2, 3))(img, txt, scale, pscale)
    l = jax.grad(l_loss, argnums=(0, 1, 2, 3))(img, txt, scale, pscale)
    for gg, ll in zip(g, l):
        np.testing.assert_allclose(np.asarray(ll), np.asarray(gg),
                                   rtol=1e-4, atol=1e-6)


def test_caption_loss_ignores_padding():
    B, L, V = 2, 5, 11
    rng = np.random.default_rng(0)
    logits = jnp.array(rng.normal(size=(B, L, V)).astype(np.float32))
    labels = jnp.array([[3, 4, 5, 0, 0], [1, 2, 0, 0, 0]])
    out = losses.caption_loss(logits, labels, pad_id=0)
    # changing logits at padded positions must not change the loss
    logits2 = logits.at[0, 4].add(100.0)
    out2 = losses.caption_loss(logits2, labels, pad_id=0)
    np.testing.assert_allclose(float(out["loss"]), float(out2["loss"]),
                               rtol=1e-6)
    assert float(out["ppl"]) > 1.0


def test_max_margin_loss_zero_when_separated():
    # positives hugely better than negatives -> zero hinge
    img = jnp.eye(4, dtype=jnp.float32)
    out = losses.max_margin_loss(img, img, margin=0.2)
    assert float(out["loss"]) == 0.0


def test_max_margin_adaptive_weights():
    img, txt = rand_embeds(n=5, d=4, seed=7)
    w = jnp.array([1.0, 0.5, 0.2, 1.0, 0.8], jnp.float32)
    out_w = losses.max_margin_loss(img, txt, margin=0.4, weights=w)
    out = losses.max_margin_loss(img, txt, margin=0.4)
    assert float(out_w["loss"]) != float(out["loss"])
    # weights <= 1 shrink margins -> loss should not increase
    assert float(out_w["loss"]) <= float(out["loss"]) + 1e-6


def test_get_loss_and_metric_names():
    assert losses.get_loss("CLIP_OPENAI_TIMESFORMER_BASE") is \
        losses.clip_loss
    assert losses.get_loss("VCLM_OPENAI_TIMESFORMER_BASE_GPT2") is \
        losses.caption_loss
    assert losses.get_metric_names("CLIP_X") == ["loss", "clip_loss",
                                                 "clip_acc"]
    assert "ppl" in losses.get_metric_names("VCLM_X")
