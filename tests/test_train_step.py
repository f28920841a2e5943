"""End-to-end sharded training step on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from lavila_tpu.models.dual_encoder import VideoCLIP
from lavila_tpu.models.openai_clip import TextTransformer
from lavila_tpu.models.timesformer import SpaceTimeTransformer
from lavila_tpu.parallel import create_mesh, shard_batch, shard_params
from lavila_tpu.train.optim import (cosine_schedule, make_optimizer, wd_mask,
                                    clamp_logit_scale)
from lavila_tpu.train.step import TrainState, make_clip_train_step


def tiny_model():
    return VideoCLIP(
        vision_model=SpaceTimeTransformer(
            img_size=32, patch_size=16, embed_dim=32, depth=1, num_heads=4,
            num_frames=2, ln_pre=True, act="quick_gelu"),
        text_model=TextTransformer(context_length=8, vocab_size=32, width=32,
                                   heads=4, layers=1, embed_dim=16),
        vision_width=32, embed_dim=16)


def make_batch(n=16):
    rng = np.random.default_rng(0)
    return {
        "frames": jnp.array(
            rng.normal(size=(n, 2, 32, 32, 3)).astype(np.float32)),
        "text": jnp.array(rng.integers(1, 31, size=(n, 8)), jnp.int32),
    }


def test_train_step_decreases_loss_on_mesh():
    model = tiny_model()
    batch = make_batch()
    params = model.init(jax.random.key(0), batch["frames"][:1],
                        batch["text"][:1])["params"]
    tx = make_optimizer(cosine_schedule(1e-3, 1e-5, 2, 10, warmup_epochs=0),
                        weight_decay=0.01)
    state = TrainState.create(params, tx)

    mesh = create_mesh(data=8, model=1)
    state = state.replace(
        params=shard_params(state.params, mesh),
        opt_state=jax.tree.map(
            lambda x: x, state.opt_state))
    batch = shard_batch(batch, mesh)

    step = jax.jit(make_clip_train_step(model, norm_embed=True))
    state, m0 = step(state, batch)
    for _ in range(10):
        state, m = step(state, batch)
    assert float(m["loss"]) < float(m0["loss"])
    assert int(state.step) == 11
    # logit_scale stays clamped
    assert 0.0 <= float(state.params["logit_scale"]) <= 4.6052 + 1e-6


def test_ssl_train_step():
    model = tiny_model()
    batch = make_batch(8)
    batch["gt_indicators"] = jnp.array([1, 0, 1, 0, 1, 0, 1, 0], jnp.int32)
    params = model.init(jax.random.key(0), batch["frames"][:1],
                        batch["text"][:1])["params"]
    tx = make_optimizer(1e-3)
    crit = {"logit_scale_pseudo": jnp.asarray(np.log(1 / 0.08), jnp.float32)}
    state = TrainState.create(params, tx, criterion_params=crit)
    step = jax.jit(make_clip_train_step(model, norm_embed=True, use_ssl=True))
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["num_gt"]) == 4


def test_local_loss_step_matches_global_step():
    """--contrastive-use-vissl path: one train step with the shard_map
    local loss must produce the same params, loss and metrics as the
    global-logits path (both for plain CLIP and the SSL criterion).
    SGD keeps the update linear in the grads, so float-reassociation
    noise between the two matmul partitionings stays at epsilon scale
    (Adam's m/sqrt(v) would amplify near-zero-grad noise to +-lr)."""
    mesh = create_mesh(data=8, model=1)
    for use_ssl in (False, True):
        model = tiny_model()
        batch = make_batch(16)
        if use_ssl:
            batch["gt_indicators"] = jnp.array([1, 0] * 8, jnp.int32)
        params = model.init(jax.random.key(0), batch["frames"][:1],
                            batch["text"][:1])["params"]
        tx = make_optimizer(1e-2, use_sgd=True, momentum=0.0,
                            weight_decay=0.0)
        crit = ({"logit_scale_pseudo": jnp.asarray(np.log(1 / 0.08),
                                                   jnp.float32)}
                if use_ssl else None)

        def run(local):
            state = TrainState.create(params, tx, criterion_params=crit)
            state = state.replace(params=shard_params(state.params, mesh))
            step = jax.jit(make_clip_train_step(
                model, norm_embed=True, use_ssl=use_ssl,
                local_loss_mesh=mesh if local else None))
            return step(state, shard_batch(batch, mesh))

        sg, mg = run(local=False)
        sl, ml = run(local=True)
        np.testing.assert_allclose(float(ml["loss"]), float(mg["loss"]),
                                   rtol=1e-5)
        for pg, pl in zip(jax.tree.leaves(sg.params),
                          jax.tree.leaves(sl.params)):
            np.testing.assert_allclose(np.asarray(pl), np.asarray(pg),
                                       rtol=2e-4, atol=1e-6)


def test_wd_mask_excludes_norms_and_scalars():
    model = tiny_model()
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 2, 32, 32, 3)),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    mask = wd_mask(params)
    flat = {jax.tree_util.keystr(p): v
            for p, v in jax.tree_util.tree_flatten_with_path(mask)[0]}
    assert not flat["['logit_scale']"]
    key_bias = [k for k in flat if "bias" in k]
    assert key_bias and not any(flat[k] for k in key_bias)
    key_kernels = [k for k in flat if "kernel" in k]
    assert key_kernels and all(flat[k] for k in key_kernels)
    # reference recipe (main_pretrain.py:199-206) DOES decay ndim>=2
    # embedding matrices and the patch-embed conv kernel
    key_embed = [k for k in flat
                 if "embed" in k.lower() and "kernel" in k]
    assert all(flat[k] for k in key_embed)


def test_clamp_logit_scale():
    p = {"logit_scale": jnp.float32(9.0), "w": jnp.ones((2, 2))}
    out = clamp_logit_scale(p)
    assert abs(float(out["logit_scale"]) - 4.6052) < 1e-5
    np.testing.assert_array_equal(np.asarray(out["w"]), np.ones((2, 2)))


def test_grad_accumulation_multisteps():
    model = tiny_model()
    batch = make_batch(8)
    params = model.init(jax.random.key(0), batch["frames"][:1],
                        batch["text"][:1])["params"]
    tx = make_optimizer(1e-3, update_freq=2)
    state = TrainState.create(params, tx)
    step = jax.jit(make_clip_train_step(model, norm_embed=True))
    p0 = state.params["logit_scale"]
    state, _ = step(state, batch)          # accumulate only
    assert float(state.params["logit_scale"]) == float(p0)
    state, _ = step(state, batch)          # applies the update
    assert float(state.params["logit_scale"]) != float(p0)


def test_clip_hf_train_step_with_mask():
    """VideoCLIPHF (DistilBERT tower): masked text flows through the
    train step (reference CLIP_HF forward signature with attention mask)."""
    from lavila_tpu.models.distilbert import DistilBertModel
    from lavila_tpu.models.dual_encoder import VideoCLIPHF
    from lavila_tpu.models.timesformer import SpaceTimeTransformer

    model = VideoCLIPHF(
        vision_model=SpaceTimeTransformer(
            img_size=32, patch_size=16, embed_dim=32, depth=1, num_heads=4,
            num_frames=2, ln_pre=True, act="quick_gelu"),
        text_model=DistilBertModel(vocab_size=64, dim=32, num_heads=4,
                                   hidden_dim=64, n_layers=1,
                                   max_position_embeddings=16),
        vision_width=32, text_width=32, embed_dim=16)
    rng = np.random.default_rng(0)
    batch = {
        "frames": jnp.asarray(rng.normal(size=(8, 2, 32, 32, 3)),
                              jnp.float32),
        "text": jnp.asarray(rng.integers(1, 63, size=(8, 10)), jnp.int32),
        "mask": jnp.asarray(
            (np.arange(10)[None] < rng.integers(3, 10, size=(8, 1)))
            .astype(np.float32)),
    }
    params = model.init(jax.random.key(0), batch["frames"][:1],
                        batch["text"][:1], batch["mask"][:1])["params"]
    state = TrainState.create(params, make_optimizer(1e-3))
    step = jax.jit(make_clip_train_step(model, norm_embed=True))
    state, m0 = step(state, batch)
    state, m1 = step(state, batch)
    assert float(m1["loss"]) < float(m0["loss"])
