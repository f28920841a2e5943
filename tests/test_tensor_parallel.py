"""Tensor-parallel sharding rules: sharded execution == replicated."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lavila_tpu.models.gpt2 import GPT2Config, GPT2LMHead, augment_config
from lavila_tpu.parallel import create_mesh, param_sharding_rules
from lavila_tpu.parallel.mesh import shard_params


def test_gpt2_tp_sharded_forward_matches_replicated():
    cfg = augment_config(
        GPT2Config(vocab_size=64, n_positions=16, n_embd=64, n_layer=2,
                   n_head=4), cross_attn_freq=1, gated_xattn=False)
    m = GPT2LMHead(cfg)
    ids = jnp.array([[3, 9, 27, 5]])
    enc = jax.random.normal(jax.random.key(1), (1, 6, 64))
    params = m.init(jax.random.key(0), ids, enc)["params"]
    want, _ = m.apply({"params": params}, ids, enc)

    mesh = create_mesh(data=2, model=4)
    sharded = shard_params(params, mesh, rules=param_sharding_rules)
    # every leaf must be placeable (divisibility) and some must be sharded
    flat = jax.tree_util.tree_flatten_with_path(sharded)[0]
    n_sharded = sum(
        1 for p, l in flat
        if not l.sharding.is_fully_replicated)
    assert n_sharded > 0

    fwd = jax.jit(lambda p, i, e: m.apply({"params": p}, i, e)[0])
    got = fwd(sharded, ids, enc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_tp_train_step_matches_replicated_step():
    """Full train step (fwd + bwd + optimizer update) under a (data=4,
    model=2) TP mesh must match the replicated single-mesh step — the
    gradient/optimizer-side guarantee the forward-only test can't give.
    SGD keeps the comparison linear in the grads."""
    from lavila_tpu.models.dual_encoder import VideoCLIP
    from lavila_tpu.models.openai_clip import TextTransformer
    from lavila_tpu.models.timesformer import SpaceTimeTransformer
    from lavila_tpu.train.optim import make_optimizer
    from lavila_tpu.train.step import TrainState, make_clip_train_step

    model = VideoCLIP(
        vision_model=SpaceTimeTransformer(
            img_size=32, patch_size=16, embed_dim=32, depth=1, num_heads=4,
            num_frames=2, ln_pre=True, act="quick_gelu"),
        text_model=TextTransformer(context_length=8, vocab_size=32, width=32,
                                   heads=4, layers=1, embed_dim=16),
        vision_width=32, embed_dim=16)
    rng = np.random.default_rng(0)
    batch = {
        "frames": jnp.array(
            rng.normal(size=(8, 2, 32, 32, 3)).astype(np.float32)),
        "text": jnp.array(rng.integers(1, 31, size=(8, 8)), jnp.int32),
    }
    params = model.init(jax.random.key(0), batch["frames"][:1],
                        batch["text"][:1])["params"]
    tx = make_optimizer(1e-2, use_sgd=True, momentum=0.0, weight_decay=0.0)
    step = jax.jit(make_clip_train_step(model, norm_embed=True))

    # replicated reference run
    s_ref = TrainState.create(params, tx)
    s_ref, m_ref = step(s_ref, batch)

    # TP run: params per megatron rules, batch over 'data'
    mesh = create_mesh(data=4, model=2)
    s_tp = TrainState.create(params, tx)
    s_tp = s_tp.replace(
        params=shard_params(s_tp.params, mesh, rules=param_sharding_rules))
    batch_tp = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch)
    s_tp, m_tp = step(s_tp, batch_tp)

    np.testing.assert_allclose(float(m_tp["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    flat_ref = jax.tree_util.tree_flatten_with_path(s_ref.params)[0]
    flat_tp = {jax.tree_util.keystr(p): l for p, l in
               jax.tree_util.tree_flatten_with_path(s_tp.params)[0]}
    for p, l_ref in flat_ref:
        l_tp = flat_tp[jax.tree_util.keystr(p)]
        np.testing.assert_allclose(
            np.asarray(l_tp), np.asarray(l_ref), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(p))
    # optimizer state must stay sharded like the params (ZeRO-1)
    n_sharded = sum(1 for l in jax.tree.leaves(s_tp.params)
                    if hasattr(l, "sharding")
                    and not l.sharding.is_fully_replicated)
    assert n_sharded > 0


def test_dual_encoder_tp_rules_cover_wide_layers():
    from lavila_tpu.models import build_model
    model = build_model("CLIP_OPENAI_TIMESFORMER_MINI")
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, 2, 64, 64, 3)),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {jax.tree_util.keystr(p): param_sharding_rules(p, l.shape)
             for p, l in flat}
    qkv = [k for k in specs if "qkv" in k and "kernel" in k]
    assert qkv and all(specs[k] == P(None, "model") for k in qkv)
    proj = [k for k in specs
            if k.endswith("['proj']['kernel']")]
    assert proj and all(specs[k] == P("model", None) for k in proj)
    # norms replicated
    ln = [k for k in specs if "norm" in k and "scale" in k]
    assert ln and all(specs[k] == P() for k in ln)


def test_pretrain_cli_mesh_model_shards_params(tmp_path):
    """`--mesh-model 2` through the ACTUAL pretrain CLI must apply the
    TP rules — previously the flag built the axis but silently left
    every param replicated (round-2 verdict #2)."""
    from cli.main_pretrain import main
    from lavila_tpu.config import PretrainConfig, parse_config

    cfg = parse_config(PretrainConfig, [
        "--dataset", "synthetic", "--model", "CLIP_OPENAI_TIMESFORMER_MINI",
        "--steps", "1", "--batch-size", "8", "--epochs", "1",
        "--clip-length", "4", "--output-dir", str(tmp_path / "run"),
        "--workers", "2", "--disable-amp",
        "--mesh-data", "4", "--mesh-model", "2"])
    state = main(cfg)
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    sharded = [jax.tree_util.keystr(p) for p, l in flat
               if not l.sharding.is_fully_replicated]
    assert any("qkv" in k for k in sharded), sharded[:5]


def test_gpt2_tp_kv_cache_decode_matches_replicated():
    """KV-cached decode (the narrator's production path, SURVEY §2.5's
    motivation for TP on GPT-2 XL) under TP-sharded params must produce
    the same step logits as replicated execution — prefill + several
    cached single-token steps through a (data=2, model=4) mesh."""
    from lavila_tpu.models.gpt2 import init_cache

    cfg = augment_config(
        GPT2Config(vocab_size=96, n_positions=24, n_embd=64, n_layer=2,
                   n_head=4), cross_attn_freq=1, gated_xattn=True)
    m = GPT2LMHead(cfg)
    ids = jnp.array([[5, 17, 3, 9]], jnp.int32)
    enc = jax.random.normal(jax.random.key(2), (1, 6, 64))
    params = m.init(jax.random.key(0), ids, enc)["params"]

    mesh = create_mesh(data=2, model=4)
    sharded = shard_params(params, mesh, rules=param_sharding_rules)

    def decode(p):
        """prefill 4 tokens, then 3 cached greedy steps; stack logits."""
        cache = init_cache(cfg, 1, 12, jnp.float32)
        cross_kv = m.apply({"params": p}, enc, method="precompute_cross_kv")
        logits, cache = m.apply({"params": p}, ids, cross_kv=cross_kv,
                                cache=cache, cache_index=0)
        outs = [logits[:, -1]]
        tok = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
        idx = ids.shape[1]
        for _ in range(3):
            logits, cache = m.apply({"params": p}, tok, cross_kv=cross_kv,
                                    cache=cache, cache_index=idx)
            outs.append(logits[:, -1])
            tok = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
            idx += 1
        return jnp.stack(outs, 1)

    want = decode(params)
    got = jax.jit(decode)(sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)
