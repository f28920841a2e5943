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
