"""Freeze predicates: frozen leaves get zero updates, others train."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lavila_tpu.train.freeze import (build_freeze_predicate,
                                     freeze_by_predicate, lm_parts,
                                     spatial_parts, temporal_parts)


def test_predicates():
    assert temporal_parts("vision_model/blocks_0/timeattn/qkv/kernel")
    assert temporal_parts("vision_model/temporal_embed")
    assert not temporal_parts("vision_model/blocks_0/attn/qkv/kernel")
    assert spatial_parts("vision_model/blocks_0/attn/qkv/kernel")
    assert not spatial_parts("vision_model/blocks_0/norm3/scale")
    assert not spatial_parts("text_model/ln_final/scale")
    assert lm_parts("text_decoder/h_0/attn/c_attn/kernel")
    assert not lm_parts("text_decoder/h_0/crossattention/q_attn/kernel")
    assert not lm_parts("text_decoder/h_0/alpha_cattn")


def test_freeze_by_predicate_zeroes_updates():
    params = {"vision_model": {"blocks_0": {
        "attn": {"qkv": {"kernel": jnp.ones((4, 4))}},
        "timeattn": {"qkv": {"kernel": jnp.ones((4, 4))}},
    }}, "logit_scale": jnp.float32(2.0)}
    pred = build_freeze_predicate(freeze_temperature=True,
                                  timesformer_freeze_space=True)
    tx = freeze_by_predicate(optax.sgd(1.0), pred)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    flat = {jax.tree_util.keystr(p): v for p, v in
            jax.tree_util.tree_flatten_with_path(updates)[0]}
    spatial = [v for k, v in flat.items() if "attn/" in k.replace(
        "timeattn", "") and "timeattn" not in k]
    assert np.all(np.asarray(
        flat["['vision_model']['blocks_0']['attn']['qkv']['kernel']"]) == 0)
    assert np.all(np.asarray(
        flat["['vision_model']['blocks_0']['timeattn']['qkv']['kernel']"])
        != 0)
    assert float(flat["['logit_scale']"]) == 0.0
