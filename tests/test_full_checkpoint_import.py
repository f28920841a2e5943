"""Full-checkpoint import: synthesize torch-layout lavila state dicts for
a whole dual encoder and a whole narrator, import them, and run the flax
models — catches any naming/shape drift between the importer and the
module trees."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lavila_tpu.models import import_torch as imp
from lavila_tpu.models.dual_encoder import VideoCLIP
from lavila_tpu.models.gpt2 import GPT2Config, GPT2LMHead, augment_config
from lavila_tpu.models.narrator import VCLM
from lavila_tpu.models.openai_clip import TextTransformer
from lavila_tpu.models.timesformer import SpaceTimeTransformer

rng = np.random.default_rng(0)


def r(*shape):
    return (rng.normal(size=shape) * 0.02).astype(np.float32)


def torch_timesformer_sd(prefix, depth=2, D=32, P=16, IMG=32, F=2):
    n = (IMG // P) ** 2
    sd = {
        f"{prefix}cls_token": r(1, 1, D),
        f"{prefix}pos_embed": r(1, n + 1, D),
        f"{prefix}temporal_embed": r(1, F, D),
        f"{prefix}patch_embed.proj.weight": r(D, 3, P, P),
        f"{prefix}norm.weight": np.ones(D, np.float32),
        f"{prefix}norm.bias": np.zeros(D, np.float32),
        f"{prefix}ln_pre.weight": np.ones(D, np.float32),
        f"{prefix}ln_pre.bias": np.zeros(D, np.float32),
    }
    for i in range(depth):
        b = f"{prefix}blocks.{i}"
        for attn in ("attn", "timeattn"):
            sd[f"{b}.{attn}.qkv.weight"] = r(3 * D, D)
            sd[f"{b}.{attn}.qkv.bias"] = np.zeros(3 * D, np.float32)
            sd[f"{b}.{attn}.proj.weight"] = r(D, D)
            sd[f"{b}.{attn}.proj.bias"] = np.zeros(D, np.float32)
        for ln in ("norm1", "norm2", "norm3"):
            sd[f"{b}.{ln}.weight"] = np.ones(D, np.float32)
            sd[f"{b}.{ln}.bias"] = np.zeros(D, np.float32)
        sd[f"{b}.mlp.fc1.weight"] = r(4 * D, D)
        sd[f"{b}.mlp.fc1.bias"] = np.zeros(4 * D, np.float32)
        sd[f"{b}.mlp.fc2.weight"] = r(D, 4 * D)
        sd[f"{b}.mlp.fc2.bias"] = np.zeros(D, np.float32)
    return sd


def torch_clip_text_sd(layers=2, W=32, V=64, ctx=16, E=16):
    sd = {
        "token_embedding.weight": r(V, W),
        "positional_embedding": r(ctx, W),
        "ln_final.weight": np.ones(W, np.float32),
        "ln_final.bias": np.zeros(W, np.float32),
        "text_projection": r(W, E),
        "logit_scale": np.float32(2.66),
    }
    for i in range(layers):
        b = f"transformer.resblocks.{i}"
        sd[f"{b}.attn.in_proj_weight"] = r(3 * W, W)
        sd[f"{b}.attn.in_proj_bias"] = np.zeros(3 * W, np.float32)
        sd[f"{b}.attn.out_proj.weight"] = r(W, W)
        sd[f"{b}.attn.out_proj.bias"] = np.zeros(W, np.float32)
        sd[f"{b}.mlp.c_fc.weight"] = r(4 * W, W)
        sd[f"{b}.mlp.c_fc.bias"] = np.zeros(4 * W, np.float32)
        sd[f"{b}.mlp.c_proj.weight"] = r(W, 4 * W)
        sd[f"{b}.mlp.c_proj.bias"] = np.zeros(W, np.float32)
        for ln in ("ln_1", "ln_2"):
            sd[f"{b}.{ln}.weight"] = np.ones(W, np.float32)
            sd[f"{b}.{ln}.bias"] = np.zeros(W, np.float32)
    return sd


def test_full_dual_encoder_checkpoint_import():
    sd = torch_timesformer_sd("visual.", F=4)
    sd.update(torch_clip_text_sd())
    sd["image_projection"] = r(32, 16)

    model = VideoCLIP(
        vision_model=SpaceTimeTransformer(
            img_size=32, patch_size=16, embed_dim=32, depth=2, num_heads=4,
            num_frames=2, ln_pre=True, act="quick_gelu"),
        text_model=TextTransformer(context_length=16, vocab_size=64,
                                   width=32, heads=4, layers=2,
                                   embed_dim=16),
        vision_width=32, embed_dim=16)
    # num_frames=2 model from a 4-frame checkpoint → temporal PE truncated
    params = imp.import_video_clip(sd, depth=2, text_layers=2, num_frames=2,
                                   strict=True)
    frames = jnp.ones((1, 2, 32, 32, 3))
    text = jnp.zeros((1, 16), jnp.int32).at[0, 3].set(63)
    out = model.apply({"params": params}, frames, text, norm_embed=True)
    assert out["image_embed"].shape == (1, 16)
    assert np.isfinite(np.asarray(out["image_embed"])).all()
    assert float(out["logit_scale"]) == pytest.approx(np.exp(2.66), rel=1e-5)
    # completeness guard: an unknown key (naming drift) must be flagged
    sd_typo = dict(sd)
    sd_typo["visual.blocks.0.attn.qkv_TYPO.weight"] = r(96, 32)
    with pytest.raises(KeyError, match="NOT consumed"):
        imp.import_video_clip(sd_typo, depth=2, text_layers=2, num_frames=2,
                              strict=True)
    # importer tree must be shape-compatible with a fresh init
    init = model.init(jax.random.key(0), frames, text)["params"]
    flat_i = jax.tree_util.tree_flatten_with_path(init)[0]
    flat_p = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(params)[0]}
    for k, v in flat_i:
        ks = jax.tree_util.keystr(k)
        assert ks in flat_p, f"missing {ks}"
        assert np.shape(flat_p[ks]) == np.shape(v), ks


def test_full_narrator_checkpoint_import():
    D = 32
    sd = torch_timesformer_sd("visual.", F=2, D=D)
    g = "text_decoder.transformer."
    n_layer = 2
    sd[f"{g}wte.weight"] = r(64, D)
    sd[f"{g}wpe.weight"] = r(32, D)
    sd[f"{g}ln_f.weight"] = np.ones(D, np.float32)
    sd[f"{g}ln_f.bias"] = np.zeros(D, np.float32)
    for i in range(n_layer):
        b = f"{g}h.{i}"
        for ln in ("ln_1", "ln_2", "ln_cross_attn", "ln_2_crossattention"):
            sd[f"{b}.{ln}.weight"] = np.ones(D, np.float32)
            sd[f"{b}.{ln}.bias"] = np.zeros(D, np.float32)
        sd[f"{b}.attn.c_attn.weight"] = r(D, 3 * D)
        sd[f"{b}.attn.c_attn.bias"] = np.zeros(3 * D, np.float32)
        sd[f"{b}.attn.c_proj.weight"] = r(D, D)
        sd[f"{b}.attn.c_proj.bias"] = np.zeros(D, np.float32)
        sd[f"{b}.mlp.c_fc.weight"] = r(D, 4 * D)
        sd[f"{b}.mlp.c_fc.bias"] = np.zeros(4 * D, np.float32)
        sd[f"{b}.mlp.c_proj.weight"] = r(4 * D, D)
        sd[f"{b}.mlp.c_proj.bias"] = np.zeros(D, np.float32)
        sd[f"{b}.crossattention.q_attn.weight"] = r(D, D)
        sd[f"{b}.crossattention.q_attn.bias"] = np.zeros(D, np.float32)
        sd[f"{b}.crossattention.c_attn.weight"] = r(D, 2 * D)
        sd[f"{b}.crossattention.c_attn.bias"] = np.zeros(2 * D, np.float32)
        sd[f"{b}.crossattention.c_proj.weight"] = r(D, D)
        sd[f"{b}.crossattention.c_proj.bias"] = np.zeros(D, np.float32)
        sd[f"{b}.mlp_crossattention.c_fc.weight"] = r(D, 4 * D)
        sd[f"{b}.mlp_crossattention.c_fc.bias"] = np.zeros(4 * D,
                                                           np.float32)
        sd[f"{b}.mlp_crossattention.c_proj.weight"] = r(4 * D, D)
        sd[f"{b}.mlp_crossattention.c_proj.bias"] = np.zeros(D, np.float32)
        sd[f"{b}.alpha_cattn"] = np.float32(0.0)
        sd[f"{b}.alpha_dense"] = np.float32(0.0)
    sd["img_queries"] = r(8, D)
    sd["img_attn_pool.norm.gamma"] = np.ones(D, np.float32)
    sd["img_attn_pool.context_norm.gamma"] = np.ones(D, np.float32)
    sd["img_attn_pool.to_q.weight"] = r(4 * 8, D)
    sd["img_attn_pool.to_kv.weight"] = r(2 * 8, D)
    sd["img_attn_pool.to_out.weight"] = r(D, 4 * 8)
    sd["img_attn_pool_norm.gamma"] = np.ones(D, np.float32)

    cfg = augment_config(GPT2Config(vocab_size=64, n_positions=32,
                                    n_embd=D, n_layer=2, n_head=4),
                         cross_attn_freq=1, gated_xattn=True)
    model = VCLM(
        vision_model=SpaceTimeTransformer(
            img_size=32, patch_size=16, embed_dim=D, depth=2, num_heads=4,
            num_frames=2, ln_pre=True, act="quick_gelu"),
        text_decoder=GPT2LMHead(cfg),
        vision_width=D, text_width=D, num_img_queries=8, dim_head=8,
        heads=4)
    params = imp.import_vclm(sd, vis_depth=2, gpt2_layers=2, num_frames=2,
                             strict=True)
    frames = jnp.ones((1, 2, 32, 32, 3))
    text = jnp.array([[1, 5, 9, 2, 0, 0]])
    out = model.apply({"params": params}, frames, text)
    assert out["logits"].shape == (1, 5, 64)
    init = model.init(jax.random.key(0), frames, text)["params"]
    flat_i = jax.tree_util.tree_flatten_with_path(init)[0]
    flat_p = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(params)[0]}
    for k, v in flat_i:
        ks = jax.tree_util.keystr(k)
        assert ks in flat_p, f"missing {ks}"
        assert np.shape(flat_p[ks]) == np.shape(v), ks
