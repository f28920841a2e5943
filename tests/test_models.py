"""Shape/behaviour tests for the model towers and dual-encoder wrappers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lavila_tpu.models import build_model, available_models
from lavila_tpu.models.timesformer import SpaceTimeTransformer
from lavila_tpu.models.openai_clip import TextTransformer
from lavila_tpu.models.distilbert import DistilBertModel


def tiny_timesformer(**kw):
    defaults = dict(img_size=32, patch_size=16, embed_dim=48, depth=2,
                    num_heads=4, num_frames=4, ln_pre=True, act="quick_gelu")
    defaults.update(kw)
    return SpaceTimeTransformer(**defaults)


def test_timesformer_shapes():
    m = tiny_timesformer()
    x = jnp.ones((2, 4, 32, 32, 3))
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 48)
    tokens = m.apply(params, x, cls_at_last=False)
    assert tokens.shape == (2, 1 + 4 * 4, 48)  # N = (32/16)^2 = 4 per frame


def test_timesformer_fewer_frames_than_max():
    m = tiny_timesformer(num_frames=8)
    x = jnp.ones((1, 4, 32, 32, 3))
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 48)


def test_timesformer_zero_init_time_attention_is_identity_at_init():
    """With zero-init time attention the block must start as a pure ViT:
    feeding two clips that differ only by frame shuffling must produce the
    same CLS feature distribution per frame... here we check the direct
    property: the time-attention output at init is exactly zero."""
    from lavila_tpu.models.timesformer import DividedAttentionBlock
    blk = DividedAttentionBlock(dim=48, num_heads=4, zero_init=True)
    cls = jax.random.normal(jax.random.key(1), (2, 1, 48))
    patches = jax.random.normal(jax.random.key(2), (2, 2, 4, 48))
    params = blk.init(jax.random.key(0), cls, patches, "time")
    cls_out, p_out = blk.apply(params, cls, patches, "time")
    np.testing.assert_allclose(np.asarray(cls_out), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_out), 0.0, atol=1e-6)


def test_text_transformer_eot_pooling():
    m = TextTransformer(context_length=16, vocab_size=64, width=32, heads=4,
                        layers=2, embed_dim=8)
    text = jnp.array([[1, 5, 9, 63, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]])
    params = m.init(jax.random.key(0), text)
    out = m.apply(params, text)
    assert out.shape == (1, 8)
    # tokens after EOT (argmax id) must not influence the pooled feature
    text2 = text.at[0, 10].set(7)
    out2 = m.apply(params, text2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_distilbert_padding_mask():
    m = DistilBertModel(vocab_size=100, dim=32, num_heads=4, hidden_dim=64,
                        n_layers=2, max_position_embeddings=32)
    ids = jnp.array([[2, 7, 9, 3, 0, 0, 0, 0]])
    mask = jnp.array([[1, 1, 1, 1, 0, 0, 0, 0]])
    params = m.init(jax.random.key(0), ids, mask)
    out = m.apply(params, ids, mask)
    # padded content must not change unmasked positions
    ids2 = ids.at[0, 6].set(55)
    out2 = m.apply(params, ids2, mask)
    np.testing.assert_allclose(np.asarray(out[:, :4]), np.asarray(out2[:, :4]),
                               atol=1e-5)


def test_zoo_lists_reference_parity_names():
    names = available_models()
    for expected in [
        "CLIP_OPENAI_TIMESFORMER_BASE",
        "CLIP_OPENAI_TIMESFORMER_LARGE_336PX",
        "CLIP_OPENAI_TIMESFORMER_BASE_DISTILBERT_BASE",
        "CLIP_HF_TIMESFORMER_DISTILBERT_BASE",
        "CLIP_OPENAI_VITB16",
    ]:
        assert expected in names


def test_dual_encoder_forward_tiny():
    from lavila_tpu.models.dual_encoder import VideoCLIP
    from lavila_tpu.models.openai_clip import TextTransformer
    model = VideoCLIP(
        vision_model=tiny_timesformer(),
        text_model=TextTransformer(context_length=12, vocab_size=64,
                                   width=32, heads=4, layers=2, embed_dim=16),
        vision_width=48, embed_dim=16)
    frames = jnp.ones((2, 4, 32, 32, 3))
    text = jnp.ones((2, 12), dtype=jnp.int32)
    params = model.init(jax.random.key(0), frames, text)
    out = model.apply(params, frames, text, norm_embed=True)
    assert out["image_embed"].shape == (2, 16)
    assert out["text_embed"].shape == (2, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_embed"]), axis=-1), 1.0,
        atol=1e-5)
    assert np.isclose(float(out["logit_scale"]), 1.0 / 0.07, rtol=1e-4)


def test_classifier_heads():
    from lavila_tpu.models.dual_encoder import (VideoClassifier,
                                                VideoClassifierMultiHead)
    vision = tiny_timesformer()
    clf = VideoClassifier(vision_model=vision, num_classes=10, dropout=0.5)
    x = jnp.ones((2, 4, 32, 32, 3))
    params = clf.init(jax.random.key(0), x)
    logits = clf.apply(params, x)
    assert logits.shape == (2, 10)
    multi = VideoClassifierMultiHead(vision_model=vision,
                                     num_classes_list=[7, 5, 3])
    params = multi.init(jax.random.key(0), x)
    outs = multi.apply(params, x)
    assert [o.shape for o in outs] == [(2, 7), (2, 5), (2, 3)]


def test_drop_path_stochastic_depth():
    m = tiny_timesformer(drop_path_rate=0.5)
    x = jnp.ones((4, 4, 32, 32, 3))
    params = m.init(jax.random.key(0), x)
    # eval mode: deterministic, no rng needed
    out_eval = m.apply(params, x)
    out_eval2 = m.apply(params, x)
    np.testing.assert_array_equal(np.asarray(out_eval),
                                  np.asarray(out_eval2))
    # train mode: stochastic across rng keys
    out_a = m.apply(params, x, train=True,
                    rngs={"drop_path": jax.random.key(1)})
    out_b = m.apply(params, x, train=True,
                    rngs={"drop_path": jax.random.key(2)})
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_build_model_threads_remat_policy():
    # zoo factories once swallowed remat_policy via **_unused, silently
    # measuring 'full' in every policy experiment — keep it threaded
    from lavila_tpu.models import build_model
    for name in ("CLIP_OPENAI_TIMESFORMER_MINI",
                 "CLIP_OPENAI_TIMESFORMER_BASE",
                 "CLIP_OPENAI_TIMESFORMER_LARGE_336PX",
                 "CLIP_OPENAI_TIMESFORMER_BASE_DISTILBERT_BASE",
                 "CLIP_HF_EGOVLP_DISTILBERT_BASE",
                 "CLIP_HF_TIMESFORMER_DISTILBERT_BASE",
                 "VCLM_OPENAI_TIMESFORMER_MINI_GPT2_MINI",
                 "VCLM_OPENAI_TIMESFORMER_BASE_GPT2"):
        m = build_model(name, num_frames=2, remat=True,
                        remat_policy="save_attn")
        assert m.vision_model.remat is True, name
        assert m.vision_model.remat_policy == "save_attn", name
    # grads flow under the checkpoint_name-based policies (full/dots
    # are exercised all over the suite; tiny geometry)
    x = jnp.ones((1, 2, 32, 32, 3))
    for pol in ("save_attn", "dots_attn"):
        m = tiny_timesformer(remat=True, remat_policy=pol)
        params = m.init(jax.random.key(0), x)
        g = jax.grad(lambda p: float(0) + (m.apply(p, x) ** 2).sum())(params)
        total = jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.abs(b).sum()), g, 0.0)
        assert np.isfinite(total) and total > 0, pol
    # an unknown policy must fail loudly with the options (config files
    # reach the model unvalidated), not as a KeyError from setup
    m = tiny_timesformer(remat=True, remat_policy="dots-attn")
    with pytest.raises(ValueError, match="dots_attn"):
        m.init(jax.random.key(0), x)
