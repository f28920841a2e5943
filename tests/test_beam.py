"""Beam decoder tests over a tiny VCLM."""

import jax
import jax.numpy as jnp
import numpy as np

from lavila_tpu.models.beam import BeamDecoder
from lavila_tpu.models.gpt2 import GPT2Config, GPT2LMHead, augment_config
from lavila_tpu.models.narrator import VCLM
from lavila_tpu.models.timesformer import SpaceTimeTransformer

CFG = augment_config(
    GPT2Config(vocab_size=32, n_positions=16, n_embd=32, n_layer=2,
               n_head=4), cross_attn_freq=1, gated_xattn=False)


def build():
    vision = SpaceTimeTransformer(img_size=32, patch_size=16, embed_dim=16,
                                  depth=1, num_heads=2, num_frames=2,
                                  ln_pre=True, act="quick_gelu")
    m = VCLM(vision_model=vision, text_decoder=GPT2LMHead(CFG),
             vision_width=16, text_width=32, num_img_queries=4,
             dim_head=8, heads=2)
    frames = jnp.ones((2, 2, 32, 32, 3))
    text = jnp.ones((2, 6), jnp.int32)
    params = m.init(jax.random.key(0), frames, text)
    tokens = m.apply(params, frames, method="encode_image")
    return m, params, tokens


def test_beam_search_deterministic():
    m, params, tokens = build()
    dec = BeamDecoder(m, params, bos_id=1, eos_id=2, max_text_length=8)
    seqs, scores = dec.beam_search(tokens, num_beams=3)
    assert seqs.shape == (2, 8)
    assert (seqs[:, 0] == 1).all()
    # deterministic: same inputs, same outputs
    seqs2, scores2 = dec.beam_search(tokens, num_beams=3)
    np.testing.assert_array_equal(seqs, seqs2)
    np.testing.assert_allclose(scores, scores2, rtol=1e-6)


def test_beam_sample_stochastic():
    m, params, tokens = build()
    dec = BeamDecoder(m, params, bos_id=1, eos_id=2, max_text_length=8)
    seqs, scores = dec.beam_sample(tokens,
                                   rng=np.random.default_rng(0),
                                   num_beams=3, temperature=1.2, top_k=10)
    assert seqs.shape == (2, 8)
    assert np.isfinite(scores).all()


def test_group_beam_search():
    m, params, tokens = build()
    dec = BeamDecoder(m, params, bos_id=1, eos_id=2, max_text_length=8)
    seqs, scores = dec.group_beam_search(tokens, num_beams=4,
                                         num_beam_groups=2,
                                         num_return_sequences=2)
    assert seqs.shape == (4, 8)
    assert (seqs[:, 0] == 1).all()


def test_beam_search_prefers_higher_likelihood():
    """Beam search score must be >= a random sampled sequence's score
    under the same model (sanity: it searches)."""
    m, params, tokens = build()
    dec = BeamDecoder(m, params, bos_id=1, eos_id=2, max_text_length=8)
    _, beam_scores = dec.beam_search(tokens, num_beams=4)
    _, sample_scores = dec.beam_sample(tokens,
                                       rng=np.random.default_rng(1),
                                       num_beams=1, temperature=2.0)
    assert beam_scores[0] >= sample_scores[0] - 1e-4
