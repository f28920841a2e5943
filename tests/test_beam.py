"""Beam decoder tests over a tiny VCLM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_beam_sample_nrs_runs_independent_pools(monkeypatch):
    """num_return_sequences=k must run k INDEPENDENT beam sets per
    sample (reference BeamSearchScorer(batch_size=batch*nrs),
    narrator.py:167-176) — not the top-k of one pool — and start all
    beams at score 0 (narrator.py:174)."""
    m, params, tokens = build()
    dec = BeamDecoder(m, params, bos_id=1, eos_id=2, max_text_length=8)
    calls = {}
    orig = BeamDecoder._run

    def spy(self, image_tokens, num_beams, select_fn, lp, nrs, init):
        calls["rows"] = image_tokens.shape[0]
        calls["nrs"] = nrs
        calls["init"] = np.array(init)
        return orig(self, image_tokens, num_beams, select_fn, lp, nrs,
                    init)

    monkeypatch.setattr(BeamDecoder, "_run", spy)
    seqs, scores = dec.beam_sample(tokens, rng=np.random.default_rng(0),
                                   num_beams=2, num_return_sequences=3,
                                   temperature=1.5, top_k=16)
    assert seqs.shape == (6, 8)          # batch=2, interleaved b0r0..b0r2
    assert np.isfinite(scores).all()
    assert calls["rows"] == 6            # 2 samples x 3 independent sets
    assert calls["nrs"] == 1             # one hypothesis per set
    np.testing.assert_array_equal(calls["init"], np.zeros(2, np.float32))


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


@pytest.mark.parametrize("seed", [3, 7, 11])
def test_beam_search_matches_hf_generate(seed):
    """Deterministic beam search reproduces HF GPT2LMHeadModel.generate
    (num_beams=3) exactly on shared weights."""
    import torch
    from transformers import GPT2Config as HFConfig
    from transformers import GPT2LMHeadModel
    from lavila_tpu.models import import_torch as imp
    from lavila_tpu.models.gpt2 import GPT2Config as JCfg, GPT2LMHead

    torch.manual_seed(seed)
    hf = GPT2LMHeadModel(HFConfig(
        vocab_size=48, n_positions=24, n_embd=32, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        bos_token_id=1, eos_token_id=2, pad_token_id=0)).eval()
    jcfg = JCfg(vocab_size=48, n_positions=24, n_embd=32, n_layer=4 // 2,
                n_head=4)
    m = GPT2LMHead(jcfg)
    params = {"params": imp.import_gpt2(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()}, 2)}

    class Adapter:
        class TD:
            cfg = jcfg
        text_decoder = TD()

        def apply(self, variables, *args, method=None):
            if method == "prepare_decode":
                return {}
            tokens, cross_kv, cache, i = args
            logits, new_cache = m.apply(variables, tokens, cache=cache,
                                        cache_index=i)
            return logits[:, -1], new_cache

    max_len = 12
    with torch.no_grad():
        hf_out = hf.generate(torch.tensor([[1]]), max_length=max_len,
                             num_beams=3, do_sample=False,
                             early_stopping=False,
                             num_return_sequences=1,
                             length_penalty=1.0)[0].tolist()
    dec = BeamDecoder(Adapter(), params, bos_id=1, eos_id=2, pad_id=0,
                      max_text_length=max_len)
    seqs, _ = dec.beam_search(np.zeros((1, 4, 32), np.float32),
                              num_beams=3)
    ours = [int(x) for x in seqs[0]]

    def cut(s):
        return s[:s.index(2) + 1] if 2 in s else s

    assert cut(hf_out) == cut(ours)
