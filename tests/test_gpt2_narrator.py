"""Gated GPT-2 and narrator tests — the KV-cache parity test is the key
correctness property: cached single-token decode must reproduce the full
re-forward logits exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lavila_tpu.models.gpt2 import (GPT2Config, GPT2LMHead, augment_config,
                                    init_cache)
from lavila_tpu.models.narrator import VCLM
from lavila_tpu.models.timesformer import SpaceTimeTransformer
from lavila_tpu.models import sampling as S

TINY = GPT2Config(vocab_size=64, n_positions=32, n_embd=32, n_layer=2,
                  n_head=4)
TINY_X = augment_config(TINY, cross_attn_freq=2, gated_xattn=True)


def test_gpt2_forward_shapes_and_causality():
    m = GPT2LMHead(TINY)
    ids = jnp.array([[1, 2, 3, 4, 5]])
    params = m.init(jax.random.key(0), ids)
    logits, _ = m.apply(params, ids)
    assert logits.shape == (1, 5, 64)
    # causality: changing a later token must not affect earlier logits
    ids2 = ids.at[0, 4].set(60)
    logits2, _ = m.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(logits[:, :4]),
                               np.asarray(logits2[:, :4]), atol=1e-5)


def test_gated_xattn_zero_init_matches_stock():
    """tanh(0)=0 gates → augmented model == stock GPT-2 at init
    (the property the reference relies on for warm-starting)."""
    ids = jnp.array([[5, 9, 3]])
    enc = jnp.ones((1, 7, 32))
    mx = GPT2LMHead(TINY_X)
    px = mx.init(jax.random.key(0), ids, enc)
    with_enc, _ = mx.apply(px, ids, enc)
    without_enc, _ = mx.apply(px, ids)
    np.testing.assert_allclose(np.asarray(with_enc),
                               np.asarray(without_enc), atol=1e-5)


def test_kv_cache_decode_matches_full_forward():
    """Greedy cached decode step-by-step == full prefix re-forward."""
    m = GPT2LMHead(TINY_X)
    ids = jnp.array([[7, 11, 13, 17, 19, 23]])
    enc = jax.random.normal(jax.random.key(1), (1, 5, 32))
    params = m.init(jax.random.key(0), ids, enc)

    full_logits, _ = m.apply(params, ids, enc)

    cross_kv = m.apply(params, enc, method="precompute_cross_kv")
    cache = init_cache(TINY_X, 1, 8)
    cached = []
    for i in range(6):
        logits, cache = m.apply(params, ids[:, i:i + 1], cross_kv=cross_kv,
                                cache=cache, cache_index=i)
        cached.append(np.asarray(logits[:, 0]))
    cached = np.stack(cached, axis=1)
    np.testing.assert_allclose(cached, np.asarray(full_logits), atol=2e-4,
                               rtol=1e-4)


def tiny_vclm():
    vision = SpaceTimeTransformer(img_size=32, patch_size=16, embed_dim=24,
                                  depth=1, num_heads=4, num_frames=2,
                                  ln_pre=True, act="quick_gelu")
    return VCLM(vision_model=vision, text_decoder=GPT2LMHead(TINY_X),
                vision_width=24, text_width=32, num_img_queries=8,
                dim_head=8, heads=4)


def test_vclm_teacher_forced_forward():
    m = tiny_vclm()
    frames = jnp.ones((2, 2, 32, 32, 3))
    text = jnp.array([[1, 4, 6, 8, 2, 0], [1, 5, 7, 2, 0, 0]])
    params = m.init(jax.random.key(0), frames, text)
    out = m.apply(params, frames, text)
    assert out["logits"].shape == (2, 5, 64)
    assert out["labels"].shape == (2, 5)
    np.testing.assert_array_equal(np.asarray(out["labels"]),
                                  np.asarray(text[:, 1:]))


def test_vclm_generate_scan():
    m = tiny_vclm()
    frames = jnp.ones((2, 2, 32, 32, 3))
    text = jnp.ones((2, 6), jnp.int32)
    params = m.init(jax.random.key(0), frames, text)
    image_tokens = m.apply(params, frames, method="encode_image")
    ids, ppl = m.apply(params, image_tokens, rng=jax.random.key(1),
                       bos_id=1, eos_id=2, max_text_length=10,
                       temperature=0.9, top_k=5,
                       num_return_sequences=2, method="generate")
    assert ids.shape == (4, 10)
    assert (np.asarray(ids[:, 0]) == 1).all()
    assert ppl.shape == (4,)
    assert np.isfinite(np.asarray(ppl)).all()


def test_vclm_generate_early_exit_prefix_parity():
    """Free decoding exits once every row sampled EOS (reference
    narrator.py:131-136). Tokens before the exit must be BIT-IDENTICAL
    to a run that never exits (same rng split chain), and positions
    after the exit are pad_id."""
    m = tiny_vclm()
    frames = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, 2, 32, 32, 3)), jnp.float32)
    text = jnp.ones((2, 6), jnp.int32)
    params = m.init(jax.random.key(0), frames, text)
    image_tokens = m.apply(params, frames, method="encode_image")
    gen = lambda eos: np.asarray(m.apply(  # noqa: E731
        params, image_tokens, rng=jax.random.key(5), bos_id=1, eos_id=eos,
        pad_id=0, max_text_length=24, temperature=1.5,
        method="generate")[0])
    # eos 999 is outside the vocab: never sampled -> full-length chain
    full = gen(999)
    assert full.shape == (2, 24)
    # pick a token every row of the full chain contains; treating it as
    # EOS makes the early exit deterministic and host-computable
    tok = next((t for t in range(1, 32)
                if all((full[b, 1:] == t).any() for b in range(2))), None)
    if tok is None:
        pytest.skip("no common token in the sampled chains")
    early = gen(tok)
    exit_step = max(int(np.argmax(full[b, 1:] == tok)) + 1
                    for b in range(2))
    np.testing.assert_array_equal(early[:, :exit_step + 1],
                                  full[:, :exit_step + 1])
    assert (early[:, exit_step + 1:] == 0).all()


def test_vclm_generate_early_exit_ppl_oracle():
    """Entropy-PPL from the early-exiting generate == a step-by-step
    recomputation over the generated chain with per-row EOS masking
    (post-EOS steps contribute 0, so exiting early cannot change it)."""
    from lavila_tpu.models.gpt2 import init_cache

    m = tiny_vclm()
    rng = np.random.default_rng(9)
    frames = jnp.asarray(rng.normal(size=(2, 2, 32, 32, 3)), jnp.float32)
    text = jnp.ones((2, 6), jnp.int32)
    params = m.init(jax.random.key(0), frames, text)
    toks = m.apply(params, frames, method="encode_image")
    L, eos = 16, 2
    ids, ppl = m.apply(params, toks, rng=jax.random.key(7), bos_id=1,
                       eos_id=eos, pad_id=0, max_text_length=L,
                       temperature=1.5, method="generate")
    ids = np.asarray(ids)

    # oracle: teacher-force the generated chain through decode_step,
    # accumulate entropy while the row hasn't yet sampled EOS
    cross_kv = m.apply(params, toks, method="prepare_decode")
    cache = init_cache(m.text_decoder.cfg, 2, L)
    nlls = np.zeros(2)
    counts = np.zeros(2)
    reached = np.zeros(2, bool)
    for i in range(L - 1):
        cur = jnp.asarray(ids[:, i:i + 1], jnp.int32)
        if reached.all():
            break
        logits, cache = m.apply(params, cur, cross_kv, cache, i,
                                method="decode_step")
        ent = np.asarray(S.entropy(logits.astype(jnp.float32)))
        nlls += ent * (~reached)
        counts += (~reached)
        # generate marks EOS from the SAMPLED token (ids[:, i+1]); rows
        # past the global exit hold pad, which never extends counts
        # because reached is already True for every row by then
        reached |= ids[:, i + 1] == eos
    expect = np.exp(nlls / np.maximum(counts, 1.0))
    np.testing.assert_allclose(np.asarray(ppl), expect, rtol=1e-5)


def test_vclm_teacher_forcing_ppl():
    m = tiny_vclm()
    frames = jnp.ones((1, 2, 32, 32, 3))
    target = jnp.array([[1, 9, 8, 7, 2, 0, 0, 0]])
    params = m.init(jax.random.key(0), frames, target)
    image_tokens = m.apply(params, frames, method="encode_image")
    ids, ppl = m.apply(params, image_tokens, rng=jax.random.key(1),
                       bos_id=1, eos_id=2, max_text_length=8,
                       target=target, teacher_forcing=True,
                       method="generate")
    # PPL should be bounded by vocab size for a random model
    assert 1.0 < float(ppl[0]) < 64.0 * 2


def test_warpers():
    logits = jnp.array([[1.0, 3.0, 2.0, -1.0]])
    k2 = S.apply_top_k(logits, 2)
    masked = np.asarray(k2)[0, [0, 3]]
    assert (masked < -1e30).all()  # fp32-min mask, not literal -inf
    assert np.asarray(k2)[0, 1] == 3.0
    # top-p keeps the smallest nucleus
    p = S.apply_top_p(jnp.array([[0.0, 10.0, 0.0, 0.0]]), 0.9)
    arr = np.asarray(p)[0]
    assert arr[1] == 10.0 and (arr[[0, 2, 3]] < -1e30).all()
    # entropy of uniform = log(V)
    ent = S.entropy(jnp.zeros((1, 16)))
    np.testing.assert_allclose(float(ent[0]), np.log(16), rtol=1e-5)


def test_top_p_bisection_matches_sorted_nucleus():
    """The sort-free nucleus filter must select exactly the same token
    set as the sorted-cumsum (HF) formulation."""
    import numpy as np
    from lavila_tpu.models import sampling as S
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(8, 1000)) * 4, jnp.float32)
    for p in (0.5, 0.9, 0.95, 0.999):
        got = np.asarray(S.apply_top_p(logits, p))              # bisection
        want = np.asarray(S.apply_top_p(logits, p,
                                        min_tokens_to_keep=2))  # sort path
        # compare kept masks; the sort path's floor of 2 only differs
        # when the nucleus would have size 1 — exclude those rows
        keep_got = got > S.NEG_INF / 2
        keep_want = want > S.NEG_INF / 2
        rows = keep_want.sum(-1) > 2
        np.testing.assert_array_equal(keep_got[rows], keep_want[rows],
                                      err_msg=f"p={p}")
    # dominant-token case: nucleus collapses to the argmax
    x = jnp.array([[0.0, 10.0, 0.0, 0.0]])
    kept = np.asarray(S.apply_top_p(x, 0.9)) > S.NEG_INF / 2
    np.testing.assert_array_equal(kept, [[False, True, False, False]])


def test_top_p_bisection_long_tailed_logits():
    """Documented behavior for long tails (logits spanning ~20 nats, the
    sampling.py docstring caveat): the bisection may keep a few extra
    near-tied TAIL tokens relative to the sorted formulation, but (a)
    never drops a nucleus token the sorted path keeps, and (b) the extra
    mass is negligible."""
    import numpy as np
    from lavila_tpu.models import sampling as S
    rng = np.random.default_rng(9)
    # head at ~0, long tail down to -20 nats, with deliberate near-ties
    logits = np.concatenate([
        rng.normal(size=(4, 16)) * 0.5,
        np.linspace(-5, -20, 984)[None].repeat(4, 0)
        + rng.normal(size=(4, 984)) * 1e-7], axis=1)
    logits = jnp.asarray(logits, jnp.float32)
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    for p in (0.9, 0.999):
        keep_bis = np.asarray(S.apply_top_p(logits, p)) > S.NEG_INF / 2
        keep_sort = np.asarray(
            S.apply_top_p(logits, p, min_tokens_to_keep=2)) > S.NEG_INF / 2
        # no nucleus token lost (ignore rows where sort's floor of 2 kicks in)
        rows = keep_sort.sum(-1) > 2
        assert not (keep_sort[rows] & ~keep_bis[rows]).any(), f"p={p}"
        # any extra kept tokens carry negligible probability mass
        extra_mass = (probs * (keep_bis & ~keep_sort))[rows].sum(-1)
        assert (extra_mass < 1e-9).all(), f"p={p}: {extra_mass}"
    # extreme p (1-p below fp32 cumsum noise): the set-equality guarantee
    # degrades to the mass guarantee — the bisection always retains >= p
    # mass up to fp32 rounding
    for p in (0.999999,):
        keep_bis = np.asarray(S.apply_top_p(logits, p)) > S.NEG_INF / 2
        mass = (probs * keep_bis).sum(-1)
        assert (mass >= p - 1e-5).all(), f"p={p}: {mass}"


def test_mulreduce_decode_matches_segmented():
    """The lane-filling-batch (B >= 128) dot-free decode attention must
    equal the MXU-segmented formulation bit-for-bit in math terms (same
    f32 products and per-head sums, different op shapes)."""
    from lavila_tpu.models.gpt2 import (_mulreduce_decode_attention,
                                        _segmented_decode_attention)
    rng = np.random.default_rng(3)
    # B = 64: below the routing threshold, so _segmented_decode_attention
    # really runs its dot path here (at B >= 128 it would dispatch to
    # _mulreduce itself and the comparison would be vacuous)
    B, K, H, d = 64, 6, 4, 16
    D = H * d
    q = jnp.asarray(rng.normal(size=(B, 1, D)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, 1, D)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, 1, D)), jnp.float32)
    for idx in (0, 3, K):
        a = _segmented_decode_attention(q, kc, vc, kn, vn, idx, H, d)
        b = _mulreduce_decode_attention(q, kc, vc, kn, vn, idx, H, d)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5, err_msg=str(idx))


def test_cross_attention_keeps_dot_form_at_lane_filling_batch():
    """Cross-attention (k_new=None) must stay on the segmented MXU dots
    at every batch, including B >= 128 where SELF-attention reroutes:
    measured worse under the mul-reduce at both b16 and b128 (the cross
    k/v slabs are read-only loop invariants, so the batch-minor layout
    tax that breaks the self-attention dots never applies — docs/PERF.md
    'Lane-filling batches'). Guard the routing, not just the math."""
    import lavila_tpu.models.gpt2 as G
    rng = np.random.default_rng(7)
    B, K, H, d = 128, 6, 4, 16
    D = H * d
    q = jnp.asarray(rng.normal(size=(B, 1, D)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)

    def must_not_be_called(*a, **k):  # pragma: no cover - fails the test
        raise AssertionError("cross-attention routed off the dot form")

    orig_mul = G._mulreduce_decode_attention
    G._mulreduce_decode_attention = must_not_be_called
    try:
        out = G._segmented_decode_attention(
            q, kc, vc, None, None, K, H, d, num_valid=K)
    finally:
        G._mulreduce_decode_attention = orig_mul
    assert out.shape == (B, 1, D)
    # and the same call WITH a new-token term does reroute at B >= 128
    kn = jnp.asarray(rng.normal(size=(B, 1, D)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, 1, D)), jnp.float32)
    routed = {}
    G._mulreduce_decode_attention = (
        lambda *a, **k: routed.setdefault("hit", True) and orig_mul(*a, **k))
    try:
        G._segmented_decode_attention(q, kc, vc, kn, vn, K, H, d)
    finally:
        G._mulreduce_decode_attention = orig_mul
    assert routed.get("hit"), "self-attention at B>=128 should reroute"
