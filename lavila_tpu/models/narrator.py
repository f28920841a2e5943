"""VCLM narrator: vision tower → attention-pooled image queries → gated
GPT-2 decoder, with TPU-native cached decoding.

Re-implements the reference's visually-conditioned LM
(reference: lavila/models/narrator.py:31-389) with one deliberate
performance departure: the reference re-forwards the ENTIRE prefix at
every decoding step with no KV reuse (reference narrator.py:118-119);
here decode is a ``lax.scan`` over single-token steps with a fixed-shape
self-attention KV cache and cross-attention K/V precomputed once per
sequence — same sampling semantics, O(L) instead of O(L²) decoder passes.

Decoding strategies (parity with the reference surface):
  * ``generate``        — multinomial sampling with temperature/top-k/top-p
                          and NLL/entropy PPL tracking (narrator.py:106-147)
  * ``beam_sample``     — stochastic beam search (narrator.py:149-241)
  * ``group_beam_search`` — diverse beam groups (narrator.py:243-366)
The beam variants run the cached step under jit with host-side beam
bookkeeping (the scorer state is tiny; the model pass dominates).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lavila_tpu.models import sampling as S
from lavila_tpu.models.coca import AttentionPooler
from lavila_tpu.models.gpt2 import GPT2LMHead, init_cache
from lavila_tpu.ops.basic import LayerNorm, normal_init

Dtype = Any


class VCLM(nn.Module):
    vision_model: nn.Module
    text_decoder: GPT2LMHead
    vision_width: int
    text_width: int
    num_img_queries: int = 256
    dim_head: int = 64
    heads: int = 8
    dtype: Dtype = jnp.float32

    def setup(self):
        self.visual = self.vision_model
        self.img_queries = self.param(
            "img_queries", normal_init(self.text_width ** -0.5),
            (self.num_img_queries, self.text_width))
        self.img_attn_pool = AttentionPooler(
            dim=self.text_width, context_dim=self.vision_width,
            dim_head=self.dim_head, heads=self.heads, norm_context=True,
            dtype=self.dtype, name="img_attn_pool")
        self.img_attn_pool_norm = LayerNorm(use_bias=False,
                                            name="img_attn_pool_norm")

    def encode_image(self, frames: jax.Array) -> jax.Array:
        """(B, T, H, W, C) → (B, num_img_queries, text_width)."""
        tokens = self.visual(frames, cls_at_last=False)  # (B, L, Dv)
        q = jnp.broadcast_to(
            self.img_queries[None].astype(tokens.dtype),
            (tokens.shape[0],) + self.img_queries.shape)
        q = self.img_attn_pool(q, tokens)
        return self.img_attn_pool_norm(q)

    def __call__(self, frames: jax.Array, text: jax.Array) -> dict:
        """Teacher-forced caption loss inputs: text shifted by one
        (reference narrator.py:89-104)."""
        inp, labels = text[:, :-1], text[:, 1:]
        image_tokens = self.encode_image(frames)
        logits, _ = self.text_decoder(inp, encoder_states=image_tokens)
        return {"logits": logits, "labels": labels}

    # ----- cached decoding --------------------------------------------
    def prepare_decode(self, image_tokens: jax.Array) -> dict:
        """Cross-attention K/V, computed once per sequence."""
        return self.text_decoder.precompute_cross_kv(image_tokens)

    def decode_step(self, tokens: jax.Array, cross_kv: dict, cache: dict,
                    cache_index) -> tuple:
        """One cached decoder step. tokens (B, 1) → (logits (B, V), cache)."""
        logits, new_cache = self.text_decoder(
            tokens, cross_kv=cross_kv, cache=cache, cache_index=cache_index)
        return logits[:, -1], new_cache

    def generate(self, image_tokens: jax.Array, *, rng: jax.Array,
                 bos_id: int, eos_id: int, pad_id: int = 0,
                 max_text_length: int = 77, temperature: float = 1.0,
                 top_k: Optional[int] = None, top_p: Optional[float] = None,
                 num_return_sequences: int = 1,
                 target: Optional[jax.Array] = None,
                 teacher_forcing: bool = False) -> tuple:
        """Multinomial sampling with PPL tracking. Returns
        (generated_ids (B*nrs, max_text_length), ppl (B*nrs,)).

        With ``target``: per-step NLL against the target (teacher PPL);
        without: entropy of the predictive distribution — both masked
        after EOS, matching the reference bookkeeping
        (reference narrator.py:115-136).

        Free decoding EARLY-EXITS once every row has sampled EOS
        (reference narrator.py:131-136 breaks the decode loop the same
        way): a ``lax.while_loop`` replaces the fixed-length scan, so a
        batch of typical ~10-15-token Ego4D narrations pays ~max-length
        steps instead of the full 77. Tokens produced before the exit
        are bit-identical to the fixed-length run (the rng split chain
        is the same sequence, just stopped sooner); positions after the
        exit are ``pad_id``. With ``target`` the loop always runs full
        length (teacher-PPL bookkeeping needs every position)."""
        image_tokens = jnp.repeat(image_tokens, num_return_sequences, axis=0)
        B = image_tokens.shape[0]
        cross_kv = self.prepare_decode(image_tokens)
        cache = init_cache(self.text_decoder.cfg, B, max_text_length,
                           dtype=self.dtype)

        bos = jnp.full((B,), bos_id, jnp.int32)
        L = max_text_length
        early_exit = target is None
        out0 = jnp.full((B, L), pad_id, jnp.int32).at[:, 0].set(bos_id)

        def cond(carry):
            i, reached = carry[0], carry[6]
            live = i < L - 1
            if early_exit:
                live = live & ~jnp.all(reached)
            return live

        def body(carry):
            i, cache, cur, key, nlls, counts, reached, out = carry
            logits, cache = self.decode_step(cur[:, None], cross_kv, cache,
                                             i)
            logits = logits.astype(jnp.float32)
            if target is not None:
                tgt = target[:, i + 1]
                logz = jax.nn.logsumexp(logits, axis=-1)
                picked = jnp.take_along_axis(logits, tgt[:, None],
                                             axis=-1)[:, 0]
                valid = (tgt != pad_id).astype(jnp.float32)
                nlls = nlls + (logz - picked) * valid
                counts = counts + valid
            else:
                live = (~reached).astype(jnp.float32)
                nlls = nlls + S.entropy(logits) * live
                counts = counts + live
            warped = S.warp_logits(logits, temperature, top_k, top_p)
            key, sub = jax.random.split(key)
            nxt = S.sample_token(sub, warped)
            reached = reached | (nxt == eos_id)
            if teacher_forcing and target is not None:
                feed = target[:, i + 1].astype(jnp.int32)
            else:
                feed = nxt
            out = jax.lax.dynamic_update_slice(
                out, nxt[:, None], (jnp.int32(0), i + 1))
            return (i + 1, cache, feed, key, nlls, counts, reached, out)

        init = (jnp.int32(0), cache, bos, rng,
                jnp.zeros((B,), jnp.float32), jnp.zeros((B,), jnp.float32),
                jnp.zeros((B,), bool), out0)
        carry = jax.lax.while_loop(cond, body, init)
        nlls, counts, generated = carry[4], carry[5], carry[7]
        ppl = jnp.exp(nlls / jnp.maximum(counts, 1.0))
        return generated, ppl
