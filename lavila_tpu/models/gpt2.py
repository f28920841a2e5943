"""Gated GPT-2: the narrator's text decoder, with a real KV-cache.

Re-implements the behaviour of the reference's forked HF GPT-2
(reference: lavila/models/gpt2_gated.py) as a flax module:

  * standard pre-LN GPT-2 blocks (gelu_new MLP, tied LM head, learned wpe);
  * visual cross-attention inserted every ``cross_attn_freq`` layers —
    each such block PREPENDS [LN → cross-attn (→ tanh(α_cattn) gate)] and
    [LN → SqReLU MLP (→ tanh(α_dense) gate)] before the regular
    self-attn/MLP (reference gpt2_gated.py:399-495). Zero-init scalar
    gates make the augmented model start exactly as stock GPT-2.

TPU-native decode: the reference re-forwards the whole prefix every step
(reference narrator.py:118-119); here decoding uses
  * a fixed-shape per-layer KV cache written with dynamic_update_slice,
  * cross-attention K/V precomputed ONCE per sequence
    (:meth:`GPT2LMHead.precompute_cross_kv`),
  * single-token steps driven by ``lax.scan`` in the narrator.

HF weight import is 1:1: Conv1D weights are (in, out) like flax Dense
kernels — no transposes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lavila_tpu.ops.basic import (ACTIVATIONS, LayerNorm,
                                  head_segments as _head_segments)

Dtype = Any

NEG_INF = jnp.finfo(jnp.float32).min


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    activation: str = "gelu_new"
    layer_norm_epsilon: float = 1e-5
    cross_attn_freq: int = 0       # 0 → stock GPT-2, k → x-attn on layers i%k==0
    gated_xattn: bool = True
    remat: bool = False

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head


PRESETS = {
    "gpt2": GPT2Config(),
    "gpt2-medium": GPT2Config(n_embd=1024, n_layer=24, n_head=16),
    "gpt2-large": GPT2Config(n_embd=1280, n_layer=36, n_head=20),
    "gpt2-xl": GPT2Config(n_embd=1600, n_layer=48, n_head=25),
}


def augment_config(cfg: GPT2Config, cross_attn_freq: int = 1,
                   gated_xattn: bool = True, remat: bool = False
                   ) -> GPT2Config:
    """Equivalent of the reference's augment_gpt2_config
    (reference gpt2_gated.py:84-89)."""
    return dataclasses.replace(cfg, cross_attn_freq=cross_attn_freq,
                               gated_xattn=gated_xattn, remat=remat)


def init_cache(cfg: GPT2Config, batch: int, max_len: int,
               dtype=jnp.float32) -> dict:
    """Fixed-shape self-attention KV cache, stored FLAT: (B, max_len, D).

    Folding (head, head_dim) into D keeps the lane dimension a multiple
    of 128: a (B, K, H=25, d=64) cache tiles each (H, d) slab to
    (32, 128) on TPU — ~2.5x the true bytes on every read, write and
    while-carry copy. Per-head math is recovered at compute time with a
    0/1 head-segment matrix (see ``_segmented_decode_attention``), never
    by slicing heads out of D.
    """
    shape = (batch, max_len, cfg.n_embd)
    return {
        f"layer_{i}": {"k": jnp.zeros(shape, dtype),
                       "v": jnp.zeros(shape, dtype)}
        for i in range(cfg.n_layer)
    }




def _mulreduce_decode_attention(q, k_cache, v_cache, k_new, v_new,
                                cache_index, n_head, head_dim,
                                num_valid=None):
    """Dot-free decode attention for lane-filling batches (B >= 128).

    Same math as ``_segmented_decode_attention`` but per-head scores are
    an elementwise product + reshape-reduce over head_dim and the
    output is a broadcast + sublane reduce over K — no batched dots, so
    XLA's batch-minor cache layout at large B serves every op directly
    and the scan carry stays in place. See the routing comment at the
    call site for the measurements."""
    B, _, D = q.shape
    K = k_cache.shape[1]
    H, d = n_head, head_dim
    dtype = q.dtype
    qf = q[:, 0]                                             # (B, D)
    prod = k_cache.astype(jnp.float32) * qf[:, None].astype(jnp.float32)
    scores_old = prod.reshape(B, K, H, d).sum(-1)            # (B, K, H)
    scale = 1.0 / jnp.sqrt(float(d))
    if num_valid is None:
        num_valid = cache_index
    valid = (jnp.arange(K) < num_valid)[None, :, None]
    scores_old = jnp.where(valid, scores_old * scale, NEG_INF)
    score_new = (qf.astype(jnp.float32)
                 * k_new[:, 0].astype(jnp.float32)).reshape(B, H, d).sum(-1)
    scores = jnp.concatenate(
        [scores_old, score_new[:, None, :] * scale], axis=1)  # (B, K+1, H)
    probs = jax.nn.softmax(scores, axis=1).astype(dtype)
    probs_exp = jnp.broadcast_to(probs[:, :K, :, None],
                                 (B, K, H, d)).reshape(B, K, D)
    out = jnp.sum(probs_exp * v_cache.astype(dtype), axis=1)
    out = out + (jnp.broadcast_to(probs[:, K, :, None],
                                  (B, H, d)).reshape(B, D)
                 * v_new[:, 0].astype(dtype))
    return out[:, None]                                      # (B, 1, D)


def _decode_kernel_forced() -> int:
    """LAVILA_DECODE_KERNEL: 'force' → 1 (use the fused kernel even at
    B < 16), 'off' → -1 (never), else 0 (measured default: B >= 16)."""
    import os
    v = os.environ.get("LAVILA_DECODE_KERNEL", "")
    return 1 if v == "force" else (-1 if v == "off" else 0)


def _segmented_decode_attention(q, k_cache, v_cache, k_new, v_new,
                                cache_index, n_head, head_dim,
                                num_valid=None):
    """Single-query attention over a FLAT (B, K, D) KV cache.

    TPU-native formulation of the decode step (q has L == 1):

      * Per-head dot products are full-width MXU dots against the 0/1
        head-segment matrix — the same segmented trick as the divided
        Pallas kernels (ops/pallas/divided.py). Lane-slicing 64-dim
        heads out of D would force every (H, d) tile to pad to
        (32, 128) and show up as thousands of tiny per-head slice DMAs
        (measured 3.7 ms/step of the XL decode before this rewrite).
      * Attention reads the PRE-update cache plus the fresh (k, v) of
        the current token as a separate term, so the caller's
        dynamic_update_slice into the cache is a pure write with no
        read-after-write hazard — XLA then updates the scan carry in
        place instead of defensively copying the whole cache every
        layer every step (80 full-cache copies/step in the XL trace).

    ``num_valid``: number of valid cache positions (defaults to
    ``cache_index``); positions >= it are masked. ``k_new``/``v_new``
    may be None (pure cross-attention: every position is already in the
    "cache" and there is no current-token term). Returns (B, 1, D).
    """
    B, _, D = q.shape
    K = k_cache.shape[1]
    dtype = q.dtype
    if k_new is not None and _decode_kernel_forced() != -1 \
            and (B >= 16 or _decode_kernel_forced() == 1):
        # Fused decode kernel for big decoders at ANY batch >= 16: the
        # b16 XL trace showed the XLA dots' cache reads staged through
        # VMEM in batch-quarter slices at ~125 GB/s; the kernel streams
        # each row's k/v slabs sequentially. Measured (XL, 77 tok):
        # b16 29.4 vs 27.4 narr/s, b64 68.6 vs 52.3, b128 82.7 vs 75.7.
        # Gated on D >= 1280 (gpt2-large/xl): base (D=768) measured
        # SLOWER under the kernel (405 vs 429 narr/s b128) — its slabs
        # are too small to amortize the per-row unrolled dots. A
        # degenerate one-row block (prime B, or slabs past the VMEM
        # budget) also routes away (ADVICE r3). LAVILA_DECODE_KERNEL=
        # force extends to B < 16, =off disables — this is the ONLY
        # kernel dispatch, so 'off' really means the XLA forms below.
        from lavila_tpu.ops.attention import get_attention_backend
        from lavila_tpu.ops.pallas.decode_attention import (
            decode_attention_fused, effective_block_b)
        if (D >= 1280 and get_attention_backend() == "pallas"
                and effective_block_b(
                    B, K, D, jnp.dtype(dtype).itemsize) >= 2):
            nv = cache_index if num_valid is None else num_valid
            return decode_attention_fused(
                q, k_cache, v_cache, k_new, v_new, nv, n_head, head_dim,
                interpret=jax.default_backend() != "tpu")
    if k_new is not None and B >= 128:
        # Lane-filling batches flip XLA's cache layout to batch-minor,
        # which breaks the batched dots below (defensive full-cache
        # copies reappear — measured 664 ms of the 2.09 s XL b128
        # decode) but makes the per-head reduce a cheap SUBLANE reduce.
        # Measured: XL b128 59.6 → 76.1 narr/s, base b128 350 → 438;
        # at B < 128 (D lane-minor) the same form is 2-4x SLOWER than
        # the dots — in-lane segment reduces, the layout tax the
        # segmented formulation exists to avoid.
        return _mulreduce_decode_attention(
            q, k_cache, v_cache, k_new, v_new, cache_index,
            n_head, head_dim, num_valid)
    seg = _head_segments(n_head, head_dim, dtype)            # (D, H)
    qf = q[:, 0]                                             # (B, D)
    q_seg = qf[:, :, None] * seg[None]                       # (B, D, H)
    scores_old = jnp.einsum("bkD,bDh->bkh", k_cache.astype(dtype), q_seg,
                            preferred_element_type=jnp.float32)
    scale = 1.0 / jnp.sqrt(float(head_dim))
    if num_valid is None:
        num_valid = cache_index
    valid = (jnp.arange(K) < num_valid)[None, :, None]
    scores_old = jnp.where(valid, scores_old * scale, NEG_INF)
    if k_new is not None:
        score_new = jnp.einsum("bD,Dh->bh",
                               qf * k_new[:, 0].astype(dtype), seg,
                               preferred_element_type=jnp.float32)
        scores = jnp.concatenate(
            [scores_old, score_new[:, None, :] * scale],
            axis=1)                                          # (B, K+1, H)
    else:
        scores = scores_old
    probs = jnp.asarray(
        jax.nn.softmax(scores, axis=1), dtype=dtype)
    probs_exp = jnp.einsum("bkh,Dh->bkD", probs[:, :K], seg)  # (B, K, D)
    out = jnp.sum(probs_exp * v_cache.astype(dtype), axis=1)
    if k_new is not None:
        out = out + (jnp.einsum("bh,Dh->bD", probs[:, K], seg)
                     * v_new[:, 0].astype(dtype))
    return out[:, None]                                       # (B, 1, D)


class SelfAttention(nn.Module):
    """GPT-2 self-attention (packed c_attn) with optional KV cache."""

    cfg: GPT2Config
    dtype: Dtype = jnp.float32

    def setup(self):
        D = self.cfg.n_embd
        self.c_attn = nn.Dense(3 * D, dtype=self.dtype, name="c_attn")
        self.c_proj = nn.Dense(D, dtype=self.dtype, name="c_proj")

    def __call__(self, x, *, cache=None, cache_index=None):
        cfg = self.cfg
        B, L, D = x.shape
        H, d = cfg.n_head, cfg.head_dim
        q, k, v = jnp.split(self.c_attn(x), 3, axis=-1)   # (B, L, D) each

        if cache is not None:
            # write the new keys/values at cache_index — a pure store
            # (the L == 1 attention below reads the PRE-update cache),
            # so XLA can alias the scan-carry buffer in place.
            k_cache = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (0, cache_index, 0))
            v_cache = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (0, cache_index, 0))
            new_cache = {"k": k_cache, "v": v_cache}
            if L == 1:
                out = _segmented_decode_attention(
                    q, cache["k"], cache["v"], k, v, cache_index, H, d)
            else:
                # prefill-with-cache (multi-token): the generic per-head
                # path over the post-update cache; runs once per
                # sequence, never inside the decode scan.
                max_len = k_cache.shape[1]
                qh = q.reshape(B, L, H, d)
                kh = k_cache.astype(q.dtype).reshape(B, max_len, H, d)
                vh = v_cache.astype(q.dtype).reshape(B, max_len, H, d)
                pos = cache_index + jnp.arange(L)[:, None]      # (L, 1)
                keys = jnp.arange(max_len)[None, :]             # (1, max)
                bias = jnp.where(keys <= pos, 0.0, NEG_INF)[None, None]
                scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                                    preferred_element_type=jnp.float32)
                scores = scores / jnp.sqrt(float(d)) + bias
                probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
                out = jnp.einsum("bhqk,bkhd->bqhd", probs,
                                 vh).reshape(B, L, D)
        else:
            qh = q.reshape(B, L, H, d)
            kh = k.reshape(B, L, H, d)
            vh = v.reshape(B, L, H, d)
            bias = jnp.where(
                jnp.arange(L)[None, :] <= jnp.arange(L)[:, None],
                0.0, NEG_INF)[None, None]
            scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                                preferred_element_type=jnp.float32)
            scores = scores / jnp.sqrt(float(d)) + bias
            probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(B, L, D)
            new_cache = None

        return self.c_proj(out), new_cache


class CrossAttention(nn.Module):
    """GPT-2-style cross-attention: q from hidden states, packed k/v from
    the (visual) encoder states (reference gpt2_gated.py:149-360)."""

    cfg: GPT2Config
    dtype: Dtype = jnp.float32

    def setup(self):
        D = self.cfg.n_embd
        self.q_attn = nn.Dense(D, dtype=self.dtype, name="q_attn")
        self.c_attn = nn.Dense(2 * D, dtype=self.dtype, name="c_attn")
        self.c_proj = nn.Dense(D, dtype=self.dtype, name="c_proj")

    def compute_kv(self, encoder_states):
        """Flat (B, S, D) K/V — same layout rationale as ``init_cache``."""
        k, v = jnp.split(self.c_attn(encoder_states), 2, axis=-1)
        return k, v

    def __call__(self, x, encoder_states=None, cross_kv=None):
        cfg = self.cfg
        B, L, D = x.shape
        H, d = cfg.n_head, cfg.head_dim
        q = self.q_attn(x)                                   # (B, L, D)
        k, v = cross_kv if cross_kv is not None else self.compute_kv(
            encoder_states)
        if L == 1:
            # decode step: segmented single-query attention over the
            # flat precomputed K/V (every encoder position valid).
            out = _segmented_decode_attention(
                q, k, v, None, None, cache_index=None,
                n_head=H, head_dim=d, num_valid=k.shape[1])
            return self.c_proj(out)
        qh = q.reshape(B, L, H, d)
        kh = k.astype(q.dtype).reshape(B, -1, H, d)
        vh = v.astype(q.dtype).reshape(B, -1, H, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(float(d))
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(B, L, D)
        return self.c_proj(out)


class GPT2Mlp(nn.Module):
    cfg: GPT2Config
    act: str
    dtype: Dtype = jnp.float32

    def setup(self):
        self.c_fc = nn.Dense(4 * self.cfg.n_embd, dtype=self.dtype,
                             name="c_fc")
        self.c_proj = nn.Dense(self.cfg.n_embd, dtype=self.dtype,
                               name="c_proj")

    def __call__(self, x):
        return self.c_proj(ACTIVATIONS[self.act](self.c_fc(x)))


class GPT2Block(nn.Module):
    cfg: GPT2Config
    layer_idx: int
    dtype: Dtype = jnp.float32

    @property
    def has_cross(self) -> bool:
        return (self.cfg.cross_attn_freq > 0
                and self.layer_idx % self.cfg.cross_attn_freq == 0)

    def setup(self):
        cfg = self.cfg
        eps = cfg.layer_norm_epsilon
        if self.has_cross:
            self.ln_cross_attn = LayerNorm(epsilon=eps, name="ln_cross_attn")
            self.crossattention = CrossAttention(cfg, self.dtype,
                                                 name="crossattention")
            self.ln_2_crossattention = LayerNorm(
                epsilon=eps, name="ln_2_crossattention")
            self.mlp_crossattention = GPT2Mlp(cfg, "squared_relu",
                                              self.dtype,
                                              name="mlp_crossattention")
            if cfg.gated_xattn:
                self.alpha_cattn = self.param("alpha_cattn",
                                              nn.initializers.zeros, ())
                self.alpha_dense = self.param("alpha_dense",
                                              nn.initializers.zeros, ())
        self.ln_1 = LayerNorm(epsilon=eps, name="ln_1")
        self.attn = SelfAttention(cfg, self.dtype, name="attn")
        self.ln_2 = LayerNorm(epsilon=eps, name="ln_2")
        self.mlp = GPT2Mlp(cfg, cfg.activation, self.dtype, name="mlp")

    def __call__(self, x, *, encoder_states=None, cross_kv=None,
                 cache=None, cache_index=None):
        cfg = self.cfg
        if self.has_cross and (encoder_states is not None
                               or cross_kv is not None):
            att = self.crossattention(self.ln_cross_attn(x), encoder_states,
                                      cross_kv)
            if cfg.gated_xattn:
                att = jnp.tanh(self.alpha_cattn).astype(x.dtype) * att
            x = x + att
            ff = self.mlp_crossattention(self.ln_2_crossattention(x))
            if cfg.gated_xattn:
                ff = jnp.tanh(self.alpha_dense).astype(x.dtype) * ff
            x = x + ff

        att, new_cache = self.attn(self.ln_1(x), cache=cache,
                                   cache_index=cache_index)
        x = x + att
        x = x + self.mlp(self.ln_2(x))
        return x, new_cache


class GPT2LMHead(nn.Module):
    """GPT-2 with tied LM head and optional gated visual cross-attention.

    Training / prefill: ``__call__(ids, encoder_states)`` → logits.
    Decode: precompute ``cross_kv`` once (method='precompute_cross_kv'),
    then call with ``cache``/``cache_index`` feeding one token at a time.
    """

    cfg: GPT2Config
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.wte = nn.Embed(cfg.vocab_size, cfg.n_embd,
                            embedding_init=nn.initializers.normal(0.02),
                            name="wte")
        self.wpe = nn.Embed(cfg.n_positions, cfg.n_embd,
                            embedding_init=nn.initializers.normal(0.01),
                            name="wpe")
        self.blocks = [
            GPT2Block(cfg, i, self.dtype, name=f"h_{i}")
            for i in range(cfg.n_layer)
        ]
        self.ln_f = LayerNorm(epsilon=cfg.layer_norm_epsilon, name="ln_f")

    def __call__(self, input_ids, encoder_states=None, cross_kv=None,
                 cache=None, cache_index=None):
        """Returns (logits, new_cache). ``cross_kv``: dict keyed
        'layer_{i}' for cross layers."""
        B, L = input_ids.shape
        pos_start = 0 if cache_index is None else cache_index
        positions = pos_start + jnp.arange(L)[None]
        x = (self.wte(input_ids) + self.wpe(positions)).astype(self.dtype)

        new_cache = {} if cache is not None else None

        def run_block(blk, x, layer_cache, layer_ckv, enc):
            return blk(x, encoder_states=enc, cross_kv=layer_ckv,
                       cache=layer_cache, cache_index=cache_index)

        if self.cfg.remat and cache is None:
            run_block = nn.remat(run_block)

        for i, blk in enumerate(self.blocks):
            layer_cache = cache[f"layer_{i}"] if cache is not None else None
            layer_ckv = None
            if cross_kv is not None:
                layer_ckv = cross_kv.get(f"layer_{i}")
            x, c = run_block(blk, x, layer_cache, layer_ckv, encoder_states)
            if new_cache is not None:
                new_cache[f"layer_{i}"] = c
        x = self.ln_f(x)
        logits = x @ self.wte.embedding.T.astype(x.dtype)
        return logits, new_cache

    def precompute_cross_kv(self, encoder_states) -> dict:
        """K/V of every cross-attention layer, computed once per decode."""
        out = {}
        for i, blk in enumerate(self.blocks):
            if blk.has_cross:
                out[f"layer_{i}"] = blk.crossattention.compute_kv(
                    encoder_states)
        return out
