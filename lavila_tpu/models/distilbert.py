"""DistilBERT text encoder (slim faithful reimplementation).

The reference uses HF ``DistilBertModel('distilbert-base-uncased')`` as the
text tower of the CLIP_HF dual encoder
(reference: lavila/models/models.py:529-545). This is a from-scratch flax
version with the exact computation graph of DistilBERT so that HF weights
can be imported 1:1:

  embeddings: word_emb + learned pos_emb -> LayerNorm (eps 1e-12)
  6 × [ post-LN block: MHA -> add -> sa_layer_norm ->
        FFN(gelu) -> add -> output_layer_norm ]
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lavila_tpu.ops.attention import attention, padding_bias
from lavila_tpu.ops.basic import LayerNorm, normal_init

Dtype = Any


class BertSelfAttention(nn.Module):
    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias=None):
        B, L, D = x.shape
        H = self.num_heads
        d = D // H
        q = nn.Dense(D, dtype=self.dtype, name="q_lin")(x)
        k = nn.Dense(D, dtype=self.dtype, name="k_lin")(x)
        v = nn.Dense(D, dtype=self.dtype, name="v_lin")(x)
        out = attention(q.reshape(B, L, H, d), k.reshape(B, L, H, d),
                        v.reshape(B, L, H, d), mask=bias)
        return nn.Dense(D, dtype=self.dtype, name="out_lin")(
            out.reshape(B, L, D))


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    hidden_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias=None):
        sa = BertSelfAttention(self.dim, self.num_heads, self.dtype,
                               name="attention")(x, bias)
        x = LayerNorm(epsilon=1e-12, name="sa_layer_norm")(x + sa)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="ffn_lin1")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="ffn_lin2")(h)
        return LayerNorm(epsilon=1e-12, name="output_layer_norm")(x + h)


class DistilBertModel(nn.Module):
    vocab_size: int = 30522
    dim: int = 768
    num_heads: int = 12
    hidden_dim: int = 3072
    n_layers: int = 6
    max_position_embeddings: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None) -> jax.Array:
        B, L = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.dim,
                       embedding_init=normal_init(0.02),
                       name="word_embeddings")(input_ids)
        pos = nn.Embed(self.max_position_embeddings, self.dim,
                       embedding_init=normal_init(0.02),
                       name="position_embeddings")(jnp.arange(L)[None])
        x = LayerNorm(epsilon=1e-12, name="emb_layer_norm")(
            (tok + pos).astype(self.dtype))
        bias = None
        if attention_mask is not None:
            bias = padding_bias(attention_mask)
        for i in range(self.n_layers):
            x = TransformerBlock(self.dim, self.num_heads, self.hidden_dim,
                                 self.dtype, name=f"layer_{i}")(x, bias)
        return x  # last_hidden_state (B, L, D)
