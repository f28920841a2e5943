"""OpenAI-CLIP-style towers in flax.

Re-implements the behaviour of the reference CLIP modules
(reference: lavila/models/openai_model.py) the TPU way:

  * no NLD↔LND permutes — attention works on (B, L, D) directly;
  * QuickGELU activations, pre-LN residual blocks;
  * causal masking for the text tower built once as an additive bias;
  * EOT pooling = feature at argmax(token_ids) (EOT has the largest id in
    CLIP's vocab; reference openai_model.py:393-395).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lavila_tpu.ops.attention import attention, causal_mask
from lavila_tpu.ops.basic import LayerNorm, Mlp, normal_init

Dtype = Any


class MultiheadAttention(nn.Module):
    """Packed-QKV multi-head attention (torch nn.MultiheadAttention layout:
    one in_proj of size 3D and an out_proj)."""

    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        B, L, D = x.shape
        H = self.num_heads
        d = D // H
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = attention(q.reshape(B, L, H, d), k.reshape(B, L, H, d),
                        v.reshape(B, L, H, d), mask=mask)
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(
            out.reshape(B, L, D))


class ResidualAttentionBlock(nn.Module):
    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        x = x + MultiheadAttention(self.dim, self.num_heads, self.dtype,
                                   name="attn")(
            LayerNorm(name="ln_1")(x), mask)
        x = x + Mlp(4 * self.dim, act="quick_gelu", dtype=self.dtype,
                    name="mlp")(LayerNorm(name="ln_2")(x))
        return x


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    causal: bool = False
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mask = causal_mask(x.shape[1]) if self.causal else None
        block_cls = ResidualAttentionBlock
        if self.remat:
            block_cls = nn.remat(ResidualAttentionBlock)
        for i in range(self.layers):
            x = block_cls(self.width, self.heads, self.dtype,
                          name=f"resblocks_{i}")(x, mask)
        return x


class TextTransformer(nn.Module):
    """CLIP text tower: token embed + learned PE + causal transformer +
    ln_final + EOT pooling + projection."""

    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 256
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, text: jax.Array) -> jax.Array:
        tok = nn.Embed(self.vocab_size, self.width,
                       embedding_init=normal_init(0.02),
                       name="token_embedding")(text).astype(self.dtype)
        pe = self.param("positional_embedding", normal_init(0.01),
                        (self.context_length, self.width))
        x = tok + pe[None, : text.shape[1]].astype(self.dtype)
        x = Transformer(self.width, self.layers, self.heads, causal=True,
                        remat=self.remat, dtype=self.dtype,
                        name="transformer")(x)
        x = LayerNorm(name="ln_final")(x)
        # EOT token has the largest id in the sequence
        eot = jnp.argmax(text, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection", normal_init(self.width ** -0.5),
                          (self.width, self.embed_dim))
        return x @ proj.astype(x.dtype)


class VisionTransformer(nn.Module):
    """CLIP ViT (image tower). Input (B, H, W, C) channel-last.

    ``cls_at_last=False`` returns the patch-token sequence (no CLS), used
    by the narrator when conditioning on raw CLIP features
    (reference openai_model.py:264-272).
    """

    input_resolution: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, apply_project: bool = True,
                 cls_at_last: bool = True) -> jax.Array:
        B = x.shape[0]
        D = self.width
        x = nn.Conv(D, kernel_size=(self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    use_bias=False, dtype=self.dtype, name="conv1")(
            x.astype(self.dtype))
        x = x.reshape(B, -1, D)
        cls = self.param("class_embedding", normal_init(D ** -0.5), (D,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, D)), x], axis=1)
        pe = self.param("positional_embedding", normal_init(D ** -0.5),
                        ((self.input_resolution // self.patch_size) ** 2 + 1,
                         D))
        x = x + pe[None].astype(self.dtype)
        x = LayerNorm(name="ln_pre")(x)
        x = Transformer(D, self.layers, self.heads, dtype=self.dtype,
                        remat=self.remat, name="transformer")(x)
        # create all params on every trace so init/apply see the same tree
        ln_post = LayerNorm(name="ln_post")
        proj = self.param("proj", normal_init(D ** -0.5),
                          (D, self.output_dim))
        if not cls_at_last:
            _ = ln_post(x[:, :1])  # touch params; result unused
            return x[:, 1:]
        x = ln_post(x[:, 0])
        if apply_project:
            x = x @ proj.astype(x.dtype)
        return x
