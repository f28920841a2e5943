"""CLIP's ModifiedResNet image tower (flax).

Present in the reference for RN50/RN101 checkpoints
(reference: lavila/models/openai_model.py:21-165) though unused by the
released LaViLa models; included for zoo completeness. Differences from
torchvision ResNet kept: 3-conv stem with avgpool, anti-aliased strided
convs (avgpool before stride), attention-pool head.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BatchNorm(nn.Module):
    """Inference-style BatchNorm backed by imported running stats (CLIP
    RN checkpoints are used frozen/eval in the reference)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros(self.features))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones(self.features))
        inv = jax.lax.rsqrt(var.value + 1e-5) * scale
        return (x - mean.value) * inv + bias


class Bottleneck(nn.Module):
    inplanes: int
    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        expansion = 4
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = jax.nn.relu(BatchNorm(self.planes, name="bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = jax.nn.relu(BatchNorm(self.planes, name="bn2")(out))
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride, self.stride),
                              (self.stride, self.stride))
        out = nn.Conv(self.planes * expansion, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = BatchNorm(self.planes * expansion, name="bn3")(out)

        identity = x
        if self.stride > 1 or self.inplanes != self.planes * expansion:
            identity = nn.avg_pool(x, (self.stride, self.stride),
                                   (self.stride, self.stride)) \
                if self.stride > 1 else x
            identity = nn.Conv(self.planes * expansion, (1, 1),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(identity)
            identity = BatchNorm(self.planes * expansion,
                                 name="downsample_bn")(identity)
        return jax.nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    embed_dim: int
    num_heads: int
    output_dim: int
    spacial_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, Hh, Ww, C = x.shape
        toks = x.reshape(B, Hh * Ww, C)
        toks = jnp.concatenate([toks.mean(axis=1, keepdims=True), toks],
                               axis=1)
        pe = self.param("positional_embedding",
                        nn.initializers.normal(C ** -0.5),
                        (self.spacial_dim ** 2 + 1, C))
        toks = toks + pe[None].astype(toks.dtype)
        H = self.num_heads
        d = C // H
        q = nn.Dense(C, dtype=self.dtype, name="q_proj")(toks[:, :1])
        k = nn.Dense(C, dtype=self.dtype, name="k_proj")(toks)
        v = nn.Dense(C, dtype=self.dtype, name="v_proj")(toks)
        q = q.reshape(B, 1, H, d) * (d ** -0.5)
        k = k.reshape(B, -1, H, d)
        v = v.reshape(B, -1, H, d)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, 1, C)
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        name="c_proj")(o)[:, 0]


class ModifiedResNet(nn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)     # RN50
    output_dim: int = 1024
    heads: int = 32
    input_resolution: int = 224
    width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.width
        # 3-layer stem
        x = nn.Conv(w // 2, (3, 3), strides=2, padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x.astype(self.dtype))
        x = jax.nn.relu(BatchNorm(w // 2, name="bn1")(x))
        x = nn.Conv(w // 2, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(x)
        x = jax.nn.relu(BatchNorm(w // 2, name="bn2")(x))
        x = nn.Conv(w, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv3")(x)
        x = jax.nn.relu(BatchNorm(w, name="bn3")(x))
        x = nn.avg_pool(x, (2, 2), (2, 2))

        inplanes = w
        for stage, (blocks, planes, stride) in enumerate(zip(
                self.layers, (w, 2 * w, 4 * w, 8 * w), (1, 2, 2, 2))):
            for b in range(blocks):
                x = Bottleneck(inplanes, planes,
                               stride if b == 0 else 1, self.dtype,
                               name=f"layer{stage + 1}_{b}")(x)
                inplanes = planes * 4
        return AttentionPool2d(
            embed_dim=8 * w * 4, num_heads=self.heads,
            output_dim=self.output_dim,
            spacial_dim=self.input_resolution // 32, dtype=self.dtype,
            name="attnpool")(x)
