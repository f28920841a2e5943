"""Numerics building blocks shared by every model tower.

TPU notes:
  * LayerNorm always reduces in float32 regardless of the compute dtype
    (bf16 activations lose too much precision in the variance estimate);
    mirrors the fp16-safe LayerNorm of the reference
    (reference: lavila/models/openai_model.py:168-174).
  * QuickGELU is the CLIP activation x * sigmoid(1.702 x)
    (reference: lavila/models/openai_model.py:177-179).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_exact(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def gelu_new(x: jax.Array) -> jax.Array:
    """GPT-2's tanh-approximated GELU (HF 'gelu_new')."""
    return jax.nn.gelu(x, approximate=True)


def squared_relu(x: jax.Array) -> jax.Array:
    """SqReLU from Primer (arXiv:2109.08668); used by the narrator's gated
    cross-attention MLP (reference: lavila/models/gpt2_gated.py:363-375)."""
    r = jax.nn.relu(x)
    return r * r


def head_segments(n_head: int, head_dim: int, dtype) -> jax.Array:
    """(D, H) 0/1 matrix with seg[i, h] = 1 iff i // head_dim == h.

    The head-SEGMENTED formulation: per-head dot products over a flat
    D = H·d axis become full-width MXU dots against this matrix instead
    of lane-slicing d-wide heads out of D (which pads every (H, d) tile
    to (32, 128) and costs VPU repacks — see ops/pallas/divided.py and
    models/gpt2.py's decode attention, which both build on this)."""
    D = n_head * head_dim
    return (jnp.arange(D)[:, None] // head_dim
            == jnp.arange(n_head)[None, :]).astype(dtype)


ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "quick_gelu": quick_gelu,
    "gelu": gelu_exact,
    "gelu_new": gelu_new,
    "relu": jax.nn.relu,
    "squared_relu": squared_relu,
}


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics and optional bias.

    ``use_bias=False`` with a zero ``beta`` buffer matches the CoCa
    bias-free LayerNorm (reference: lavila/models/coca.py:28-35).
    """

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, residual: Optional[jax.Array] = None,
                 return_sum: bool = True):
        """``residual=None`` → ``LN(x)``. With a residual, returns the
        pair ``(LN(x + residual), x + residual)`` — the transformer-block
        pattern — letting the Pallas path fuse the add into the norm;
        ``return_sum=False`` returns just ``LN(x + residual)`` and the
        fused path never materializes the sum."""
        dim = x.shape[-1]
        scale = (self.param("scale", nn.initializers.ones, (dim,),
                            jnp.float32) if self.use_scale else None)
        bias = (self.param("bias", nn.initializers.zeros, (dim,),
                           jnp.float32) if self.use_bias else None)

        # Pallas fused path (fwd + custom-VJP bwd, one HBM pass each
        # way, ops/pallas/layernorm.py), routed with the attention
        # kernels (LAVILA_ATTENTION / TPU default). Measured on the
        # TSF-B batch-16 step (v5e): the TEXT tower's (16, 77, 512) LNs
        # cost 6.2 ms/step under XLA (25 × 0.25 ms overhead-bound
        # convert_reduce fusions for 1.3 MB ops) and 0.2 ms fused — but
        # the VISION tower's 4-D LNs are FASTER under XLA (91.9 vs 93.8
        # ms/step all-fused): XLA folds the residual adds and consumers
        # into its stat fusions, which a custom-call boundary forfeits.
        # Hence: fused only for 3-D activations (the text/decoder
        # shape); 4-D tower tensors stay on the XLA path.
        from lavila_tpu.ops.attention import get_attention_backend
        # LAVILA_VISION_LN=fused additionally routes 4-D tower
        # activations through the kernel (via a free leading-axes
        # reshape) — an experiment knob for re-measuring the XLA-vs-
        # fused tradeoff on large-activation shapes (e.g. 336px towers).
        fuse_4d = (os.environ.get("LAVILA_VISION_LN", "") == "fused"
                   and x.ndim == 4)
        n_rows = 1
        for s in x.shape[:-1]:
            n_rows *= s
        if (get_attention_backend() == "pallas" and dim % 128 == 0
                and (x.ndim == 3 or fuse_4d) and n_rows >= 256
                and x.dtype in (jnp.bfloat16, jnp.float32)):
            from lavila_tpu.ops.pallas.layernorm import (fused_add_layernorm,
                                                         fused_layernorm)
            s3 = scale if scale is not None else jnp.ones((dim,), jnp.float32)
            b3 = bias if bias is not None else jnp.zeros((dim,), jnp.float32)
            interp = jax.default_backend() != "tpu"
            shape = x.shape
            x3 = x.reshape(-1, shape[-2], dim) if fuse_4d else x
            if residual is not None:
                r3 = residual.astype(x.dtype).reshape(x3.shape)
                if not return_sum:
                    from lavila_tpu.ops.pallas.layernorm import \
                        fused_add_layernorm_nosum
                    return fused_add_layernorm_nosum(
                        x3, r3, s3, b3, self.epsilon,
                        interp).reshape(shape)
                y, s = fused_add_layernorm(x3, r3, s3, b3, self.epsilon,
                                           interp)
                return y.reshape(shape), s.reshape(shape)
            return fused_layernorm(x3, s3, b3, self.epsilon,
                                   interp).reshape(shape)

        summed = None
        if residual is not None:
            x = summed = x + residual.astype(x.dtype)

        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        # One-pass fp32 variance (E[x²] − E[x]²): a single fused reduce
        # instead of the subtract-then-square two-pass — measured 2.8×
        # faster fwd+bwd on v5e (~4 ms/step over the TSF-B tower's 36
        # LNs). Matches flax's default use_fast_variance semantics.
        # (An MXU dot-reduce against a ones matrix wins in isolation
        # — 0.07 vs 0.14 ms/LN — but LOSES ~2.4 ms/step in the full
        # model, where the matmuls already saturate the MXU.)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        ms = jnp.mean(x * x, axis=-1, keepdims=True)
        var = jnp.maximum(ms - mean * mean, 0.0)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        if scale is not None:
            y = y * scale
        if bias is not None:
            y = y + bias
        y = y.astype(orig_dtype)
        if summed is not None and return_sum:
            return y, summed
        return y


def trunc_normal_init(std: float = 0.02):
    """timm-style truncated normal initializer (trunc at ±2σ)."""

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


def normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


class Mlp(nn.Module):
    """Transformer MLP: fc1 -> act -> fc2 (dropout handled by callers
    deterministically; the reference uses drop=0 in all released configs)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    act: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = ACTIVATIONS[self.act](x)
        x = nn.Dense(out_dim, dtype=self.dtype, name="fc2")(x)
        return x


def drop_path(x: jax.Array, rate: float, deterministic: bool, rng) -> jax.Array:
    """Stochastic depth on the batch dim (timm DropPath semantics)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x / keep * mask
