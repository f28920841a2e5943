"""CoCa-style attention pooler (visual tokens → learned image queries).

Rebuild of the reference pooler (reference: lavila/models/coca.py:55-131):
multi-QUERY attention — K/V are a single shared head (to_kv projects the
context to 2×dim_head), queries have ``heads`` heads; bias-free pre-LN on
queries and context; max-subtracted softmax.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lavila_tpu.ops.basic import LayerNorm

Dtype = Any


def swiglu(x: jax.Array) -> jax.Array:
    """SwiGLU gate (Shazeer 2020): split the last dim, silu(gate) * x
    (reference coca.py:49-52)."""
    a, gate = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(gate) * a


class AttentionPooler(nn.Module):
    dim: int
    context_dim: Optional[int] = None
    dim_head: int = 64
    heads: int = 8
    norm_context: bool = False
    parallel_ff: bool = False   # optional SwiGLU FF branch (reference :84-88)
    ff_mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, queries: jax.Array, context: jax.Array) -> jax.Array:
        """queries (B, Nq, dim), context (B, S, context_dim) →
        (B, Nq, dim)."""
        B, Nq, _ = queries.shape
        H, d = self.heads, self.dim_head
        inner = H * d
        x = LayerNorm(use_bias=False, name="norm")(queries)
        if self.norm_context:
            context = LayerNorm(use_bias=False, name="context_norm")(context)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name="to_q")(x)
        q = q.reshape(B, Nq, H, d) * (d ** -0.5)
        kv = nn.Dense(2 * d, use_bias=False, dtype=self.dtype,
                      name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)       # single shared KV head
        sim = jnp.einsum("bqhd,bkd->bhqk", q, k,
                         preferred_element_type=jnp.float32)
        sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkd->bqhd", attn, v).reshape(B, Nq, inner)
        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                       name="to_out")(out)
        if self.parallel_ff:
            ff = nn.Dense(self.ff_mult * self.dim * 2, use_bias=False,
                          dtype=self.dtype, name="ff_in")(x)
            out = out + nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                                 name="ff_out")(swiglu(ff))
        return out
