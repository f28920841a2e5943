"""Ring attention: sequence-parallel attention over a mesh axis.

The reference has no sequence/context parallelism (SURVEY.md §2.5, §5) —
its sequence scaling is architectural (divided attention over ≤16
frames). This is the TPU-native upgrade path for frame counts far beyond
that: shard the token sequence over a mesh axis, keep Q local, and rotate
K/V shards around the ring with ``ppermute`` while maintaining an online
softmax — compute overlaps communication, the full sequence never
materializes on one chip (Liu et al. 2023, blockwise ring attention).

Run inside ``shard_map`` with the sequence axis sharded over
``axis_name``; blocks are combined in fp32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = jnp.finfo(jnp.float32).min


def _block_attn(q, k, v, scale, bias):
    """Partial attention stats for one KV block.
    q (B,H,Lq,d), k/v (B,H,Lk,d) → (acc (unnormalized, fp32), m, l)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias
    m = jnp.max(s, axis=-1, keepdims=True)
    m = jnp.maximum(m, NEG_INF / 2)  # rows with no visible keys stay finite
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return acc, m, l


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   axis_name: str, *, causal: bool = False,
                   scale: Optional[float] = None) -> jax.Array:
    """q/k/v: LOCAL sequence shards (B, H, L_local, d). Returns the local
    output shard (B, H, L_local, d). Must run under shard_map with
    ``axis_name`` bound to the sequence-parallel mesh axis."""
    d = q.shape[-1]
    L = q.shape[2]
    scale = d ** -0.5 if scale is None else scale
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]  # kv travels to the right

    def causal_bias(kv_owner):
        # global positions: q row i -> my*L + i ; kv col j -> kv_owner*L + j
        qi = my * L + jnp.arange(L)[:, None]
        kj = kv_owner * L + jnp.arange(L)[None, :]
        return jnp.where(kj <= qi, 0.0, NEG_INF)[None, None]

    def step(carry, i):
        k_cur, v_cur, m, l, acc = carry
        kv_owner = (my - i) % n  # whose shard we hold at step i
        bias = causal_bias(kv_owner) if causal else None
        acc_i, m_i, l_i = _block_attn(q, k_cur, v_cur, scale, bias)
        m_new = jnp.maximum(m, m_i)
        c_old = jnp.exp(m - m_new)
        c_new = jnp.exp(m_i - m_new)
        acc = acc * c_old + acc_i * c_new
        l = l * c_old + l_i * c_new
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, m_new, l, acc), None

    # derive the initial stats from q so shard_map marks them as varying
    # over the sequence axis (required for a type-stable scan carry)
    zeros_row = jnp.zeros_like(q[..., :1], dtype=jnp.float32)
    init = (k, v,
            zeros_row + NEG_INF,
            zeros_row,
            jnp.zeros_like(q, dtype=jnp.float32))
    (_, _, m, l, acc), _ = jax.lax.scan(step, init, jnp.arange(n))
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)
