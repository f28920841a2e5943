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


def _combine_stats(acc, m, l, acc2, m2, l2):
    """Merge two online-softmax partial results."""
    mm = jnp.maximum(m, m2)
    c1 = jnp.exp(m - mm)
    c2 = jnp.exp(m2 - mm)
    return acc * c1 + acc2 * c2, mm, l * c1 + l2 * c2


def _ring_stats(q: jax.Array, k: jax.Array, v: jax.Array, axis_name: str,
                scale: float, causal: bool = False):
    """Ring pass over KV shards; returns unnormalized online-softmax stats
    (acc, m, l) for the local queries. q/k/v: (B, H, L_local, d)."""
    L = q.shape[2]
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
        acc, m, l = _combine_stats(acc, m, l, acc_i, m_i, l_i)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, m, l, acc), None

    # the initial stats must be marked varying over the ring axis for a
    # type-stable scan carry (q may be replicated, e.g. the CLS query,
    # while k/v rotate and are varying)
    def varying(x):
        if axis_name in getattr(jax.typeof(x), "vma", ()):
            return x  # already varying (zeros derived from a local-shard q)
        return jax.lax.pcast(x, axis_name, to="varying")

    zeros_row = jnp.zeros_like(q[..., :1], dtype=jnp.float32)
    init = (k, v,
            varying(zeros_row + NEG_INF),
            varying(zeros_row),
            varying(jnp.zeros_like(q, dtype=jnp.float32)))
    (_, _, m, l, acc), _ = jax.lax.scan(step, init, jnp.arange(n))
    return acc, m, l


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   axis_name: str, *, causal: bool = False,
                   scale: Optional[float] = None) -> jax.Array:
    """q/k/v: LOCAL sequence shards (B, H, L_local, d). Returns the local
    output shard (B, H, L_local, d). Must run under shard_map with
    ``axis_name`` bound to the sequence-parallel mesh axis."""
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    acc, _, l = _ring_stats(q, k, v, axis_name, scale, causal=causal)
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def divided_time_ring(q: jax.Array, k: jax.Array, v: jax.Array,
                      num_frames: int, mesh, axis_name: str) -> jax.Array:
    """Sequence-parallel TEMPORAL divided attention for frame counts far
    beyond 16: the frame axis is sharded over ``axis_name`` and K/V
    shards rotate around the ring, so no chip ever holds the full
    (F, N) token set's keys. Semantics match
    :func:`lavila_tpu.ops.attention.divided_attention(axis='time')`
    exactly (reference timesformer.py:116-137): every patch token attends
    over the F tokens sharing its spatial position plus the CLS k/v, and
    the CLS query attends over the entire sequence.

    q/k/v: GLOBAL (B, 1 + F*N, H, d) token tensors (token 0 = CLS);
    returns the same shape. Wire it with
    ``lavila_tpu.ops.attention.set_ring_mesh(mesh, axis_name)``.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    B, L, H, d = q.shape
    F, N = num_frames, (L - 1) // num_frames
    assert 1 + F * N == L, (L, num_frames)
    n_shards = mesh.shape[axis_name]
    assert F % n_shards == 0, (
        f"num_frames={F} must divide over mesh axis '{axis_name}' "
        f"({n_shards} devices)")
    scale = d ** -0.5

    def split(t):
        return t[:, :1], t[:, 1:].reshape(B, F, N, H, d)

    (cq, qg), (ck, kg), (cv, vg) = split(q), split(k), split(v)

    def body(qg, kg, vg, cq, ck, cv):
        # qg/kg/vg: (B, F_local, N, H, d) frame shards; c*: (B,1,H,d) repl.
        Fl = qg.shape[1]

        def to_ring(t):  # → (B*N, H, F_local, d): one ring row per (b, n)
            return t.transpose(0, 2, 3, 1, 4).reshape(B * N, H, Fl, d)

        acc, m, l = _ring_stats(to_ring(qg), to_ring(kg), to_ring(vg),
                                axis_name, scale)
        # the CLS key/value is visible to every temporal group
        ckb = jnp.broadcast_to(ck.transpose(0, 2, 1, 3)[:, None],
                               (B, N, H, 1, d)).reshape(B * N, H, 1, d)
        cvb = jnp.broadcast_to(cv.transpose(0, 2, 1, 3)[:, None],
                               (B, N, H, 1, d)).reshape(B * N, H, 1, d)
        acc2, m2, l2 = _block_attn(to_ring(qg), ckb, cvb, scale, None)
        acc, m, l = _combine_stats(acc, m, l, acc2, m2, l2)
        patches = (acc / jnp.maximum(l, 1e-30)).astype(qg.dtype)
        patches = patches.reshape(B, N, H, Fl, d).transpose(0, 3, 1, 2, 4)

        # CLS query attends over ALL tokens: ring over the patch shards,
        # plus its own key/value
        cqr = cq.transpose(0, 2, 1, 3)                       # (B, H, 1, d)
        kl = kg.reshape(B, Fl * N, H, d).transpose(0, 2, 1, 3)
        vl = vg.reshape(B, Fl * N, H, d).transpose(0, 2, 1, 3)
        acc_c, m_c, l_c = _ring_stats(cqr, kl, vl, axis_name, scale)
        acc_s, m_s, l_s = _block_attn(cqr, ck.transpose(0, 2, 1, 3),
                                      cv.transpose(0, 2, 1, 3), scale, None)
        acc_c, m_c, l_c = _combine_stats(acc_c, m_c, l_c, acc_s, m_s, l_s)
        cls_out = (acc_c / jnp.maximum(l_c, 1e-30)).astype(qg.dtype)
        cls_out = cls_out.transpose(0, 2, 1, 3)              # (B, 1, H, d)
        # every device computed the same CLS result after the full ring;
        # pmean marks it replicated for the P() out_spec
        cls_out = jax.lax.pmean(cls_out, axis_name)
        return patches, cls_out

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis_name), P(None, axis_name),
                  P(None, axis_name), P(), P(), P()),
        out_specs=(P(None, axis_name), P()))
    patches, cls_out = fn(qg, kg, vg, cq, ck, cv)
    return jnp.concatenate([cls_out, patches.reshape(B, F * N, H, d)],
                           axis=1)
