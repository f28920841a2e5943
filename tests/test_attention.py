"""Divided space-time attention vs a naive per-group numpy reference.

The naive reference replicates the semantics documented in
reference timesformer.py:107-144: CLS attends globally; each patch token
attends within its group plus the CLS key/value.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lavila_tpu.ops.attention import attention, causal_mask, divided_attention


def naive_softmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def naive_group_attention(q, k, v, F, axis):
    """Loop-based divided attention. q,k,v: (B, 1+F*N, H, d)."""
    B, L, H, d = q.shape
    N = (L - 1) // F
    scale = d ** -0.5
    out = np.zeros_like(q)
    for b in range(B):
        for h in range(H):
            qs, ks, vs = q[b, :, h], k[b, :, h], v[b, :, h]
            # CLS attends to everything
            s = naive_softmax(scale * qs[0] @ ks.T)
            out[b, 0, h] = s @ vs
            patches = np.arange(1, L)
            grid = patches.reshape(F, N)  # frame-major token layout
            groups = grid.T if axis == "time" else grid
            for g in groups:
                idx = np.concatenate([[0], g])  # CLS k/v prepended
                kk, vv = ks[idx], vs[idx]
                s = naive_softmax(scale * qs[g] @ kk.T)
                out[b, g, h] = s @ vv
    return out


@pytest.mark.parametrize("backend", ["xla", "grouped"])
@pytest.mark.parametrize("axis", ["time", "space"])
def test_divided_attention_matches_naive(axis, backend):
    # 'xla' uses the unrolled VPU temporal formulation (F<=8, default);
    # 'grouped' forces the transposed-matmul path — both oracle-checked
    from lavila_tpu.ops import attention as A
    rng = np.random.default_rng(0)
    B, F, N, H, d = 2, 3, 4, 2, 8
    L = 1 + F * N
    q = rng.normal(size=(B, L, H, d)).astype(np.float32)
    k = rng.normal(size=(B, L, H, d)).astype(np.float32)
    v = rng.normal(size=(B, L, H, d)).astype(np.float32)
    old = A.get_attention_backend()
    A.set_attention_backend(backend)
    try:
        got = np.asarray(divided_attention(jnp.array(q), jnp.array(k),
                                           jnp.array(v), F, axis))
    finally:
        A.set_attention_backend(old)
    want = naive_group_attention(q, k, v, F, axis)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_attention_causal_mask():
    rng = np.random.default_rng(1)
    B, L, H, d = 1, 5, 2, 4
    q = rng.normal(size=(B, L, H, d)).astype(np.float32)
    k = rng.normal(size=(B, L, H, d)).astype(np.float32)
    v = rng.normal(size=(B, L, H, d)).astype(np.float32)
    out = np.asarray(attention(jnp.array(q), jnp.array(k), jnp.array(v),
                               mask=causal_mask(L)))
    # position 0 can only see itself → its output equals v[0] exactly
    np.testing.assert_allclose(out[0, 0], v[0, 0], atol=1e-6)
    # changing future keys/values must not affect earlier positions
    k2, v2 = k.copy(), v.copy()
    k2[:, -1] += 10.0
    v2[:, -1] += 10.0
    out2 = np.asarray(attention(jnp.array(q), jnp.array(k2), jnp.array(v2),
                                mask=causal_mask(L)))
    np.testing.assert_allclose(out[:, :-1], out2[:, :-1], atol=1e-6)


def test_cls_row_attention_custom_vjp_matches_autodiff():
    """The CLS row's hand-written VJP (mul-reduce form, bf16-safe temps)
    vs jax autodiff of an einsum reference of the same math."""
    import jax
    from lavila_tpu.ops.attention import _cls_row_attention

    rng = np.random.default_rng(7)
    B, F, N, H, d = 2, 3, 5, 2, 8
    shapes = [(B, 1, H, d)] * 3 + [(B, F, N, H, d)] * 2
    args = [jnp.asarray(rng.normal(size=s), jnp.float32) for s in shapes]

    def ref(cls_q, cls_k, cls_v, kp, vp):
        scale = d ** -0.5
        k = jnp.concatenate([cls_k, kp.reshape(B, F * N, H, d)], axis=1)
        v = jnp.concatenate([cls_v, vp.reshape(B, F * N, H, d)], axis=1)
        s = jnp.einsum("bqhd,bkhd->bhqk", cls_q * scale, k)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    got = _cls_row_attention(*args)
    want = ref(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) ** 2)

    g_got = jax.grad(loss(_cls_row_attention), argnums=tuple(range(5)))(*args)
    g_want = jax.grad(loss(ref), argnums=tuple(range(5)))(*args)
    for a, b, name in zip(g_got, g_want,
                          ["cls_q", "cls_k", "cls_v", "kp", "vp"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4, err_msg=name)


def test_cls_row_attention_bf16_tolerance():
    """Bound the deliberate bf16 precision tradeoff (products round to
    bf16 before the fp32 sum-reduce, see _cls_row_attention docstring):
    bf16 inputs through the production path must stay within a bf16-grid
    tolerance of the all-fp32 reference, forward AND backward."""
    import jax
    from lavila_tpu.ops.attention import _cls_row_attention

    rng = np.random.default_rng(11)
    B, F, N, H, d = 2, 4, 6, 4, 16
    shapes = [(B, 1, H, d)] * 3 + [(B, F, N, H, d)] * 2
    args32 = [jnp.asarray(rng.normal(size=s), jnp.float32) for s in shapes]
    args16 = [a.astype(jnp.bfloat16) for a in args32]

    def ref(cls_q, cls_k, cls_v, kp, vp):
        scale = d ** -0.5
        k = jnp.concatenate([cls_k, kp.reshape(B, F * N, H, d)], axis=1)
        v = jnp.concatenate([cls_v, vp.reshape(B, F * N, H, d)], axis=1)
        s = jnp.einsum("bqhd,bkhd->bhqk", cls_q * scale, k)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    got = _cls_row_attention(*args16).astype(jnp.float32)
    want = ref(*args32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a).astype(jnp.float32) ** 2)

    g16 = jax.grad(loss(_cls_row_attention),
                   argnums=tuple(range(5)))(*args16)
    g32 = jax.grad(loss(ref), argnums=tuple(range(5)))(*args32)
    for a, b, name in zip(g16, g32,
                          ["cls_q", "cls_k", "cls_v", "kp", "vp"]):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b), atol=6e-2, rtol=6e-2,
            err_msg=name)


def test_pallas_backend_large_n_spatial_routes_to_flash():
    """336px towers have N=576 patches/frame — beyond the whole-frame
    spatial kernel's VMEM envelope (N<=256). Under the pallas backend
    large-N spatial runs the key-tiled flash kernel (_spatial_flash;
    interpret mode on CPU) and must match the grouped oracle."""
    from lavila_tpu.ops import attention as A

    rng = np.random.default_rng(13)
    B, F, N, H, dh = 1, 2, 260, 2, 8
    shape = (B, 1 + F * N, H, dh)
    q, k, v = (jnp.asarray(rng.normal(size=shape), jnp.float32)
               for _ in range(3))
    old = A.get_attention_backend()
    A.set_attention_backend("grouped")
    try:
        want = A.divided_attention(q, k, v, F, "space")
    finally:
        A.set_attention_backend(old)
    A.set_attention_backend("pallas")
    try:
        got = A.divided_attention(q, k, v, F, "space")
    finally:
        A.set_attention_backend(old)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_spatial_flash_n576_value_and_grads_match_grouped():
    """The real 336px geometry (N=576 → 577 keys with CLS): forward AND
    input gradients through the flash route must match the grouped XLA
    formulation — 336px is a pretrain config in the reference
    (docs/PRETRAIN.md:24-35), so the backward is load-bearing."""
    import jax
    from lavila_tpu.ops import attention as A

    rng = np.random.default_rng(29)
    B, F, N, H, dh = 1, 2, 576, 4, 16
    shape = (B, 1 + F * N, H, dh)
    q, k, v = (jnp.asarray(rng.normal(size=shape), jnp.float32)
               for _ in range(3))
    cot = jnp.asarray(rng.normal(size=shape), jnp.float32)

    def run(backend):
        old = A.get_attention_backend()
        A.set_attention_backend(backend)
        try:
            def f(q, k, v):
                out = A.divided_attention(q, k, v, F, "space")
                return jnp.sum(out * cot)
            val, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v)
        finally:
            A.set_attention_backend(old)
        return val, grads

    want_val, want_g = run("grouped")
    got_val, got_g = run("pallas")
    np.testing.assert_allclose(float(got_val), float(want_val), rtol=1e-4)
    for a, b, name in zip(got_g, want_g, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3, err_msg=name)


def test_spatial_flash_block_knobs_preserve_semantics(monkeypatch):
    """LAVILA_FLASH_BLOCK_{Q,K,BH} re-tile the flash spatial kernel for
    on-hardware sweeps; any legal tiling must be semantics-preserving.
    Exercises the whole-frame q block + whole-row key block (nq=nk=1)."""
    from lavila_tpu.ops import attention as A

    rng = np.random.default_rng(31)
    B, F, N, H, dh = 1, 2, 576, 4, 16
    shape = (B, 1 + F * N, H, dh)
    q, k, v = (jnp.asarray(rng.normal(size=shape), jnp.float32)
               for _ in range(3))

    def run():
        old = A.get_attention_backend()
        A.set_attention_backend("pallas")
        try:
            return A.divided_attention(q, k, v, F, "space")
        finally:
            A.set_attention_backend(old)

    monkeypatch.setenv("LAVILA_SPATIAL_BIG", "flash")  # pin the flash route
    monkeypatch.delenv("LAVILA_FLASH_BLOCK_Q", raising=False)
    monkeypatch.delenv("LAVILA_FLASH_BLOCK_K", raising=False)
    monkeypatch.delenv("LAVILA_FLASH_BLOCK_BH", raising=False)
    want = run()
    monkeypatch.setenv("LAVILA_FLASH_BLOCK_Q", "576")
    monkeypatch.setenv("LAVILA_FLASH_BLOCK_K", "584")
    monkeypatch.setenv("LAVILA_FLASH_BLOCK_BH", "4")
    got = run()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_spatial_big_headpair_fold_matches_grouped():
    """dh=64 geometries fold head PAIRS per program (block minor dim must
    be a multiple of 128 on Mosaic) — the in-kernel per-head lane-slice
    path. H=2, dh=64 exercises hf=2 in interpret mode; fwd + grads must
    match the grouped oracle."""
    import jax
    from lavila_tpu.ops import attention as A
    from lavila_tpu.ops.pallas.divided import _space_big_hf

    assert _space_big_hf(128, 2) == 2  # the fold this test covers
    rng = np.random.default_rng(37)
    B, F, N, H, dh = 1, 2, 576, 2, 64
    shape = (B, 1 + F * N, H, dh)
    q, k, v = (jnp.asarray(rng.normal(size=shape), jnp.float32)
               for _ in range(3))
    cot = jnp.asarray(rng.normal(size=shape), jnp.float32)

    def run(backend):
        old = A.get_attention_backend()
        A.set_attention_backend(backend)
        try:
            def f(q, k, v):
                out = A.divided_attention(q, k, v, F, "space")
                return jnp.sum(out * cot)
            return jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v)
        finally:
            A.set_attention_backend(old)

    want_val, want_g = run("grouped")
    got_val, got_g = run("pallas")
    np.testing.assert_allclose(float(got_val), float(want_val), rtol=1e-4)
    for a, b, name in zip(got_g, want_g, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3, err_msg=name)


def test_time_attention_phase_override_matches_pallas(monkeypatch):
    """F > 8 now routes the temporal phase to XLA grouped by default
    (the fused kernel's F>8 tiling measured 18x its HBM floor);
    LAVILA_TIME_ATTENTION=pallas forces the fused kernel back. Both
    routes must agree on values and grads."""
    import jax

    from lavila_tpu.ops import attention as A
    rng = np.random.default_rng(41)
    B, F, N, H, dh = 1, 9, 8, 2, 8  # F > 8: the long-clip branch
    shape = (B, 1 + F * N, H, dh)
    q, k, v = (jnp.asarray(rng.normal(size=shape), jnp.float32)
               for _ in range(3))
    cot = jnp.asarray(rng.normal(size=shape), jnp.float32)

    def run(time_pref):
        old = A.get_attention_backend()
        A.set_attention_backend("pallas")
        if time_pref:
            monkeypatch.setenv("LAVILA_TIME_ATTENTION", time_pref)
        else:
            monkeypatch.delenv("LAVILA_TIME_ATTENTION", raising=False)
        try:
            def f(q, k, v):
                out = A.divided_attention(q, k, v, F, "time")
                return jnp.sum(out * cot)
            return jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v)
        finally:
            A.set_attention_backend(old)
            monkeypatch.delenv("LAVILA_TIME_ATTENTION", raising=False)

    want_val, want_g = run("pallas")    # fused time kernel (forced)
    got_val, got_g = run("")            # default at F>8: XLA grouped
    got2_val, _ = run("grouped")        # explicit override, same path
    np.testing.assert_allclose(float(got2_val), float(got_val),
                               rtol=1e-6)
    np.testing.assert_allclose(float(got_val), float(want_val), rtol=1e-4)
    for a, b, name in zip(got_g, want_g, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3, err_msg=name)


def test_time_grouped_direct_matches_v1(monkeypatch):
    """The direct-einsum grouped temporal path (no hand permutes, CLS as
    a separate score column — the F > 8 default; docs/PERF.md "16
    frames") must match the classic transpose+concat grouped
    formulation (LAVILA_TIME_GROUPED=v1) on values and grads."""
    import jax

    from lavila_tpu.ops import attention as A
    rng = np.random.default_rng(7)
    B, F, N, H, dh = 2, 16, 7, 3, 8
    mk = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)  # noqa: E731
    args = tuple(mk(B, 1, H, dh) for _ in range(3)) + tuple(
        mk(B, F, N, H, dh) for _ in range(3))
    cot_c, cot_p = mk(B, 1, H, dh), mk(B, F, N, H, dh)

    def run(variant):
        old = A.get_attention_backend()
        A.set_attention_backend("grouped")
        monkeypatch.setenv("LAVILA_TIME_GROUPED", variant)
        try:
            def f(*xs):
                c, p = A.divided_attention_split(*xs, axis="time")
                return jnp.sum(c * cot_c) + jnp.sum(p * cot_p)
            return jax.value_and_grad(f, argnums=tuple(range(6)))(*args)
        finally:
            A.set_attention_backend(old)
            monkeypatch.delenv("LAVILA_TIME_GROUPED", raising=False)

    want_val, want_g = run("v1")
    got_val, got_g = run("direct")
    np.testing.assert_allclose(float(got_val), float(want_val), rtol=1e-5)
    for a, b in zip(got_g, want_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
