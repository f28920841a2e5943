"""Micro-bench of divided-attention formulations on the real chip.

Times fwd+bwd of each temporal/spatial variant at TSF-B geometry
(B=16, F=4, N=196, H=12, d=64, bf16) by scanning ITERS iterations inside
one jit (per-dispatch is ~1 ms on the axon tunnel, variants are sub-ms).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from lavila_tpu.ops import attention as A

B, F, N, H, d = 16, 4, 196, 12, 64
L = 1 + F * N
ITERS = 30


def timed(fn, x, reps=3):
    out = fn(x)
    _ = float(out)          # force host read (block_until_ready lies here)
    best = 1e9
    for _i in range(reps):
        t0 = time.perf_counter()
        out = fn(x)
        _ = float(out)
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def make_bench(variant_fn):
    """fwd+bwd of sum(variant(qkv)) scanned ITERS times inside one jit."""

    def loss(x):
        q = x
        k = jnp.roll(x, 1, axis=1)
        v = jnp.roll(x, 2, axis=1)
        return jnp.sum(variant_fn(q, k, v).astype(jnp.float32))

    g = jax.grad(loss)

    @jax.jit
    def run(x):
        def body(c, _):
            gr = g(c)
            # fold grad back in so iterations can't be CSE'd away
            return c + 1e-12 * gr, ()
        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.sum(c.astype(jnp.float32))

    return run


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, H, d)) * 0.02, jnp.bfloat16)

    variants = {}

    def grouped(axis):
        def fn(q, k, v):
            old = A.get_attention_backend()
            A.set_attention_backend("grouped")
            try:
                return A.divided_attention(q, k, v, F, axis)
            finally:
                A.set_attention_backend(old)
        return fn

    def backend(name, axis):
        def fn(q, k, v):
            old = A.get_attention_backend()
            A.set_attention_backend(name)
            try:
                return A.divided_attention(q, k, v, F, axis)
            finally:
                A.set_attention_backend(old)
        return fn

    variants["floor/identity"] = lambda q, k, v: v
    variants["floor/add"] = lambda q, k, v: q + k + v

    def time_scores_only(q, k, v):
        # just the F*(F+1) mul-reduces, no softmax/out stage
        B_, L_, H_, d_ = q.shape
        N_ = (L_ - 1) // F
        outs = []
        for f in range(F):
            qf = q[:, 1 + f * N_: 1 + (f + 1) * N_]
            acc = jnp.zeros_like(qf)
            for g in range(F):
                kg = k[:, 1 + g * N_: 1 + (g + 1) * N_]
                s = jnp.sum(qf.astype(jnp.float32) * kg.astype(jnp.float32),
                            axis=-1, keepdims=True)
                acc = acc + s.astype(q.dtype) * kg
            outs.append(acc)
        return jnp.concatenate(outs, axis=1)

    def flash_direct(q, k, v):
        # fused flash kernel with inputs ALREADY in its native layout —
        # isolates kernel cost from the around-kernel transposes
        from lavila_tpu.ops.pallas.flash_attention import fused_attention
        B_, L_, H_, d_ = q.shape
        N_ = (L_ - 1) // F
        qq = q[:, 1:].reshape(B_ * F, N_, H_, d_).transpose(0, 2, 1, 3)
        kk = k[:, 1:].reshape(B_ * F, N_, H_, d_).transpose(0, 2, 1, 3)
        vv = v[:, 1:].reshape(B_ * F, N_, H_, d_).transpose(0, 2, 1, 3)
        out = fused_attention(qq, kk, vv, False, None)
        return out.transpose(0, 2, 1, 3).reshape(B_, F * N_, H_, d_)

    variants["time/unrolled"] = backend("xla", "time")
    variants["time/fused-phase"] = backend("pallas", "time")
    variants["space/grouped-xla"] = grouped("space")
    variants["space/fused-phase"] = backend("pallas", "space")

    for name, fn in variants.items():
        run = make_bench(fn)
        dt = timed(run, x)
        print(f"{name:22s} fwd+bwd: {dt*1e3:7.3f} ms/iter "
              f"(x12 blocks = {dt*12*1e3:6.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
