"""Helpers for TPU experiment jobs (run inside tpu_job_server.py).

``time_clip_step`` mirrors bench.py's dual-encoder step (same model
build, optimizer, donated train state, host-read sync) so experiment
numbers are directly comparable to the bench headline.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def time_clip_step(model_name="CLIP_OPENAI_TIMESFORMER_LARGE_336PX",
                   img=336, batch=4, frames=4, remat=True,
                   remat_policy="full", iters=10, warmup=3, env=None,
                   label=""):
    """Build + time one dual-encoder train step; returns ms/step.

    ``env``: dict of env-var experiment knobs set for the duration of
    the build/trace (knobs are read at trace time, so a fresh jit per
    call picks them up); restored afterwards.
    """
    saved = {}
    env = env or {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = str(v)
    try:
        from lavila_tpu.models import build_model
        from lavila_tpu.train.optim import make_optimizer
        from lavila_tpu.train.step import TrainState, make_clip_train_step

        kw = dict(remat=True, remat_policy=remat_policy) if remat else {}
        model = build_model(model_name, num_frames=frames,
                            dtype=jnp.bfloat16, **kw)
        rng = np.random.default_rng(0)
        batch_d = {
            "frames": jnp.asarray(
                rng.normal(size=(batch, frames, img, img, 3)), jnp.bfloat16),
            "text": jnp.asarray(rng.integers(1, 49407, size=(batch, 77)),
                                jnp.int32),
        }
        params = model.init(jax.random.key(0), batch_d["frames"][:1],
                            batch_d["text"][:1])["params"]
        state = TrainState.create(params, make_optimizer(1e-3))
        step = jax.jit(make_clip_train_step(model, norm_embed=True),
                       donate_argnums=(0,))
        for _ in range(warmup):
            state, metrics = step(state, batch_d)
            _ = float(metrics["loss"])  # axon: block_until_ready lies
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, batch_d)
        _ = float(metrics["loss"])
        dt = (time.perf_counter() - t0) / iters
        print(f"[{label or model_name}] {dt * 1e3:8.2f} ms/step  "
              f"({batch / dt:6.2f} clips/s)  env={env}", flush=True)
        del state, params, batch_d
        return dt * 1e3
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
