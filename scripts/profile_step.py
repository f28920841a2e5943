"""Ablation profiler for the TSF-B pretrain step on one TPU chip.

Times step variants to attribute the budget: full step, fwd-only,
fwd+bwd (no optimizer), and model forwards with the temporal / spatial
attention phases ablated to identity. Loops outside jit (dispatch is
~1ms, steps are ~100ms); syncs by host-reading the loss.
"""

import argparse
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


def timeit(fn, sync, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--model", default="CLIP_OPENAI_TIMESFORMER_BASE")
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--remat", default="")
    ap.add_argument("--ablate", action="store_true",
                    help="also time temporal/spatial-ablated forwards")
    ap.add_argument("--trace", default="",
                    help="capture a jax.profiler xplane trace of 5 full "
                         "steps into this dir (parse with "
                         "scripts/parse_xplane.py <dir> --steps 5)")
    args = ap.parse_args()

    from lavila_tpu.models import build_model
    from lavila_tpu.ops import attention as A
    from lavila_tpu.train.optim import make_optimizer
    from lavila_tpu.train.step import TrainState, make_clip_train_step

    if jax.default_backend() == "tpu":
        A.set_attention_backend(args.backend)

    B = args.batch_size
    kw = {}
    if args.remat:
        kw = dict(remat=True, remat_policy=args.remat)
    model = build_model(args.model, num_frames=4, dtype=jnp.bfloat16, **kw)
    rng = np.random.default_rng(0)
    batch = {
        "frames": jnp.asarray(
            rng.normal(size=(B, 4, args.img_size, args.img_size, 3)),
            jnp.bfloat16),
        "text": jnp.asarray(rng.integers(1, 49407, size=(B, 77)), jnp.int32),
    }
    params = model.init(jax.random.key(0), batch["frames"][:1],
                        batch["text"][:1])["params"]
    state = TrainState.create(params, make_optimizer(1e-3))
    step = jax.jit(make_clip_train_step(model, norm_embed=True),
                   donate_argnums=(0,))

    # --- full step ---
    holder = {"state": state}

    def run_step():
        holder["state"], m = step(holder["state"], batch)
        return m

    t_step = timeit(run_step, lambda m: float(m["loss"]))
    print(f"full step:        {t_step*1e3:8.2f} ms   "
          f"({B/t_step:7.1f} clips/s)")

    if args.trace:
        jax.profiler.start_trace(args.trace)
        for _ in range(5):
            m = run_step()
        _ = float(m["loss"])
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace} (5 steps)")

    # --- forward-only loss ---
    from lavila_tpu import losses

    def loss_fn(p, b):
        out = model.apply({"params": p}, b["frames"], b["text"],
                          norm_embed=True)
        return losses.clip_loss(out["image_embed"], out["text_embed"],
                                out["logit_scale"])["loss"]

    params_b = holder["state"].params
    fwd = jax.jit(loss_fn)
    t_fwd = timeit(lambda: fwd(params_b, batch), lambda x: float(x))
    print(f"fwd loss only:    {t_fwd*1e3:8.2f} ms")

    grad = jax.jit(jax.grad(loss_fn))
    t_bwd = timeit(lambda: grad(params_b, batch),
                   lambda g: float(jax.tree.leaves(g)[0].reshape(-1)[0]))
    print(f"fwd+bwd grads:    {t_bwd*1e3:8.2f} ms   "
          f"(optimizer+loss ≈ {max(t_step-t_bwd,0)*1e3:.2f} ms)")

    # --- vision tower only fwd ---
    enc = jax.jit(lambda p, f: model.apply(
        {"params": p}, f, method="encode_image"))
    t_vis = timeit(lambda: enc(params_b, batch["frames"]),
                   lambda x: float(x.astype(jnp.float32).sum()))
    print(f"vision fwd only:  {t_vis*1e3:8.2f} ms")

    if args.ablate:
        # ablate phases by monkeypatching the model's imported symbol
        from lavila_tpu.models import timesformer as TSF
        orig = A.divided_attention_split

        def make_ablated(which):
            def fn(qc, kc, vc, qp, kp, vp, axis):
                if axis == which:
                    # identity: same shape/cost envelope minus the attn
                    return vc, vp
                return orig(qc, kc, vc, qp, kp, vp, axis)
            return fn

        for which in ("time", "space"):
            TSF.divided_attention_split = make_ablated(which)
            try:
                g2 = jax.jit(jax.grad(loss_fn))
                t_a = timeit(lambda: g2(params_b, batch),
                             lambda g: float(
                                 jax.tree.leaves(g)[0].reshape(-1)[0]))
                print(f"fwd+bwd no-{which:5s}: {t_a*1e3:8.2f} ms   "
                      f"({which} attn cost ≈ {(t_bwd-t_a)*1e3:.2f} ms)")
            finally:
                TSF.divided_attention_split = orig


if __name__ == "__main__":
    main()
