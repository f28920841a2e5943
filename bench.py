"""Benchmark: TSF-B dual-encoder pretrain step throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/sec/chip", "vs_baseline": N}

The reference publishes no throughput numbers (SURVEY.md §6), so
``vs_baseline`` reports model FLOPs utilisation (MFU) against the chip's
bf16 peak — the speed-of-light fraction the task targets.
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

# Fallback single-chip TSF-B train throughput, used by --data to express
# pipeline headroom when no driver-recorded BENCH_r*.json is readable
# (chip_clips_per_sec() prefers the newest recorded number, so this
# constant can't silently drift from the real chip rate).
CHIP_CLIPS_PER_SEC = 174.02


def chip_clips_per_sec(search_dir: str | None = None) -> float:
    """Newest driver-recorded chip throughput: scans BENCH_r*.json next
    to this file (highest round wins) for a successful
    tsf_b_pretrain_clips_per_sec_per_chip record; falls back to the
    CHIP_CLIPS_PER_SEC constant."""
    import glob
    import re

    here = search_dir or os.path.dirname(os.path.abspath(__file__))
    best_n, best_v = -1, None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        parsed = rec.get("parsed") or {}
        if (parsed.get("metric") == "tsf_b_pretrain_clips_per_sec_per_chip"
                and isinstance(parsed.get("value"), (int, float))
                and parsed["value"] > 0 and int(m.group(1)) > best_n):
            best_n, best_v = int(m.group(1)), float(parsed["value"])
    return best_v if best_v is not None else CHIP_CLIPS_PER_SEC


# dual-encoder bench geometries (vision tower + CLIP text tower)
BENCH_MODELS = {
    # batch_16f: measured per-model batch for --frames 16 (the 16f
    # activations are ~4x the 4f shape's; the 4f default batch OOMs)
    "tsf_b": dict(name="CLIP_OPENAI_TIMESFORMER_BASE", img=224, patch=16,
                  depth=12, dim=768, text_dim=512, batch=16, remat=False,
                  batch_16f=4),  # fits no-remat through b8, batch-flat
    # reference flagship-quality model (docs/PRETRAIN.md:24-35: batch
    # 8/GPU + ZeRO + grad-ckpt on 32GB V100s); on 16GB v5e it needs
    # remat — the recipe is documented in PARITY.md
    "tsf_l": dict(name="CLIP_OPENAI_TIMESFORMER_LARGE", img=224, patch=14,
                  depth=24, dim=1024, text_dim=768, batch=8, remat=True,
                  remat_policy="dots_attn",  # 216.0 vs 234.0 ms (full)
                  batch_16f=2),  # 260.2 ms dots_attn; b4 fits only 'full'
    # the 336px HR pretrain shape (reference docs/PRETRAIN.md:24-35):
    # N=576 patches/frame exercises the key-tiled flash spatial route
    "tsf_l_336": dict(name="CLIP_OPENAI_TIMESFORMER_LARGE_336PX", img=336,
                      patch=14, depth=24, dim=1024, text_dim=768, batch=4,
                      remat=True,
                      remat_policy="dots_attn",  # 260.9 vs 274.8 (full)
                      batch_16f=1),
}


def flops_per_clip(img=224, patch=16, frames=4, depth=12, dim=768,
                   text_len=77, text_dim=512, text_depth=12):
    """Analytic forward FLOPs for a TSF dual encoder (matmuls only)."""
    n = (img // patch) ** 2          # patches/frame
    L = 1 + frames * n               # video tokens
    f = 0.0
    # patch embed conv as matmul: (T*n) MACs of (patch^2*3) x dim
    f += 2 * frames * n * (patch * patch * 3) * dim
    per_block = 0.0
    # qkv (Dx3D) + proj (DxD) for both attention types: 2*(3+1) D^2 MACs/tok
    per_block += 2 * L * (2 * 4) * dim * dim
    # spatial attention scores+out: frames groups of n x (n+1)
    per_block += 2 * 2 * frames * n * (n + 1) * dim
    # temporal attention: n groups of frames x (frames+1)
    per_block += 2 * 2 * n * frames * (frames + 1) * dim
    # mlp: two D x 4D matmuls
    per_block += 2 * L * 2 * dim * 4 * dim
    f += depth * per_block
    # text tower
    tl = text_len
    per_tblock = (2 * tl * 4 * text_dim * text_dim          # qkv + proj
                  + 2 * 2 * tl * tl * text_dim              # attention
                  + 2 * tl * 2 * text_dim * 4 * text_dim)   # mlp
    f += text_depth * per_tblock
    return f


def main(model_key: str = "tsf_b", batch_size: int = 0, frames: int = 4,
         remat_policy: str = ""):
    from lavila_tpu.models import build_model
    from lavila_tpu.train.optim import make_optimizer
    from lavila_tpu.train.step import TrainState, make_clip_train_step

    # attention backend: lazy default is already 'pallas' on TPU
    # (lavila_tpu/ops/attention.py), overridable via LAVILA_ATTENTION
    g = BENCH_MODELS[model_key]
    batch_size = batch_size or (g["batch_16f"] if frames > 4 else g["batch"])
    # 16 frames = the reference fine-tune clip_length (reference
    # main_finetune_retrieval.py / _classification.py defaults 16/4,
    # 16/2); remat is forced there — the 16f activations are ~4x the
    # pretrain shape's
    # default policy: per-model measured winner (dots_attn for the
    # remat'd TSF-L geometries). For tsf_b at 16f the activations FIT
    # (measured through b8) and no-remat runs 23% faster (142.4 vs
    # 175.7 ms b4) — so non-remat models default to 'none' at long
    # clips; pass --remat-policy dots/dots_attn explicitly if a larger
    # batch OOMs.
    remat_policy = remat_policy or g.get(
        "remat_policy", "none" if (frames > 4 and not g["remat"])
        else "full")
    kw = (dict(remat=True, remat_policy=remat_policy)
          if (g["remat"] or frames > 4) and remat_policy != "none" else {})
    model = build_model(g["name"], num_frames=frames, dtype=jnp.bfloat16,
                        **kw)
    rng = np.random.default_rng(0)
    batch = {
        "frames": jnp.asarray(
            rng.normal(size=(batch_size, frames, g["img"], g["img"], 3)),
            jnp.bfloat16),
        "text": jnp.asarray(rng.integers(1, 49407, size=(batch_size, 77)),
                            jnp.int32),
    }
    params = model.init(jax.random.key(0), batch["frames"][:1],
                        batch["text"][:1])["params"]
    state = TrainState.create(params, make_optimizer(1e-3))
    step = jax.jit(make_clip_train_step(model, norm_embed=True),
                   donate_argnums=(0,))

    # warmup (compile + first-execution latency). NOTE: on the axon tunnel
    # block_until_ready does not reliably block — force a host read.
    for _ in range(3):
        state, metrics = step(state, batch)
        _ = float(metrics["loss"])

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    _ = float(metrics["loss"])  # sync
    dt = time.perf_counter() - t0

    clips_per_sec = batch_size * iters / dt
    # fwd + bwd ≈ 3x fwd FLOPs (remat adds recompute the analytic count
    # deliberately ignores — MFU stays comparable across recipes)
    step_flops = 3 * flops_per_clip(
        img=g["img"], patch=g["patch"], frames=frames, depth=g["depth"],
        dim=g["dim"], text_dim=g["text_dim"]) * batch_size
    achieved = step_flops * iters / dt
    peak = 197e12  # TPU v5e bf16 peak FLOP/s
    mfu = achieved / peak
    tag = f"_{frames}f" if frames != 4 else ""
    print(json.dumps({
        "metric": f"{model_key}{tag}_pretrain_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(mfu, 4),
    }))


NARRATOR_MODELS = {
    "base": ("VCLM_OPENAI_TIMESFORMER_BASE_GPT2", 224, "TSF-B+GPT2"),
    # the reference's flagship narrator (docs/MODEL_ZOO.md:21)
    "xl": ("VCLM_OPENAI_TIMESFORMER_LARGE_336PX_GPT2_XL", 336,
           "TSF-L@336+GPT2-XL"),
}


def narrator_bench(batch_size: int = 16, max_len: int = 77,
                   decoder: str = "base", skip_reforward: bool = False,
                   bf16_params: bool = False, realistic_lengths: bool = False):
    """Secondary benchmark: GPT-2 narrator decode throughput
    (narrations/sec), cached scan decode vs the reference's
    re-forward-the-whole-prefix strategy (reference narrator.py:118-119)
    emulated for comparison (skippable for XL, where the re-forward
    emulation alone is minutes of chip time)."""
    from lavila_tpu.models import build_model

    name, img, label = NARRATOR_MODELS[decoder]
    model = build_model(name,
                        num_frames=4, gated_xattn=True, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=(batch_size, 4, img, img, 3)),
                         jnp.bfloat16)
    text = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.key(0), frames[:1], text)["params"]
    if bf16_params:
        from lavila_tpu.utils.precision import cast_params_bf16
        params = cast_params_bf16(params)
    variables = {"params": params}

    tokens = jax.jit(lambda v, f: model.apply(
        v, f, method="encode_image"))(variables, frames)
    _ = float(tokens.astype(jnp.float32).sum())

    gen = jax.jit(lambda v, t, key: model.apply(
        v, t, rng=key, bos_id=50256, eos_id=50256,
        max_text_length=max_len, temperature=0.7, top_p=0.95,
        method="generate"))
    ids, _ppl = gen(variables, tokens, jax.random.key(0))
    _ = int(np.asarray(ids)[0, 0])
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        ids, _ppl = gen(variables, tokens, jax.random.key(i))
    _ = int(np.asarray(ids)[0, 0])
    cached = batch_size * reps / (time.perf_counter() - t0)

    if realistic_lengths:
        # Random weights never sample EOS (p ~ 1/50k), hiding the
        # early-exit payoff the fixed-77 number can't show. Emulate a
        # trained narrator's ~12-token Ego4D narrations by pinning the
        # per-step EOS probability to 1/12 (geometric lengths, mean 12)
        # inside the logits warper; decode exits at the batch-max
        # length (~E[max of B geometrics] steps instead of 77).
        import lavila_tpu.models.sampling as S
        orig_warp = S.warp_logits
        p_eos = 1.0 / 12.0

        def biased_warp(logits, *a, **kw):
            w = orig_warp(logits, *a, **kw)
            logz = jax.nn.logsumexp(w, axis=-1)
            return w.at[:, 50256].set(logz + float(np.log(p_eos
                                                          / (1 - p_eos))))
        S.warp_logits = biased_warp
        try:
            gen_r = jax.jit(lambda v, t, key: model.apply(
                v, t, rng=key, bos_id=50256, eos_id=50256,
                max_text_length=max_len, temperature=0.7, top_p=0.95,
                method="generate"))
            sampled = [gen_r(variables, tokens, jax.random.key(0))[0]]
            _ = int(np.asarray(sampled[0])[0, 0])
            t0 = time.perf_counter()
            for i in range(reps):
                ids, _ = gen_r(variables, tokens, jax.random.key(100 + i))
                sampled.append(ids)  # device array; host read deferred
            _ = int(np.asarray(ids)[0, 0])
            realistic = batch_size * reps / (time.perf_counter() - t0)
            # length stats over every decoded batch (warmup + timed): a
            # single 16-row batch's mean is too noisy to report
            arr = np.concatenate([np.asarray(s) for s in sampled])[:, 1:]
            hit = (arr == 50256).any(axis=1)
            lens = np.where(hit, np.argmax(arr == 50256, axis=1) + 1,
                            arr.shape[1])
        finally:
            S.warp_logits = orig_warp
        print(json.dumps({
            "metric": (f"narrator_{decoder}_realistic_narrations_per_sec"
                       if decoder != "base" else
                       "narrator_realistic_narrations_per_sec"),
            "value": round(realistic, 2),
            "unit": f"narrations/sec (EOS-early-exit, mean ~12 tok, {label})",
            "vs_baseline": round(realistic / max(cached, 1e-9), 2),
            "note": "vs_baseline = early-exit speedup over the fixed-77 "
                    f"decode ({cached:.1f}/s) in the same process; mean "
                    f"length {float(lens.mean()):.1f} tok over {len(lens)} "
                    "narrations",
        }))
        return

    if skip_reforward:
        print(json.dumps({
            # keep the historical key for the base decoder so the
            # BENCH_r*.json series stays continuous across flags
            "metric": ("narrator_decode_narrations_per_sec"
                       if decoder == "base" else
                       f"narrator_{decoder}_decode_narrations_per_sec"),
            "value": round(cached, 2),
            "unit": f"narrations/sec (77 tokens, {label})",
            "vs_baseline": round(cached, 2),
            "note": "cached KV decode; re-forward comparison skipped",
        }))
        return

    # reference-style decode: full prefix re-forward per step, no KV reuse
    def reforward(v, t, key):
        def step(carry, i):
            seq, key = carry
            logits, _ = model.text_decoder.apply(
                {"params": v["params"]["text_decoder"]}, seq,
                encoder_states=t)
            idx = jnp.maximum(i, 0)
            nxt = jax.random.categorical(
                jax.random.fold_in(key, i),
                logits[jnp.arange(seq.shape[0]), idx].astype(jnp.float32)
                / 0.7)
            seq = jax.lax.dynamic_update_slice(
                seq, nxt[:, None].astype(seq.dtype), (0, i + 1))
            return (seq, key), None
        seq0 = jnp.zeros((t.shape[0], max_len), jnp.int32)
        (seq, _), _ = jax.lax.scan(step, (seq0, key),
                                   jnp.arange(max_len - 1))
        return seq
    ref = jax.jit(reforward)
    seq = ref(variables, tokens, jax.random.key(0))
    _ = int(np.asarray(seq)[0, 0])
    t0 = time.perf_counter()
    seq = ref(variables, tokens, jax.random.key(1))
    _ = int(np.asarray(seq)[0, 0])
    reforward_rate = batch_size / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": ("narrator_decode_narrations_per_sec"
                   if decoder == "base" else
                   f"narrator_{decoder}_decode_narrations_per_sec"),
        "value": round(cached, 2),
        "unit": f"narrations/sec (77 tokens, {label})",
        "vs_baseline": round(cached / max(reforward_rate, 1e-9), 2),
        "note": "vs_baseline = speedup over reference-style full-prefix "
                "re-forward decode",
    }))


def data_pipeline_bench(num_videos: int = 8, batch_size: int = 16,
                        seconds: int = 12):
    """Host input-pipeline throughput: native decode + jittered sampling +
    RandomResizedCrop + normalize, through the prefetching loader."""
    import os
    import pickle
    import tempfile

    from lavila_tpu.data import transforms as T
    from lavila_tpu.data.datasets import DatasetConfig, VideoCaptionDataset
    from lavila_tpu.data.loader import DataLoader
    from lavila_tpu.data.tokenizers import ClipBpeTokenizer
    from lavila_tpu.data.video import encode_test_video

    root = tempfile.mkdtemp(prefix="bench_vids_")
    records = []
    for i in range(num_videos):
        vdir = os.path.join(root, f"vid{i:03d}.mp4")
        os.makedirs(vdir, exist_ok=True)
        encode_test_video(os.path.join(vdir, "0.mp4"), 456, 256, 30, 300)
        for j in range(32):
            records.append((f"vid{i:03d}", 0.2 * j, 0.2 * j + 2.0,
                            f"clip {i} {j}"))
    meta = os.path.join(root, "meta.pkl")
    with open(meta, "wb") as f:
        pickle.dump(records, f)

    cfg = DatasetConfig(dataset="ego4d", root=root, metadata=meta,
                        clip_length=4)
    ds = VideoCaptionDataset(cfg, T.TrainTransform(224),
                             ClipBpeTokenizer(), seed=0)
    loader = DataLoader(ds, batch_size, shuffle=True,
                        num_workers=os.cpu_count() or 8)
    n = 0
    t0 = time.perf_counter()
    for batch in loader:
        n += batch["frames"].shape[0]
        if time.perf_counter() - t0 > seconds:
            break
    dt = time.perf_counter() - t0
    cores = os.cpu_count() or 1
    per_core = n / dt / cores
    chip_rate = chip_clips_per_sec()
    print(json.dumps({
        "metric": "input_pipeline_clips_per_sec_per_core",
        "value": round(per_core, 2),
        "unit": "clips/sec/core (decode 256p + crop 224 + normalize)",
        "vs_baseline": round(chip_rate / per_core, 2),
        "note": "vs_baseline = host cores needed to saturate one chip's "
                f"{chip_rate} clips/s (TPU-VM hosts have >100)",
    }))


def _metric_name(args) -> str:
    """The metric key the selected mode would report (for error lines)."""
    if args.narrator:
        if getattr(args, "realistic_lengths", False):
            return ("narrator_realistic_narrations_per_sec"
                    if args.decoder == "base" else
                    f"narrator_{args.decoder}_realistic_narrations_per_sec")
        return ("narrator_decode_narrations_per_sec" if args.decoder == "base"
                else f"narrator_{args.decoder}_decode_narrations_per_sec")
    if args.data:
        return "input_pipeline_clips_per_sec_per_core"
    tag = f"_{args.frames}f" if getattr(args, "frames", 4) != 4 else ""
    return f"{args.model}{tag}_pretrain_clips_per_sec_per_chip"


def _extract_json_line(text: str):
    """Last stdout line that parses as a bench JSON record, or None."""
    for line in reversed(text.splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if isinstance(rec, dict) and "metric" in rec:
            return line
    return None


_INIT_SENTINEL = "[bench] backend ready:"

# Dual-encoder records carry analytic MFU in vs_baseline; every healthy
# shipped geometry measures 0.25-0.51 (docs/PERF.md), while the round-5
# tunnel-degradation window measured ~0.005 (a known-260.9 ms/step
# config at 23.9 s/step, ~90x slow). Below this line the number says
# more about the tunnel than the code, so the harness retries and keeps
# the best attempt instead of recording the artifact as the round's
# headline.
PLAUSIBLE_MIN_MFU = 0.15


def _implausibly_slow(rec: dict) -> bool:
    """True when a successful dual-encoder record is so far below any
    healthy measurement that tunnel degradation is the likely cause."""
    vs = rec.get("vs_baseline")
    return (rec.get("unit") == "clips/sec/chip"
            and isinstance(vs, (int, float))
            and 0 < vs < PLAUSIBLE_MIN_MFU)


def _announce_backend() -> None:
    """Inner-child handshake: printed to stderr once jax.devices()
    succeeds, so the retry parent can tell init-phase hangs (safe to
    kill and retry — no server-side work exists yet) from post-init
    work (killing a TPU client mid-remote-compile orphans server-side
    work and congests the tunnel for every later attempt)."""
    import sys

    devs = jax.devices()
    print(f"{_INIT_SENTINEL} {devs[0].platform} x{len(devs)}",
          file=sys.stderr, flush=True)


def _run_attempt(cmd, init_timeout_s: float, run_timeout_s: float,
                 poll_s: float = 2.0):
    """One child run. Returns (phase, rc, stdout, stderr) where phase is
    'done' (child exited; rc is its code), 'init-timeout' (killed before
    the backend-init sentinel appeared), or 'run-timeout' (killed after
    init — i.e. mid-compile or mid-dispatch)."""
    import subprocess
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        out_p, err_p = os.path.join(td, "out"), os.path.join(td, "err")
        phase = "done"
        with open(out_p, "w") as out_f, open(err_p, "w") as err_f:
            proc = subprocess.Popen(cmd, stdout=out_f, stderr=err_f,
                                    text=True)
            start = time.monotonic()
            inited = False
            while proc.poll() is None:
                if not inited:
                    # separate read handle: the write fd's offset is
                    # shared with the child
                    with open(err_p) as f:
                        inited = _INIT_SENTINEL in f.read()
                elapsed = time.monotonic() - start
                limit = run_timeout_s if inited else min(init_timeout_s,
                                                         run_timeout_s)
                if elapsed > limit:
                    phase = "run-timeout" if inited else "init-timeout"
                    proc.kill()
                    proc.wait()
                    break
                time.sleep(poll_s)
        rc = proc.returncode if phase == "done" else None
        with open(out_p) as f:
            out = f.read()
        with open(err_p) as f:
            err = f.read()
        return phase, rc, out, err


def run_with_retry(args, raw_argv, attempts: int = 3,
                   backoff_s: float = 180.0,
                   init_timeout_s: float = 600.0,
                   run_timeout_s: float = 3300.0) -> int:
    """Run the bench in a child process, retrying on transient failures.

    Round 3 shipped no driver-visible number because one `Unable to
    initialize backend 'axon': UNAVAILABLE` at init erased the round's
    evidence (VERDICT.md weakness 1). JAX caches backend-init failures
    within a process, so each attempt must be a fresh process. The
    parent prints EXACTLY ONE JSON line: the child's record on success,
    or an {"error": ...} record after the last attempt. Child stderr is
    relayed to our stderr (stdout stays single-line).

    Timeout policy follows the tunnel's two failure modes. An attempt
    that never reports backend init within ``init_timeout_s`` is killed
    and retried: a pre-init client has no server-side work, so killing
    it is safe (the standard tunnel probe does exactly this). An
    attempt killed only after ``run_timeout_s`` — i.e. post-init, mid
    remote compile or dispatch — is NOT retried: the kill orphans
    server-side work that congests the tunnel, so further attempts
    would hang into our own congestion and make the outage worse."""
    import sys

    last_err = "unknown failure"
    best = None  # (value, record) of the best successful attempt
    for i in range(attempts):
        phase, rc, out, err = _run_attempt(
            [sys.executable, os.path.abspath(__file__), "--_inner",
             *raw_argv], init_timeout_s, run_timeout_s)
        if err:
            sys.stderr.write(err)
        line = _extract_json_line(out)
        if phase == "done" and rc == 0 and line:
            rec = json.loads(line)
            val = rec.get("value") or 0.0
            if best is None or val > best[0]:
                best = (val, rec)
            if not _implausibly_slow(rec):
                print(json.dumps(best[1]))
                return 0
            # A "successful" run ~90x under every healthy measurement is
            # a tunnel artifact, not a perf result — retry and keep the
            # best MEASURED number (never fabricate one).
            last_err = (f"value {val} ({rec.get('vs_baseline')} MFU) is"
                        f" below the {PLAUSIBLE_MIN_MFU}-MFU plausibility"
                        " floor — suspected tunnel degradation")
            print(f"bench attempt {i + 1}/{attempts}: {last_err}",
                  file=sys.stderr)
            if i + 1 < attempts:
                time.sleep(backoff_s)
            continue
        fatal = phase == "run-timeout"
        if phase == "done":
            tail = " | ".join((err or out).strip().splitlines()[-3:])
            last_err = (f"rc={rc}: {tail}"[:500] if tail
                        else f"rc={rc} with empty output")
        elif phase == "init-timeout":
            last_err = (f"backend init not ready after {init_timeout_s:.0f}s"
                        " (killed pre-compile)")
        else:
            last_err = (f"killed after {run_timeout_s:.0f}s post-init; not"
                        " retrying (orphaned server-side work congests the"
                        " tunnel)")
        print(f"bench attempt {i + 1}/{attempts} failed: {last_err}",
              file=sys.stderr)
        if fatal:
            break
        if i + 1 < attempts:
            time.sleep(backoff_s)
    if best is not None:
        # Every attempt was implausibly slow (or later ones failed): the
        # best measured record still beats an error line, flagged so the
        # reader knows the conditions were suspect.
        print(f"bench: all attempts below the plausibility floor; keeping"
              f" the best measured record ({best[0]})", file=sys.stderr)
        print(json.dumps({**best[1], "suspect": "tunnel-degradation"}))
        return 0
    print(json.dumps({
        "metric": _metric_name(args),
        "value": 0.0,
        "unit": "error",
        "vs_baseline": 0.0,
        "error": f"bench failed; last: {last_err}",
    }))
    return 1


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--_inner", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--narrator", action="store_true",
                    help="GPT-2 narrator decode bench")
    ap.add_argument("--data", action="store_true",
                    help="host input-pipeline bench")
    ap.add_argument("--model", default="tsf_b",
                    choices=sorted(BENCH_MODELS),
                    help="dual-encoder bench geometry")
    ap.add_argument("--decoder", default="base",
                    choices=sorted(NARRATOR_MODELS),
                    help="narrator bench decoder (with --narrator)")
    ap.add_argument("--batch-size", type=int, default=0,
                    help="override the per-model default batch")
    ap.add_argument("--frames", type=int, default=4,
                    help="clip length; 16 = the reference fine-tune "
                         "shape (forces remat)")
    ap.add_argument("--remat-policy", default="",
                    choices=("", "full", "dots", "save_attn", "dots_attn",
                             "none"),
                    help="remat policy for rematerialized benches "
                         "(tsf_l*/--frames>4; see models/timesformer.py)")
    ap.add_argument("--skip-reforward", action="store_true",
                    help="narrator: skip the reference-style re-forward "
                         "comparison run")
    ap.add_argument("--realistic-lengths", action="store_true",
                    help="narrator: pin per-step EOS prob to 1/12 "
                         "(geometric, mean ~12 tokens like Ego4D "
                         "narrations) and report the early-exit rate")
    ap.add_argument("--bf16-params", action="store_true",
                    help="narrator: cast params to bf16 (inference mode; "
                         "the PARITY.md XL rows use this)")
    args = ap.parse_args()
    if args.bf16_params and not args.narrator:
        import sys
        print("--bf16-params only applies with --narrator", file=sys.stderr)
        sys.exit(2)
    if args.remat_policy and (
            args.narrator or args.data
            or (not BENCH_MODELS[args.model]["remat"] and args.frames <= 4)):
        import sys
        print("--remat-policy only applies to rematerialized dual-encoder "
              "benches (tsf_l* or --frames > 4)", file=sys.stderr)
        sys.exit(2)
    if args.frames != 4 and (args.narrator or args.data):
        import sys
        print("--frames only applies to the dual-encoder bench (narrator "
              "decode and the data pipeline always use 4-frame clips)",
              file=sys.stderr)
        sys.exit(2)
    if not args._inner:
        import sys
        raw = [a for a in sys.argv[1:] if a != "--_inner"]
        sys.exit(run_with_retry(args, raw))
    _announce_backend()
    if args.narrator:
        narrator_bench(batch_size=args.batch_size or 16,
                       decoder=args.decoder,
                       skip_reforward=args.skip_reforward,
                       bf16_params=args.bf16_params,
                       realistic_lengths=args.realistic_lengths)
    elif args.data:
        data_pipeline_bench()
    else:
        main(args.model, args.batch_size, args.frames, args.remat_policy)
