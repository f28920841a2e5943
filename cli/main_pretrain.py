"""Dual-encoder / narrator pretraining on a TPU mesh.

Equivalent of the reference's main_pretrain.py (CLI flags kept) rebuilt
around one jitted SPMD train step: DDP+ZeRO+AMP+GradScaler
(reference main_pretrain.py:179-223) collapse into sharding annotations
and bf16 compute; the contrastive all-gather is implicit in the
global-batch loss (see lavila_tpu/losses.py).

Run without data: ``python -m cli.main_pretrain --dataset synthetic
--steps 5 --batch-size 8 --output-dir /tmp/run``.
"""

from __future__ import annotations

import json
import math
import os
import os.path as osp
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lavila_tpu.config import (PretrainConfig, model_kwargs_from_config,
                               parse_config)
from lavila_tpu.data import transforms as T
from lavila_tpu.data.datasets import ConcatDataset, DatasetConfig, get_dataset
from lavila_tpu.data.loader import DataLoader, device_prefetch
from lavila_tpu.data.tokenizers import generate_tokenizer
from lavila_tpu.models import build_model
from lavila_tpu.parallel import (create_mesh, param_sharding_rules,
                                 shard_batch, shard_params)
from lavila_tpu.train.optim import cosine_schedule, make_optimizer
from lavila_tpu.train.step import (TrainState, make_caption_train_step,
                                   make_clip_train_step)
from lavila_tpu.utils.checkpoints import CheckpointManager, resolve_resume
from lavila_tpu.utils.meters import AverageMeter, ProgressMeter, Timer
from lavila_tpu.utils.random import random_seed


def build_dataset(cfg, tokenizer, train_transform):
    dcfg = DatasetConfig(
        dataset=cfg.dataset, root=cfg.root, metadata=cfg.metadata,
        clip_length=cfg.clip_length, clip_stride=cfg.clip_stride,
        sparse_sample=cfg.sparse_sample,
        narration_selection=cfg.narration_selection)
    base = get_dataset(dcfg, train_transform, tokenizer, is_training=True,
                       seed=cfg.seed)
    if cfg.metadata_aux is None:
        return base
    aux_paths = cfg.metadata_aux.split(",")
    datasets = [base]
    indicators = [1]
    for p in aux_paths:
        acfg = DatasetConfig(
            dataset=cfg.dataset, root=cfg.root, metadata=p,
            clip_length=cfg.clip_length, clip_stride=cfg.clip_stride,
            sparse_sample=cfg.sparse_sample, narration_selection="random")
        datasets.append(get_dataset(acfg, train_transform, tokenizer,
                                    is_training=True, seed=cfg.seed))
        indicators.append(0)
    return ConcatDataset(datasets, indicators)


def main(cfg: PretrainConfig):
    random_seed(cfg.seed, jax.process_index())
    mesh = create_mesh(cfg.mesh_data, cfg.mesh_model)
    dp = mesh.devices.shape[0]
    if cfg.batch_size % dp != 0:
        raise ValueError(
            f"--batch-size {cfg.batch_size} must be divisible by the "
            f"data-parallel mesh size {dp}")
    dtype = jnp.float32 if cfg.disable_amp else jnp.bfloat16
    is_vclm = cfg.model.startswith("VCLM")

    print(f"=> building model {cfg.model} (compute dtype {dtype.__name__})")
    model = build_model(cfg.model, dtype=dtype,
                        **model_kwargs_from_config(cfg))
    tokenizer = generate_tokenizer(cfg.model)

    mean, std = T.normalization_for_model(cfg.model)
    crop = 336 if "336PX" in cfg.model else (
        64 if "MINI" in cfg.model else 224)
    train_transform = T.TrainTransform(crop, mean, std)

    dataset = build_dataset(cfg, tokenizer, train_transform)
    # --batch-size is the GLOBAL batch (it must tile the data mesh axis,
    # checked above); each host's loader yields its 1/process_count slice
    # and shard_batch() assembles the global array from the local pieces.
    if cfg.batch_size % jax.process_count() != 0:
        raise ValueError(
            f"--batch-size {cfg.batch_size} must be divisible by the "
            f"process count {jax.process_count()}")
    local_bs = cfg.batch_size // jax.process_count()
    loader = DataLoader(dataset, local_bs, shuffle=True,
                        num_workers=cfg.workers, drop_last=True,
                        shard_index=jax.process_index(),
                        num_shards=jax.process_count(), seed=cfg.seed)
    iters_per_epoch = max(len(loader) // cfg.update_freq, 1)
    print(f"=> dataset {cfg.dataset}: {len(dataset)} samples, "
          f"{iters_per_epoch} optim iters/epoch")

    schedule = (cfg.lr if cfg.fix_lr else cosine_schedule(
        cfg.lr, cfg.lr_end, cfg.epochs, iters_per_epoch,
        warmup_epochs=cfg.warmup_epochs, start_warmup_lr=cfg.lr_start))
    tx = make_optimizer(schedule, weight_decay=cfg.wd, betas=cfg.betas,
                        eps=cfg.eps, clip_grad_value=cfg.clip_grad_value,
                        clip_grad_type=cfg.clip_grad_type,
                        update_freq=cfg.update_freq)
    from lavila_tpu.train.freeze import (build_freeze_predicate,
                                         freeze_by_predicate)
    frozen = build_freeze_predicate(
        freeze_temperature=cfg.freeze_temperature,
        timesformer_freeze_space=cfg.timesformer_freeze_space,
        freeze_visual_vclm=cfg.freeze_visual_vclm,
        freeze_visual_vclm_temporal=cfg.freeze_visual_vclm_temporal,
        freeze_lm_vclm=cfg.freeze_lm_vclm,
        freeze_pseudo_temperature=cfg.freeze_pseudo_temperature)
    if any([cfg.freeze_temperature, cfg.timesformer_freeze_space,
            cfg.freeze_visual_vclm, cfg.freeze_visual_vclm_temporal,
            cfg.freeze_lm_vclm, cfg.freeze_pseudo_temperature]):
        tx = freeze_by_predicate(tx, frozen)

    # init params from a sample batch structure
    sample = next(iter(loader))
    init_args = (jnp.asarray(sample["frames"][:1]),
                 jnp.asarray(sample["text"][:1]))
    params = model.init(jax.random.key(cfg.seed), *init_args)["params"]
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"=> {n_params/1e6:.1f}M params")

    criterion_params = None
    use_ssl = cfg.metadata_aux is not None and not is_vclm
    if use_ssl:
        # reference main_pretrain.py:195 passes --pseudo-temperature-init
        # (CLI default 0.07) as SSLCLIPLoss's scale_init
        criterion_params = {"logit_scale_pseudo": jnp.asarray(
            math.log(1 / cfg.pseudo_temperature_init), jnp.float32)}
    state = TrainState.create(params, tx, criterion_params=criterion_params)

    mgr = CheckpointManager(cfg.output_dir)
    start_epoch = cfg.start_epoch
    best_metric = float("-inf")
    resume = resolve_resume(cfg.output_dir, cfg.resume or None)
    if resume:
        print(f"=> resuming from {resume}")
        tree, meta = mgr.restore(
            {"params": state.params, "opt_state": state.opt_state,
             "criterion_params": state.criterion_params or {}},
            tag=resume)
        state = state.replace(
            params=tree["params"], opt_state=tree["opt_state"],
            criterion_params=tree["criterion_params"] or None)
        start_epoch = int(meta.get("epoch", -1)) + 1
        best_metric = float(meta.get("metrics", {}).get(
            "best_metric", float("-inf")))

    # --mesh-model N > 1: Megatron-style TP over the 'model' axis (column
    # /row-parallel rules, parallel/sharding.py); opt state inherits the
    # param shardings through TrainState. With model=1 the rules reduce
    # to replicate-everything.
    rules = param_sharding_rules if cfg.mesh_model > 1 else None
    state = state.replace(params=shard_params(state.params, mesh, rules))

    if is_vclm:
        step_fn = jax.jit(make_caption_train_step(
            model, pad_id=tokenizer.pad_token_id), donate_argnums=(0,))
        metric_names = ["loss", "caption_loss", "caption_acc", "ppl"]
    else:
        # --contrastive-use-vissl → memory-scalable local loss: each chip
        # computes only its own B_local × B_global logit rows under
        # shard_map (reference loss.py:85-100 local_loss semantics)
        step_fn = jax.jit(make_clip_train_step(
            model, norm_embed=cfg.norm_embed, use_ssl=use_ssl,
            local_loss_mesh=mesh if cfg.contrastive_use_vissl else None),
            donate_argnums=(0,))
        metric_names = ["loss", "clip_loss", "clip_acc"]

    def run_probe():
        """Zero-shot EK-100 MIR probe (reference main_pretrain.py:359-379
        per-epoch and --eval-in-middle-freq mid-epoch)."""
        from cli.eval_zeroshot import eval_ek100_mir
        return eval_ek100_mir(
            model, {"params": state.params}, tokenizer, cfg.model,
            root=cfg.val_root or cfg.root, metadata=cfg.val_metadata,
            clip_length=cfg.clip_length, clip_stride=cfg.clip_stride,
            batch_size=cfg.batch_size, workers=cfg.workers,
            num_clips=cfg.val_num_clips, num_crops=cfg.val_num_crops)

    os.makedirs(cfg.output_dir, exist_ok=True)
    wandb_run = None
    if cfg.wandb and jax.process_index() == 0:
        try:
            import wandb as _wandb
            wandb_run = _wandb.init(project="lavila_tpu",
                                    config=cfg.asdict())
        except Exception as e:  # offline image: keep training
            print(f"(wandb unavailable: {e})")

    total_steps = 0
    for epoch in range(start_epoch, cfg.epochs):
        loader.set_epoch(epoch)
        meters = {k: AverageMeter(k, ":.4f") for k in metric_names}
        batch_time = AverageMeter("time", ":.3f")
        data_time = AverageMeter("data", ":.3f")
        mem = AverageMeter("mem(GB)", ":.1f")  # device HBM in use
        progress = ProgressMeter(
            len(loader),
            [batch_time, data_time, mem] + list(meters.values()),
            prefix=f"Epoch [{epoch}]")

        def hbm_gb():
            try:
                stats = jax.local_devices()[0].memory_stats() or {}
                return stats.get("bytes_in_use", 0) / 1e9
            except Exception:
                return 0.0
        timer = Timer()

        def place(batch):
            # async sharded device_put — issued for batch N+1 while step
            # N runs (device_prefetch double-buffers the H2D transfer)
            keys = ["frames", "text"]
            if use_ssl:
                keys.append("gt_indicators")
            if "mask" in batch:
                keys.append("mask")
            return shard_batch({k: np.asarray(batch[k]) for k in keys},
                               mesh)

        for it, device_batch in enumerate(device_prefetch(loader, place)):
            data_time.update(timer.lap())
            if cfg.profile_dir and total_steps == 5:
                jax.profiler.start_trace(cfg.profile_dir)
            state, metrics = step_fn(state, device_batch)
            if cfg.profile_dir and total_steps == 10:
                jax.tree.map(lambda x: x.block_until_ready(), metrics)
                jax.profiler.stop_trace()
                print(f"=> profiler trace written to {cfg.profile_dir}")
            if it % cfg.print_freq == 0:
                loss = float(metrics["loss"])
                if not math.isfinite(loss):
                    print(f"loss is {loss}, aborting")
                    sys.exit(1)
                for k in metric_names:
                    if k in metrics:
                        meters[k].update(float(metrics[k]), cfg.batch_size)
                mem.update(hbm_gb())
                batch_time.update(timer.lap())
                progress.display(it)
                if wandb_run is not None:
                    wandb_run.log({k: m.val for k, m in meters.items()})
            else:
                batch_time.update(timer.lap())
            total_steps += 1
            if (cfg.eval_in_middle_freq > 0 and it > 0
                    and it % cfg.eval_in_middle_freq == 0
                    and cfg.val_metadata and not is_vclm):
                run_probe()
            if cfg.steps is not None and total_steps >= cfg.steps:
                break

        probe_metrics = {}
        if cfg.val_metadata and not is_vclm:
            probe_metrics = run_probe()
        # best-checkpoint tracking keyed on probe avg mAP
        # (reference main_pretrain.py:394-403 keeps checkpoint_best.pt)
        is_best = False
        if probe_metrics.get("mAP_avg", float("-inf")) > best_metric:
            is_best, best_metric = True, probe_metrics["mAP_avg"]
        # ALL processes enter the save: orbax coordinates multi-host
        # writes internally (primary writes replicated leaves, each host
        # writes its addressable shards) and its save barrier would
        # deadlock a pod if only process 0 called it.
        tree = {"params": state.params, "opt_state": state.opt_state,
                "criterion_params": state.criterion_params or {}}
        mgr.save(tree, epoch=epoch, config=cfg.asdict(),
                 metrics={**probe_metrics, "best_metric": best_metric},
                 is_best=is_best,
                 keep_epoch=(epoch + 1) % cfg.save_freq == 0)
        if jax.process_index() == 0:
            log = {f"train_{k}": m.avg for k, m in meters.items()}
            log.update(probe_metrics)
            log["epoch"] = epoch
            with open(osp.join(cfg.output_dir, "log.txt"), "a") as f:
                f.write(json.dumps(log) + "\n")
            if wandb_run is not None:
                wandb_run.log(log)
        if cfg.steps is not None and total_steps >= cfg.steps:
            break
    print("=> done")
    return state


if __name__ == "__main__":
    main(parse_config(PretrainConfig))
