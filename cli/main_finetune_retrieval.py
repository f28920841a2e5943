"""Retrieval fine-tuning: EK-100 MIR (adaptive max-margin with relevancy
weights) or CharadesEgo (InfoNCE on trimmed clips, classification-mAP
validation on the untrimmed val set).

Equivalent of the reference main_finetune_retrieval.py: rebuilds the
pretrained dual encoder from the checkpoint's embedded config, freezes
the logit scale (reference :142), trains with the margin loss
(ek100_mir) or CLIP loss (charades_ego), and validates per epoch —
retrieval mAP/nDCG for MIR (reference :318,367), prompt-ensembled
multilabel classification mAP for CharadesEgo (reference :319-320,
368-369, validate_cls :569-644). Auto-resume restores params, optimizer
state, and the best metric (reference :182-217); the best checkpoint is
tracked on the per-epoch val metric.
"""

from __future__ import annotations

import argparse
import json
import math
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from lavila_tpu.config import model_kwargs_from_config
from lavila_tpu.data import transforms as T
from lavila_tpu.data.datasets import DatasetConfig, VideoCaptionDataset
from lavila_tpu.data.loader import DataLoader, device_prefetch
from lavila_tpu.data.tokenizers import generate_tokenizer
from lavila_tpu.models import build_model
from lavila_tpu.parallel import create_mesh, shard_batch, shard_params
from lavila_tpu.train.freeze import freeze_by_predicate, logit_scale_only
from lavila_tpu.train.optim import cosine_schedule, make_optimizer
from lavila_tpu.train.step import TrainState, make_retrieval_train_step
from lavila_tpu.utils.checkpoints import CheckpointManager, resolve_resume
from lavila_tpu.utils.meters import AverageMeter, Timer
from lavila_tpu.utils.random import random_seed


def get_args_parser():
    p = argparse.ArgumentParser("retrieval fine-tune")
    p.add_argument("--dataset", default="ek100_mir",
                   choices=["ek100_mir", "charades_ego",
                            "charades_ego_trimmed", "synthetic"],
                   help="charades_ego trains on the trimmed-pkl clips "
                        "and validates classification-style on the "
                        "untrimmed csv (reference :281-295); "
                        "charades_ego_trimmed is the train-only alias")
    p.add_argument("--root", default="")
    p.add_argument("--metadata", default="")
    p.add_argument("--metadata-val", default="")
    p.add_argument("--label-metadata", default="",
                   help="Charades_v1_classes.txt for charades_ego "
                        "validation")
    p.add_argument("--pretrain-model", default="")
    p.add_argument("--resume", default="")
    p.add_argument("--model", default="CLIP_OPENAI_TIMESFORMER_MINI")
    p.add_argument("--clip-length", type=int, default=16)
    p.add_argument("--clip-stride", type=int, default=4)
    p.add_argument("--num-clips", type=int, default=1)
    p.add_argument("--num-crops", type=int, default=1)
    p.add_argument("--sparse-sample", action="store_true")
    p.add_argument("--norm-embed", action="store_true", default=True)
    p.add_argument("--loss", default="adaptive_max_margin",
                   choices=["max_margin", "adaptive_max_margin", "clip"])
    p.add_argument("--margin", type=float, default=0.4)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--warmup-epochs", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--lr-end", type=float, default=1e-6)
    p.add_argument("--lr-start", type=float, default=1e-6)
    p.add_argument("--fix-lr", action="store_true",
                   help="constant lr, no schedule (reference "
                        "main_finetune_retrieval.py:323-325)")
    p.add_argument("--wd", type=float, default=0.01)
    p.add_argument("--betas", nargs=2, type=float, default=(0.9, 0.999))
    p.add_argument("--eps", type=float, default=1e-8)
    p.add_argument("--update-freq", type=int, default=1,
                   help="gradient accumulation steps (reference :83)")
    p.add_argument("--clip-grad-type", default="norm",
                   choices=["norm", "value"])
    p.add_argument("--clip-grad-value", type=float, default=None)
    p.add_argument("--drop-path-rate", type=float, default=0.1,
                   help="stochastic depth for fine-tuning (reference "
                        "main_finetune_retrieval.py:66,140 — the "
                        "finetune value, not the pretrain config's)")
    p.add_argument("--freeze-temperature", action="store_true",
                   help="accepted for reference parity; logit_scale is "
                        "ALWAYS frozen here, matching the reference's "
                        "unconditional main_finetune_retrieval.py:142")
    p.add_argument("--relevancy-path", default="",
                   help="explicit EK-100 relevancy pkl for validation "
                        "(reference :54, :554); default derives it from "
                        "the metadata dir")
    p.add_argument("--start-epoch", type=int, default=0)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--print-freq", type=int, default=10)
    p.add_argument("--eval-freq", type=int, default=5)
    p.add_argument("--save-freq", type=int, default=1)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--use-checkpoint", action="store_true")
    p.add_argument("--remat-policy", default="full",
                   choices=("full", "dots", "save_attn", "dots_attn"))
    p.add_argument("--evaluate", action="store_true",
                   help="validate once and exit (reference "
                        "main_finetune_retrieval.py:322-327)")
    p.add_argument("--output-dir", default="./ft_retrieval")
    return p


def validate_charades(args, model, variables, tokenizer, model_name):
    """Per-epoch CharadesEgo validation: prompt-ensembled label
    embeddings + multilabel video mAP on the untrimmed val csv
    (reference validate_cls, main_finetune_retrieval.py:569-644; the
    template set is just '{}', :319)."""
    from cli.eval_zeroshot import eval_classification
    from lavila_tpu.data.label_maps import generate_label_map
    labels, mapping = generate_label_map("charades_ego",
                                         metadata=args.label_metadata)
    ns = argparse.Namespace(
        dataset="charades_ego", root=args.root, metadata=args.metadata_val,
        metadata_val=args.metadata_val, clip_length=args.clip_length,
        clip_stride=args.clip_stride, num_clips=args.num_clips,
        num_crops=args.num_crops, batch_size=args.batch_size,
        sparse_sample=args.sparse_sample,
        workers=args.workers)
    return eval_classification(ns, model, variables, tokenizer, model_name,
                               labels, mapping, multilabel=True)


def main(args):
    random_seed(args.seed, jax.process_index())
    mesh = create_mesh()

    config = {"model": args.model, "clip_length": args.clip_length}
    if args.pretrain_model and osp.exists(args.pretrain_model + ".json"):
        with open(args.pretrain_model + ".json") as f:
            config.update(json.load(f).get("config", {}))
        config["clip_length"] = args.clip_length  # PE inflation handles it
    # the finetune recipe's values win over the pretrain config's
    # (reference rebuilds with args.drop_path_rate, :140)
    config["drop_path_rate"] = args.drop_path_rate
    config["use_checkpoint"] = args.use_checkpoint
    config["remat_policy"] = args.remat_policy

    class NS:
        def __init__(self, d):
            self.__dict__.update(d)

    model_name = config["model"]
    model = build_model(model_name, **model_kwargs_from_config(NS(config)))
    tokenizer = generate_tokenizer(model_name)
    crop = 336 if "336PX" in model_name else (
        64 if "MINI" in model_name else 224)
    mean, std = T.normalization_for_model(model_name)
    train_transform = T.TrainTransform(crop, mean, std)

    # charades_ego trains on the TRIMMED action instances (pkl) and
    # validates on the untrimmed csv (reference :281-295)
    train_dataset_name = ("charades_ego_trimmed"
                         if args.dataset == "charades_ego"
                         else args.dataset)
    dcfg = DatasetConfig(dataset=train_dataset_name, root=args.root,
                         metadata=args.metadata,
                         clip_length=args.clip_length,
                         clip_stride=args.clip_stride)
    ds = VideoCaptionDataset(dcfg, train_transform, tokenizer,
                             is_training=True, seed=args.seed)
    loader = DataLoader(ds, args.batch_size, shuffle=True, drop_last=True,
                        num_workers=args.workers,
                        shard_index=jax.process_index(),
                        num_shards=jax.process_count(), seed=args.seed)
    iters = max(len(loader), 1)

    sample = next(iter(loader))
    params = model.init(jax.random.key(args.seed),
                        jnp.asarray(sample["frames"][:1]),
                        jnp.asarray(sample["text"][:1]))["params"]
    if args.pretrain_model:
        mgr0 = CheckpointManager(osp.dirname(args.pretrain_model) or ".")
        tree, _ = mgr0.restore({"params": params}, tag=args.pretrain_model)
        params = tree["params"]
        print(f"=> loaded pretrain weights from {args.pretrain_model}")

    optim_iters = max(iters // args.update_freq, 1)
    schedule = (args.lr if args.fix_lr else
                cosine_schedule(args.lr, args.lr_end, args.epochs,
                                optim_iters, args.warmup_epochs,
                                args.lr_start))
    tx = make_optimizer(schedule, weight_decay=args.wd,
                        betas=tuple(args.betas), eps=args.eps,
                        clip_grad_value=args.clip_grad_value,
                        clip_grad_type=args.clip_grad_type,
                        update_freq=args.update_freq)
    # logit_scale is frozen unconditionally, like the reference's
    # model.logit_scale.requires_grad = False (:142)
    tx = freeze_by_predicate(tx, logit_scale_only)
    state = TrainState.create(params, tx)

    mgr = CheckpointManager(args.output_dir)
    wandb_run = None
    if args.wandb and jax.process_index() == 0:
        try:
            import wandb as _wandb
            wandb_run = _wandb.init(project="lavila_tpu",
                                    config=vars(args))
        except Exception as e:  # offline image: keep training
            print(f"(wandb unavailable: {e})")
    start_epoch = args.start_epoch
    best_metric = float("-inf")
    # auto-resume: a checkpoint in output_dir wins over --resume
    # (reference main_finetune_retrieval.py:182-217 incl. best_acc1)
    resume = resolve_resume(args.output_dir, args.resume or None)
    if resume:
        print(f"=> resuming from {resume}")
        tree, meta = mgr.restore(
            {"params": state.params, "opt_state": state.opt_state},
            tag=resume)
        state = state.replace(params=tree["params"],
                              opt_state=tree["opt_state"])
        start_epoch = int(meta.get("epoch", -1)) + 1
        best_metric = float(meta.get("metrics", {}).get(
            "best_metric", float("-inf")))

    state = state.replace(params=shard_params(state.params, mesh))
    loss_type = ("clip" if args.dataset.startswith("charades")
                 else args.loss)
    step_fn = jax.jit(make_retrieval_train_step(
        model, loss_type=loss_type, margin=args.margin,
        norm_embed=args.norm_embed), donate_argnums=(0,))

    def run_validation():
        if args.dataset == "ek100_mir":
            from cli.eval_zeroshot import eval_ek100_mir
            out = eval_ek100_mir(
                model, {"params": state.params}, tokenizer, model_name,
                root=args.root, metadata=args.metadata_val,
                clip_length=args.clip_length, clip_stride=args.clip_stride,
                batch_size=args.batch_size, workers=args.workers,
                num_clips=args.num_clips, num_crops=args.num_crops,
                relevancy_path=args.relevancy_path or None)
            return out, out["mAP_avg"]
        if args.dataset in ("charades_ego", "charades_ego_trimmed"):
            out = validate_charades(args, model, {"params": state.params},
                                    tokenizer, model_name)
            return out, out["video_mAP"]
        raise ValueError(
            f"no validation protocol for dataset {args.dataset!r}: this "
            "CLI validates ek100_mir (retrieval mAP/nDCG) or charades_ego "
            "(classification video mAP) — omit --metadata-val to train "
            "without per-epoch validation")

    if args.evaluate:
        out, _ = run_validation()
        print(json.dumps(out))
        return out

    total = 0
    for epoch in range(start_epoch, args.epochs):
        loader.set_epoch(epoch)
        loss_m = AverageMeter("loss", ":.4f")
        timer = Timer()

        def place(batch):
            keys = ["frames", "text"]
            if "mask" in batch:
                keys.append("mask")
            db = {k: np.asarray(batch[k]) for k in keys}
            if loss_type == "adaptive_max_margin":
                db["relevancy"] = np.asarray(batch["relevancy"],
                                             np.float32)
            return shard_batch(db, mesh)

        for it, db in enumerate(device_prefetch(loader, place)):
            state, metrics = step_fn(state, db)
            if it % args.print_freq == 0:
                loss_m.update(float(metrics["loss"]), args.batch_size)
                print(f"Epoch [{epoch}][{it}/{len(loader)}] "
                      f"loss {loss_m.val:.4f} ({loss_m.avg:.4f}) "
                      f"t {timer.lap():.2f}s", flush=True)
                if wandb_run is not None:
                    wandb_run.log({"loss": loss_m.val})
            total += 1
            if args.steps and total >= args.steps:
                break

        val_metrics = {}
        is_best = False
        if args.metadata_val and (epoch + 1) % args.eval_freq == 0:
            val_metrics, key_metric = run_validation()
            if key_metric > best_metric:
                is_best, best_metric = True, key_metric
        # collective save: ALL processes enter (orbax writes sharded
        # leaves per-host; a process-0-only save deadlocks a pod — same
        # contract as cli/main_pretrain.py)
        # best_metric stays out of the sidecar until a validation has
        # run: -inf would serialize as non-strict-JSON -Infinity
        mgr.save({"params": state.params, "opt_state": state.opt_state},
                 epoch=epoch, config=config,
                 metrics={**val_metrics,
                          **({"best_metric": best_metric}
                             if math.isfinite(best_metric) else {})},
                 is_best=is_best,
                 keep_epoch=(epoch + 1) % args.save_freq == 0)
        if jax.process_index() == 0 and val_metrics:
            with open(osp.join(mgr.output_dir, "log.txt"), "a") as f:
                f.write(json.dumps({**val_metrics, "epoch": epoch}) + "\n")
            if wandb_run is not None:
                wandb_run.log({**val_metrics, "epoch": epoch})
        if args.steps and total >= args.steps:
            break
    print("=> done")
    return state


if __name__ == "__main__":
    main(get_args_parser().parse_args())
