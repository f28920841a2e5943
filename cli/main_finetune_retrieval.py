"""Retrieval fine-tuning: EK-100 MIR (adaptive max-margin with relevancy
weights) or CharadesEgo (InfoNCE on trimmed clips).

Equivalent of the reference main_finetune_retrieval.py: rebuilds the
pretrained dual encoder from the checkpoint's embedded config, freezes
the logit scale (reference :142), trains with the margin loss, and
evaluates retrieval mAP/nDCG per epoch.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from lavila_tpu.config import model_kwargs_from_config
from lavila_tpu.data import transforms as T
from lavila_tpu.data.datasets import DatasetConfig, VideoCaptionDataset
from lavila_tpu.data.loader import DataLoader
from lavila_tpu.data.tokenizers import generate_tokenizer
from lavila_tpu.eval import metrics as M
from lavila_tpu.models import build_model
from lavila_tpu.parallel import create_mesh, shard_batch, shard_params
from lavila_tpu.train.optim import cosine_schedule, make_optimizer
from lavila_tpu.train.step import TrainState, make_retrieval_train_step
from lavila_tpu.utils.checkpoints import CheckpointManager, resolve_resume
from lavila_tpu.utils.meters import AverageMeter, Timer
from lavila_tpu.utils.random import random_seed


def get_args_parser():
    p = argparse.ArgumentParser("retrieval fine-tune")
    p.add_argument("--dataset", default="ek100_mir",
                   choices=["ek100_mir", "charades_ego_trimmed",
                            "synthetic"])
    p.add_argument("--root", default="")
    p.add_argument("--metadata", default="")
    p.add_argument("--metadata-val", default="")
    p.add_argument("--pretrain-model", default="")
    p.add_argument("--model", default="CLIP_OPENAI_TIMESFORMER_MINI")
    p.add_argument("--clip-length", type=int, default=16)
    p.add_argument("--clip-stride", type=int, default=4)
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
    p.add_argument("--wd", type=float, default=0.01)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--print-freq", type=int, default=10)
    p.add_argument("--eval-freq", type=int, default=5)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--use-checkpoint", action="store_true")
    p.add_argument("--output-dir", default="./ft_retrieval")
    return p


def main(args):
    random_seed(args.seed, jax.process_index())
    mesh = create_mesh()

    config = {"model": args.model, "clip_length": args.clip_length}
    if args.pretrain_model and osp.exists(args.pretrain_model + ".json"):
        with open(args.pretrain_model + ".json") as f:
            config.update(json.load(f).get("config", {}))
        config["clip_length"] = args.clip_length  # PE inflation handles it

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

    dataset_name = args.dataset
    dcfg = DatasetConfig(dataset=dataset_name, root=args.root,
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

    tx = make_optimizer(cosine_schedule(args.lr, args.lr_end, args.epochs,
                                        iters, args.warmup_epochs,
                                        args.lr_start),
                        weight_decay=args.wd)
    state = TrainState.create(params, tx)
    state = state.replace(params=shard_params(state.params, mesh))
    step_fn = jax.jit(make_retrieval_train_step(
        model, loss_type=args.loss, margin=args.margin,
        norm_embed=args.norm_embed), donate_argnums=(0,))

    mgr = CheckpointManager(args.output_dir)
    total = 0
    for epoch in range(args.epochs):
        loader.set_epoch(epoch)
        loss_m = AverageMeter("loss", ":.4f")
        timer = Timer()
        for it, batch in enumerate(loader):
            keys = ["frames", "text"]
            if "mask" in batch:
                keys.append("mask")
            db = {k: jnp.asarray(batch[k]) for k in keys}
            if args.loss == "adaptive_max_margin":
                db["relevancy"] = jnp.asarray(batch["relevancy"],
                                              jnp.float32)
            db = shard_batch(db, mesh)
            state, metrics = step_fn(state, db)
            if it % args.print_freq == 0:
                loss_m.update(float(metrics["loss"]), args.batch_size)
                print(f"Epoch [{epoch}][{it}/{len(loader)}] "
                      f"loss {loss_m.val:.4f} ({loss_m.avg:.4f}) "
                      f"t {timer.lap():.2f}s", flush=True)
            total += 1
            if args.steps and total >= args.steps:
                break
        if jax.process_index() == 0:
            mgr.save({"params": jax.device_get(state.params)}, epoch=epoch,
                     config=config)
        if (args.metadata_val and args.dataset == "ek100_mir"
                and (epoch + 1) % args.eval_freq == 0):
            # retrieval validation: similarity matrix → graded mAP/nDCG
            from cli.eval_zeroshot import eval_ek100_mir
            eval_ek100_mir(
                model, {"params": state.params}, tokenizer, model_name,
                root=args.root, metadata=args.metadata_val,
                clip_length=args.clip_length, clip_stride=args.clip_stride,
                batch_size=args.batch_size, workers=args.workers)
        if args.steps and total >= args.steps:
            break
    print("=> done")
    return state


if __name__ == "__main__":
    main(get_args_parser().parse_args())
