"""Classification fine-tuning: linear/multi-head probe over the
pretrained video tower.

Equivalent of the reference main_finetune_classification.py: wraps the
pretrained visual tower in VideoClassifier[MultiHead], separate LR for
head vs backbone (reference :189-209 --lr-multiplier-on-backbone), CE with
label smoothing, multi-clip/multi-crop validation with softmax averaging
and EK-100 verb/noun marginalization (reference :543-709).
"""

from __future__ import annotations

import argparse
import json
import math
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lavila_tpu.config import model_kwargs_from_config
from lavila_tpu.data import transforms as T
from lavila_tpu.data.datasets import DatasetConfig, VideoClassyDataset
from lavila_tpu.data.label_maps import actions_to_parts, generate_label_map
from lavila_tpu.data.loader import DataLoader, device_prefetch
from lavila_tpu.eval import metrics as M
from lavila_tpu.models import build_model
from lavila_tpu.models.dual_encoder import (VideoClassifier,
                                            VideoClassifierMultiHead)
from lavila_tpu.parallel import create_mesh, shard_batch, shard_params
from lavila_tpu.train.optim import (cosine_schedule, lr_multiplier_labels,
                                    make_optimizer, wd_mask)
from lavila_tpu.train.step import TrainState, make_classifier_train_step
from lavila_tpu.utils.checkpoints import CheckpointManager, resolve_resume
from lavila_tpu.utils.meters import AverageMeter, Timer
from lavila_tpu.utils.random import random_seed


def get_args_parser():
    p = argparse.ArgumentParser("classification fine-tune")
    p.add_argument("--dataset", default="ek100_cls",
                   choices=["ek100_cls", "egtea", "charades_ego",
                            "synthetic"])
    p.add_argument("--root", default="")
    p.add_argument("--metadata-train", default="")
    p.add_argument("--metadata-val", default="")
    p.add_argument("--label-metadata", default="")
    p.add_argument("--pretrain-model", default="")
    p.add_argument("--resume", default="")
    p.add_argument("--model", default="CLIP_OPENAI_TIMESFORMER_MINI")
    p.add_argument("--num-classes", type=int, default=0)
    p.add_argument("--use-vn-classifier", action="store_true",
                   help="verb+noun+action multi-head (EK-100)")
    p.add_argument("--clip-length", type=int, default=16)
    p.add_argument("--clip-stride", type=int, default=2)
    p.add_argument("--num-clips", type=int, default=1)
    p.add_argument("--num-crops", type=int, default=1)
    p.add_argument("--sparse-sample", action="store_true")
    p.add_argument("--dropout", "--dropout-ratio", dest="dropout",
                   type=float, default=0.5,
                   help="head dropout (reference --dropout-ratio, "
                        "main_finetune_classification.py:71)")
    p.add_argument("--drop-path-rate", type=float, default=0.1,
                   help="stochastic depth for fine-tuning (reference "
                        ":70,154 — the finetune value, not the pretrain "
                        "config's)")
    p.add_argument("--remat-policy", default="full",
                   choices=("full", "dots", "save_attn", "dots_attn"))
    p.add_argument("--use-checkpoint", action="store_true",
                   help="activation remat on the backbone")
    p.add_argument("--label-smoothing", type=float, default=0.1)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--warmup-epochs", type=int, default=2)
    p.add_argument("--start-epoch", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--lr-end", type=float, default=1e-5)
    p.add_argument("--lr-start", type=float, default=1e-6,
                   help="warmup start lr (reference :354-356)")
    p.add_argument("--fix-lr", action="store_true",
                   help="constant lr, no schedule (reference :350-352)")
    p.add_argument("--lr-multiplier-on-backbone", type=float, default=0.1)
    p.add_argument("--wd", type=float, default=1e-4)
    p.add_argument("--betas", nargs=2, type=float, default=(0.9, 0.999))
    p.add_argument("--eps", type=float, default=1e-8)
    p.add_argument("--update-freq", type=int, default=1,
                   help="gradient accumulation steps")
    p.add_argument("--clip-grad-type", default="norm",
                   choices=["norm", "value"])
    p.add_argument("--clip-grad-value", type=float, default=None)
    p.add_argument("--use-sgd", action="store_true")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--freeze-temperature", action="store_true",
                   help="accepted for reference parity; parsed but "
                        "unused there too (no logit_scale in the "
                        "classifier, main_finetune_classification.py:104)")
    p.add_argument("--relevancy-path", default="",
                   help="accepted for reference parity; parsed but "
                        "unused there too (classification has no "
                        "relevancy matrix)")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--print-freq", type=int, default=10)
    p.add_argument("--eval-freq", type=int, default=1)
    p.add_argument("--save-freq", type=int, default=1)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--evaluate", action="store_true",
                   help="validate once and exit (reference "
                        "main_finetune_classification.py:330-340)")
    p.add_argument("--output-dir", default="./ft_cls")
    return p


def build_classifier(args, num_classes_or_list, config):
    class NS:
        def __init__(self, d):
            self.__dict__.update(d)

    base = build_model(config["model"],
                       **model_kwargs_from_config(NS(config)))
    vision = base.vision_model
    if args.use_vn_classifier:
        return VideoClassifierMultiHead(
            vision_model=vision, num_classes_list=num_classes_or_list,
            dropout=args.dropout), base
    return VideoClassifier(vision_model=vision,
                           num_classes=num_classes_or_list,
                           dropout=args.dropout), base


def validate(args, clf, params, mapping, num_classes, multihead_parts,
             model_name, labels):
    """Multi-clip / multi-crop validation with softmax averaging over
    views, plus EK-100 verb/noun marginalization
    (reference main_finetune_classification.py:543-709)."""
    crop = 336 if "336PX" in model_name else (
        64 if "MINI" in model_name else 224)
    mean, std = T.normalization_for_model(model_name)
    transform = T.EvalTransform(crop, mean, std,
                                num_spatial_crops=args.num_crops)
    dcfg = DatasetConfig(
        dataset=args.dataset, root=args.root, metadata=args.metadata_val,
        clip_length=args.clip_length, clip_stride=args.clip_stride,
        num_clips=args.num_clips, sparse_sample=args.sparse_sample,
        is_trimmed=args.dataset != "charades_ego")
    ds = VideoClassyDataset(dcfg, transform, mapping, is_training=False)
    loader = DataLoader(ds, args.batch_size, shuffle=False, drop_last=False,
                        num_workers=args.workers)
    fwd = jax.jit(lambda p, f: clf.apply({"params": p}, f))
    probs_all, labels_all = [], []
    for batch in loader:
        frames = np.asarray(batch["frames"])
        views = 1
        if frames.ndim == 6:
            views = frames.shape[1]
            frames = frames.reshape((-1,) + frames.shape[2:])
        outs = fwd(params, jnp.asarray(frames))
        if args.use_vn_classifier:
            outs = outs[-1]  # action head; verb/noun via marginalization
        probs = np.asarray(jax.nn.softmax(outs.astype(jnp.float32), -1))
        if views > 1:
            probs = probs.reshape(-1, views, probs.shape[-1]).mean(axis=1)
        probs_all.append(probs)
        labels_all.append(np.asarray(batch["label"]))
    probs = np.concatenate(probs_all)
    labels_arr = np.concatenate(labels_all)
    if args.dataset == "charades_ego":
        mAP, _ = M.multilabel_map(probs, labels_arr)
        return {"video_mAP": mAP}
    out = {}
    acc1, acc5 = M.topk_accuracy(probs, labels_arr, ks=(1, 5))
    out["acc1"], out["acc5"] = acc1, acc5
    if args.dataset == "egtea":
        cm = M.confusion_matrix(probs.argmax(1), labels_arr, num_classes)
        out["mean_class_acc"], _ = M.mean_class_accuracy(cm)
    if multihead_parts is not None:
        vi = M.marginal_indexes(multihead_parts, 0)
        ni = M.marginal_indexes(multihead_parts, 1)
        vprob = M.marginalize(probs, vi)
        nprob = M.marginalize(probs, ni)
        out["verb_acc1"] = M.topk_accuracy(
            vprob, multihead_parts[labels_arr, 0], ks=(1,))[0]
        out["noun_acc1"] = M.topk_accuracy(
            nprob, multihead_parts[labels_arr, 1], ks=(1,))[0]
    return out


def main(args):
    random_seed(args.seed, jax.process_index())
    mesh = create_mesh()

    config = {"model": args.model, "clip_length": args.clip_length}
    if args.pretrain_model and osp.exists(args.pretrain_model + ".json"):
        with open(args.pretrain_model + ".json") as f:
            config.update(json.load(f).get("config", {}))
        config["clip_length"] = args.clip_length
    # the finetune recipe's values win over the pretrain config's
    # (reference rebuilds with args.drop_path_rate, :154)
    config["drop_path_rate"] = args.drop_path_rate
    config["use_checkpoint"] = args.use_checkpoint
    config["remat_policy"] = args.remat_policy
    model_name = config["model"]

    # label space
    multihead_parts = None
    if args.dataset == "synthetic":
        labels = [f"class {i}" for i in range(args.num_classes or 10)]
        mapping = None
        num_classes = len(labels)
    else:
        labels, mapping = generate_label_map(
            args.dataset, metadata=args.label_metadata or
            args.metadata_train)
        num_classes = len(labels)
    if args.dataset == "ek100_cls":
        multihead_parts = actions_to_parts(mapping)
    if args.use_vn_classifier:
        assert args.dataset == "ek100_cls"
        n_verb = int(multihead_parts[:, 0].max()) + 1
        n_noun = int(multihead_parts[:, 1].max()) + 1
        num_classes_or_list = [n_verb, n_noun, num_classes]
    else:
        num_classes_or_list = num_classes

    clf, base = build_classifier(args, num_classes_or_list, config)

    crop = 336 if "336PX" in model_name else (
        64 if "MINI" in model_name else 224)
    mean, std = T.normalization_for_model(model_name)
    train_transform = T.TrainTransform(crop, mean, std, flip=True)

    if args.dataset == "synthetic":
        from lavila_tpu.data.datasets import VideoCaptionDataset

        class SynthClassy(VideoCaptionDataset):
            def __getitem__(self, i):
                item = super().__getitem__(i)
                return {"frames": item["frames"],
                        "label": np.int32(i % num_classes)}

        dcfg = DatasetConfig(dataset="synthetic", root="", metadata="",
                             clip_length=args.clip_length)
        ds = SynthClassy(dcfg, train_transform, tokenizer=None, seed=0)
    else:
        dcfg = DatasetConfig(
            dataset=args.dataset, root=args.root,
            metadata=args.metadata_train, clip_length=args.clip_length,
            clip_stride=args.clip_stride, num_clips=args.num_clips,
            sparse_sample=args.sparse_sample)
        ds = VideoClassyDataset(dcfg, train_transform, mapping,
                                is_training=True, seed=args.seed)
    loader = DataLoader(ds, args.batch_size, shuffle=True, drop_last=True,
                        num_workers=args.workers,
                        shard_index=jax.process_index(),
                        num_shards=jax.process_count(), seed=args.seed)
    iters = max(len(loader), 1)

    sample = next(iter(loader))
    params = clf.init(
        {"params": jax.random.key(args.seed),
         "dropout": jax.random.key(1)},
        jnp.asarray(sample["frames"][:1]))["params"]

    if args.pretrain_model:
        # load pretrained dual-encoder weights into the vision tower
        mgr0 = CheckpointManager(osp.dirname(args.pretrain_model) or ".")
        dummy_f = jnp.zeros((1, args.clip_length, crop, crop, 3))
        dummy_t = jnp.zeros((1, 77), jnp.int32)
        base_params = base.init(jax.random.key(0), dummy_f,
                                dummy_t)["params"]
        tree, _ = mgr0.restore({"params": base_params},
                               tag=args.pretrain_model)
        params = dict(params)
        params["vision_model"] = tree["params"]["vision_model"]
        print(f"=> loaded visual tower from {args.pretrain_model}")

    # backbone vs head LR groups (reference --lr-multiplier-on-backbone)
    optim_iters = max(iters // args.update_freq, 1)
    if args.fix_lr:
        sched_head = args.lr
        sched_bb = args.lr * args.lr_multiplier_on_backbone
    else:
        sched_head = cosine_schedule(args.lr, args.lr_end, args.epochs,
                                     optim_iters, args.warmup_epochs,
                                     args.lr_start)
        sched_bb = cosine_schedule(args.lr * args.lr_multiplier_on_backbone,
                                   args.lr_end, args.epochs, optim_iters,
                                   args.warmup_epochs, args.lr_start)
    opt_kw = dict(weight_decay=args.wd, betas=tuple(args.betas),
                  eps=args.eps, clip_grad_value=args.clip_grad_value,
                  clip_grad_type=args.clip_grad_type,
                  use_sgd=args.use_sgd)
    tx = optax.multi_transform(
        {"head": make_optimizer(sched_head, **opt_kw),
         "backbone": make_optimizer(sched_bb, **opt_kw)},
        lr_multiplier_labels)
    if args.update_freq > 1:
        # accumulate OUTSIDE multi_transform so both groups step on the
        # same optimizer-iteration boundary
        tx = optax.MultiSteps(tx, every_k_schedule=args.update_freq)
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
    # auto-resume over --resume, best metric restored (reference
    # main_finetune_classification.py:252-287 best_acc1 contract)
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

    def with_multihead_labels(batch):
        lab = np.asarray(batch["label"])
        if args.use_vn_classifier:
            verbs = multihead_parts[lab, 0]
            nouns = multihead_parts[lab, 1]
            return {"frames": jnp.asarray(batch["frames"]),
                    "labels": (jnp.asarray(verbs), jnp.asarray(nouns),
                               jnp.asarray(lab))}
        return {"frames": jnp.asarray(batch["frames"]),
                "label": jnp.asarray(lab)}

    step_fn = jax.jit(make_classifier_train_step(
        clf, multihead=args.use_vn_classifier,
        label_smoothing=args.label_smoothing), donate_argnums=(0,))

    if args.evaluate:
        val_metrics = validate(args, clf, state.params, mapping,
                               num_classes, multihead_parts, model_name,
                               labels)
        print(json.dumps(val_metrics))
        return val_metrics

    rng = jax.random.key(args.seed + 7)
    total = 0
    for epoch in range(start_epoch, args.epochs):
        loader.set_epoch(epoch)
        loss_m = AverageMeter("loss", ":.4f")
        acc_m = AverageMeter("acc1", ":.2f")
        timer = Timer()
        for it, db in enumerate(device_prefetch(
                loader, lambda b: shard_batch(with_multihead_labels(b),
                                              mesh))):
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, db, sub)
            if it % args.print_freq == 0:
                loss_m.update(float(metrics["loss"]), args.batch_size)
                acc_m.update(float(metrics["acc1"]), args.batch_size)
                print(f"Epoch [{epoch}][{it}/{len(loader)}] "
                      f"loss {loss_m.avg:.4f} acc1 {acc_m.avg:.2f} "
                      f"t {timer.lap():.2f}s", flush=True)
                if wandb_run is not None:
                    wandb_run.log({"loss": loss_m.val, "acc1": acc_m.val})
            total += 1
            if args.steps and total >= args.steps:
                break
        # per-epoch validation (reference main_finetune_classification.py
        # :416+ validates every epoch and tracks best_acc1)
        val_metrics = {}
        is_best = False
        if (args.metadata_val and args.dataset != "synthetic"
                and (epoch + 1) % args.eval_freq == 0):
            val_metrics = validate(args, clf, state.params, mapping,
                                   num_classes, multihead_parts,
                                   model_name, labels)
            print(json.dumps(val_metrics))
            key = val_metrics.get("video_mAP",
                                  val_metrics.get("acc1", float("-inf")))
            if key > best_metric:
                is_best, best_metric = True, key
        # collective save: ALL processes enter (orbax writes sharded
        # leaves per-host; process-0-only saving deadlocks a pod — same
        # contract as cli/main_pretrain.py)
        mgr.save({"params": state.params, "opt_state": state.opt_state},
                 epoch=epoch,
                 config={**config, "num_classes": num_classes},
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
