"""Zero-shot evaluation over the five benchmark families.

Equivalent of the reference eval_zeroshot.py: EK-100 MIR retrieval
(similarity matrix → graded mAP/nDCG), EK-100 CLS / EGTEA / Charades-Ego
zero-shot classification via prompt-ensembled label embeddings with
multi-clip/multi-crop logit pooling, and EgoMCQ. Model identity comes
from the checkpoint's embedded config (checkpoint-as-config,
reference eval_zeroshot.py:68-97).
"""

from __future__ import annotations

import argparse
import json
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from lavila_tpu.config import model_kwargs_from_config
from lavila_tpu.data import transforms as T
from lavila_tpu.data.datasets import (DatasetConfig, VideoCaptionDataset,
                                      VideoClassyDataset, VideoMcqDataset)
from lavila_tpu.data.loader import DataLoader
from lavila_tpu.data.tokenizers import generate_tokenizer
from lavila_tpu.eval import metrics as M
from lavila_tpu.models import build_model
from lavila_tpu.utils.checkpoints import CheckpointManager


def get_args_parser():
    p = argparse.ArgumentParser("zero-shot evaluation")
    p.add_argument("--dataset", default="ek100_mir",
                   choices=["ek100_mir", "ek100_cls", "charades_ego",
                            "egtea", "ego4d_mcq"])
    p.add_argument("--root", default="")
    p.add_argument("--metadata", default="")
    p.add_argument("--metadata-val", default="")
    p.add_argument("--relevancy-path", default="")
    p.add_argument("--checkpoint", required=False, default="")
    p.add_argument("--resume", default="",
                   help="alias for --checkpoint (reference "
                        "eval_zeroshot.py:55)")
    p.add_argument("--output-dir", default="",
                   help="when no --checkpoint/--resume is given, load "
                        "checkpoint_best from here (reference "
                        "eval_zeroshot.py:61-64)")
    p.add_argument("--model", default="CLIP_OPENAI_TIMESFORMER_MINI",
                   help="used when no checkpoint config is available")
    p.add_argument("--clip-length", type=int, default=4)
    p.add_argument("--clip-stride", type=int, default=16)
    p.add_argument("--num-clips", type=int, default=1)
    p.add_argument("--num-crops", type=int, default=1)
    p.add_argument("--sparse-sample", action="store_true",
                   help="evenly-spaced multi-clip sampling over the whole "
                        "video (EGTEA/classification protocol; reference "
                        "eval_zeroshot.py:49)")
    p.add_argument("--narration-selection", default="random",
                   choices=["random", "concat", "list"],
                   help="how list-valued narrations are used; 'list' "
                        "scores every narration and pools. Takes effect "
                        "only when the metadata carries narration LISTS "
                        "(rephraser-style); EPIC csvs carry one "
                        "narration per row, so this is a no-op for "
                        "stock EK-100 metadata")
    p.add_argument("--narration-pool", default="max",
                   choices=["max", "mean"],
                   help="pooling over narrations when "
                        "--narration-selection list")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute + params (the reference's "
                        "--use-half, eval_zeroshot.py:56)")
    p.add_argument("--cls-use-template", action="store_true",
                   help="egocentric prompt templates '#C C {}' / '#C {}' "
                        "for classification label embeddings "
                        "(reference eval_zeroshot.py:134-137)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--print-freq", type=int, default=10)
    p.add_argument("--output-json", default="")
    return p


class _Namespace:
    def __init__(self, d):
        self.__dict__.update(d)


def load_model_from_checkpoint(args):
    """Rebuild the model from the checkpoint's embedded config; fall back
    to --model with fresh init (useful for smoke-testing).

    Checkpoint precedence mirrors the reference (eval_zeroshot.py:61-64):
    explicit path (--checkpoint / --resume) wins, else checkpoint_best
    under --output-dir when one exists."""
    if not args.checkpoint and getattr(args, "resume", ""):
        args.checkpoint = args.resume
    if not args.checkpoint and getattr(args, "output_dir", ""):
        best = osp.join(args.output_dir, "checkpoint_best")
        if osp.exists(best):
            args.checkpoint = best
    config = {}
    if args.checkpoint:
        meta_path = args.checkpoint + ".json"
        if osp.exists(meta_path):
            with open(meta_path) as f:
                config = json.load(f).get("config", {})
    model_name = config.get("model", args.model)
    config.setdefault("model", model_name)
    config.setdefault("clip_length", args.clip_length)
    cfg_ns = _Namespace(config)
    kw = model_kwargs_from_config(cfg_ns)
    if getattr(args, "bf16", False):
        kw["dtype"] = jnp.bfloat16
    model = build_model(model_name, **kw)
    tokenizer = generate_tokenizer(model_name)

    frames = jnp.zeros((1, args.clip_length,) + crop_shape(model_name),
                       jnp.float32)
    text = jnp.zeros((1, 77), jnp.int32)
    params = model.init(jax.random.key(0), frames, text)["params"]
    if args.checkpoint:
        if args.checkpoint.endswith(".pt") or args.checkpoint.endswith(
                ".pth"):
            from lavila_tpu.models import import_torch as imp
            sd = imp.load_torch_state_dict(args.checkpoint)
            nf = config.get("clip_length", args.clip_length)
            # dispatch on model family — the released checkpoints use three
            # key layouts (CLIP text tower / DistilBERT 'textual.*' / VCLM)
            if model_name.startswith("VCLM"):
                params = imp.import_vclm(
                    sd, vis_depth=imp.count_layers(sd, "visual.blocks."),
                    gpt2_layers=imp.count_layers(
                        sd, "text_decoder.transformer.h."),
                    num_frames=nf)
            elif "DISTILBERT" in model_name:
                params = imp.import_video_clip_hf(
                    sd, depth=imp.count_layers(sd, "visual.blocks."),
                    num_frames=nf,
                    projection=("frozen_in_time" if "EGOVLP" in model_name
                                else "default"))
            else:
                params = imp.import_video_clip(sd, num_frames=nf)
        else:
            mgr = CheckpointManager(osp.dirname(args.checkpoint) or ".")
            tree, _ = mgr.restore({"params": params}, tag=args.checkpoint)
            params = tree["params"]
    if getattr(args, "bf16", False):
        from lavila_tpu.utils.precision import cast_params_bf16
        params = cast_params_bf16(params)
    return model, {"params": params}, tokenizer, model_name


def crop_shape(model_name):
    crop = 336 if "336PX" in model_name else (
        64 if "MINI" in model_name else 224)
    return (crop, crop, 3)


def embed_dataset(model, variables, loader, has_mask=False):
    """Encode all (video, text) pairs → L2-normalized embedding arrays
    ``(v, t, n_narrations)``.  Multi-view batches (B, views, T, H, W, C)
    are encoded per view and mean-pooled over normalized view embeddings
    (then re-normalized).  Multiple-narrations batches — text of shape
    (B, n, L) from ``narration_selection='list'`` — are flattened for
    encoding, so ``t`` has B·n rows and ``n_narrations`` = n (reference
    eval_zeroshot.py:316-333 reshapes the similarity matrix to
    (V, V, n) downstream)."""
    enc_i = jax.jit(lambda v, f: model.apply(v, f, method="encode_image"))
    if has_mask:
        enc_t = jax.jit(lambda v, t, m: model.apply(
            v, t, m, method="encode_text"))
    else:
        enc_t = jax.jit(lambda v, t: model.apply(
            v, t, method="encode_text"))
    vids, txts = [], []
    n_narr = 1
    for batch in loader:
        frames = np.asarray(batch["frames"])
        views = 1
        if frames.ndim == 6:
            views = frames.shape[1]
            frames = frames.reshape((-1,) + frames.shape[2:])
        iv = np.array(enc_i(variables, jnp.asarray(frames)), np.float32)
        if views > 1:
            iv /= np.maximum(np.linalg.norm(iv, axis=1, keepdims=True),
                             1e-8)
            iv = iv.reshape(-1, views, iv.shape[-1]).mean(axis=1)
        text = np.asarray(batch["text"])
        mask = np.asarray(batch["mask"]) if has_mask else None
        if text.ndim == 3:  # (B, n_narrations, L)
            if txts and text.shape[1] != n_narr:
                raise ValueError(
                    f"ragged narration lists: batch has {text.shape[1]} "
                    f"narrations/clip but earlier batches had {n_narr}; "
                    "--narration-selection list needs a constant count")
            n_narr = text.shape[1]
            text = text.reshape(-1, text.shape[-1])
            if mask is not None:
                mask = mask.reshape(-1, mask.shape[-1])
        elif n_narr != 1:
            raise ValueError(
                "ragged narration lists: batch has a single narration "
                f"per clip but earlier batches had {n_narr}")
        if has_mask:
            tv = enc_t(variables, jnp.asarray(text), jnp.asarray(mask))
        else:
            tv = enc_t(variables, jnp.asarray(text))
        vids.append(iv)
        txts.append(np.asarray(tv, np.float32))
    v = np.concatenate(vids)
    t = np.concatenate(txts)
    v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-8)
    t /= np.maximum(np.linalg.norm(t, axis=1, keepdims=True), 1e-8)
    return v, t, n_narr


def eval_ek100_mir(model, variables, tokenizer, model_name, *, root,
                   metadata, clip_length, clip_stride, batch_size,
                   workers, num_clips=1, num_crops=1,
                   narration_selection="random", narration_pool="max",
                   relevancy_path=None):
    """EK-100 MIR retrieval eval. Explicit keyword signature so in-train
    probes cannot silently drift from the CLI (no duck-typed namespaces).
    ``num_clips``/``num_crops`` enable the multi-view protocol; per-view
    embeddings are mean-pooled (reference applies Temporal/SpatialCrop to
    the MIR val path, eval_zeroshot.py:117-125).

    Scoring follows the reference's sentence-csv protocol
    (eval_zeroshot.py:174-190): the raw similarity matrix is
    (n_videos x n_videos) — one text column per video row — and the
    relevancy matrix is (n_videos x n_sentences) over the UNIQUE
    sentences, so columns are selected by mapping each sentence id onto
    the video row carrying that narration before mAP/nDCG.

    ``narration_selection='list'`` (multiple narrations per clip) yields
    a (V, V, n) similarity tensor (reference eval_zeroshot.py:316-333)
    that is pooled over narrations with ``narration_pool`` (max/mean)
    before column selection."""
    from lavila_tpu.data.datasets import (load_ek100_mir_relevancy,
                                          load_ek100_video_ids)
    mean, std = T.normalization_for_model(model_name)
    crop = crop_shape(model_name)[0]
    transform = T.EvalTransform(crop, mean, std,
                                num_spatial_crops=num_crops,
                                num_temporal_clips=num_clips,
                                frames_per_clip=clip_length)
    dcfg = DatasetConfig(dataset="ek100_mir", root=root,
                         metadata=metadata,
                         clip_length=clip_length,
                         clip_stride=clip_stride,
                         num_clips=num_clips,
                         narration_selection=narration_selection,
                         relevancy_path=relevancy_path)
    ds = VideoCaptionDataset(dcfg, transform, tokenizer, is_training=False)
    loader = DataLoader(ds, batch_size, shuffle=False, drop_last=False,
                        num_workers=workers)
    v, t, n_narr = embed_dataset(model, variables, loader,
                                 has_mask="DISTILBERT" in model_name)
    sim = v @ t.T
    if n_narr > 1:  # (V, V·n) → (V, V, n) → pool over narrations
        sim = sim.reshape(v.shape[0], v.shape[0], n_narr)
        sim = sim.max(axis=2) if narration_pool == "max" else \
            sim.mean(axis=2)
    sim = (sim + 1) / 2  # rescale (reference eval_zeroshot.py:174)
    mir = load_ek100_mir_relevancy(metadata, relevancy_path)
    video_ids = load_ek100_video_ids(metadata)
    # reference eval_zeroshot.py:176-179: one column per unique sentence,
    # taken from the video row whose narration id matches
    row_of = {}
    for k, vid in enumerate(video_ids):
        row_of.setdefault(vid, k)  # first occurrence wins, like the
        # reference's video_id.tolist().index(elem)
    missing = [sid for sid in mir.sentence_ids if sid not in row_of]
    if missing:
        raise ValueError(
            f"{len(missing)} sentence ids absent from the metadata csv "
            f"(e.g. {missing[:3]}): sentence csv / metadata csv disagree")
    indexes = [row_of[sid] for sid in mir.sentence_ids]
    sim = sim[:, indexes]
    rel = mir.rel
    if sim.shape != rel.shape:
        raise ValueError(
            f"similarity {sim.shape} vs relevancy {rel.shape}: metadata "
            "csv / sentence csv / relevancy pkl disagree")
    v_map, t_map, avg_map = M.retrieval_map(sim, rel)
    v_ndcg, t_ndcg, avg_ndcg = M.retrieval_ndcg(sim, rel)
    out = {"mAP_v2t": v_map, "mAP_t2v": t_map, "mAP_avg": avg_map,
           "nDCG_v2t": v_ndcg, "nDCG_t2v": t_ndcg, "nDCG_avg": avg_ndcg}
    print(json.dumps(out))
    return out


def build_label_embeddings(model, variables, tokenizer, labels,
                           has_mask=False, templates=("{}",)):
    """Prompt-ensembled class text embeddings: each label may be a list of
    narrations and is expanded through ``templates``; member embeddings
    are averaged (reference eval_zeroshot.py:216-240; the egocentric
    templates '#C C {}'/'#C {}' are the reference's --cls-use-template,
    eval_zeroshot.py:134-137)."""
    enc_t_mask = jax.jit(lambda v, t, m: model.apply(
        v, t, m, method="encode_text"))
    enc_t = jax.jit(lambda v, t: model.apply(v, t, method="encode_text"))
    out = []
    for label in labels:
        members = label if isinstance(label, list) else [label]
        variants = [t.format(m) for t in templates for m in members]
        toks = tokenizer(variants)
        if isinstance(toks, tuple):
            emb = enc_t_mask(variables, jnp.asarray(toks[0]),
                             jnp.asarray(toks[1]))
        else:
            emb = enc_t(variables, jnp.asarray(toks))
        emb = np.array(emb, np.float32)
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-8)
        out.append(emb.mean(axis=0))
    out = np.stack(out)
    out /= np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-8)
    return out


def eval_classification(args, model, variables, tokenizer, model_name,
                        labels, label_mapping, multilabel=False):
    mean, std = T.normalization_for_model(model_name)
    crop = crop_shape(model_name)[0]
    transform = T.EvalTransform(crop, mean, std,
                                num_spatial_crops=args.num_crops,
                                num_temporal_clips=args.num_clips,
                                frames_per_clip=args.clip_length)
    dcfg = DatasetConfig(dataset=args.dataset, root=args.root,
                         metadata=args.metadata_val or args.metadata,
                         clip_length=args.clip_length,
                         clip_stride=args.clip_stride,
                         num_clips=args.num_clips,
                         sparse_sample=args.sparse_sample,
                         is_trimmed=args.dataset != "charades_ego")
    ds = VideoClassyDataset(dcfg, transform, label_mapping,
                            is_training=False)
    loader = DataLoader(ds, args.batch_size, shuffle=False, drop_last=False,
                        num_workers=args.workers)
    templates = (("#C C {}", "#C {}")
                 if getattr(args, "cls_use_template", False) else ("{}",))
    class_emb = build_label_embeddings(
        model, variables, tokenizer, labels,
        has_mask="DISTILBERT" in model_name, templates=templates)

    enc_i = jax.jit(lambda v, f: model.apply(v, f, method="encode_image"))
    all_logits, all_labels = [], []
    for batch in loader:
        frames = np.asarray(batch["frames"])
        views = 1
        if frames.ndim == 6:  # (B, views, T, H, W, C): crops and/or clips
            views = frames.shape[1]
            frames = frames.reshape((-1,) + frames.shape[2:])
        emb = np.array(enc_i(variables, jnp.asarray(frames)), np.float32)
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-8)
        logits = emb @ class_emb.T
        if views > 1:
            logits = logits.reshape(-1, views, logits.shape[-1])
            logits = logits.max(axis=1)  # max-pool views (reference :268)
        all_logits.append(logits)
        all_labels.append(np.asarray(batch["label"]))
    logits = np.concatenate(all_logits)
    labels_arr = np.concatenate(all_labels)
    if multilabel:
        mAP, _ = M.multilabel_map(logits, labels_arr)
        out = {"video_mAP": mAP}
    elif args.dataset == "egtea":
        preds = logits.argmax(axis=1)
        cm = M.confusion_matrix(preds, labels_arr, len(labels))
        mean_acc, overall = M.mean_class_accuracy(cm)
        out = {"mean_class_acc": mean_acc, "acc": overall}
    else:
        acc1, acc5 = M.topk_accuracy(logits, labels_arr, ks=(1, 5))
        out = {"acc1": acc1, "acc5": acc5}
    print(json.dumps(out))
    return out


def eval_mcq(args, model, variables, tokenizer, model_name):
    mean, std = T.normalization_for_model(model_name)
    crop = crop_shape(model_name)[0]
    transform = T.EvalTransform(crop, mean, std)
    dcfg = DatasetConfig(dataset="ego4d_mcq", root=args.root,
                         metadata=args.metadata,
                         clip_length=args.clip_length,
                         clip_stride=args.clip_stride)
    ds = VideoMcqDataset(dcfg, transform, tokenizer, is_training=False)
    loader = DataLoader(ds, args.batch_size, shuffle=False, drop_last=False,
                        num_workers=args.workers)
    enc_i = jax.jit(lambda v, f: model.apply(v, f, method="encode_image"))
    has_mask = "DISTILBERT" in model_name
    if has_mask:
        enc_t = jax.jit(lambda v, t, m: model.apply(
            v, t, m, method="encode_text"))
    else:
        enc_t = jax.jit(lambda v, t: model.apply(
            v, t, method="encode_text"))
    preds, answers, types = [], [], []
    for batch in loader:
        B, O = batch["frames_options"].shape[:2]
        frames = jnp.asarray(batch["frames_options"].reshape(
            (-1,) + batch["frames_options"].shape[2:]))
        vemb = np.array(enc_i(variables, frames), np.float32)
        vemb /= np.maximum(np.linalg.norm(vemb, axis=1, keepdims=True),
                           1e-8)
        if has_mask:
            qemb = np.array(enc_t(variables, jnp.asarray(batch["query"]),
                                   jnp.asarray(batch["query_mask"])))
        else:
            qemb = np.array(enc_t(variables, jnp.asarray(batch["query"])))
        qemb = qemb / np.maximum(
            np.linalg.norm(qemb, axis=1, keepdims=True), 1e-8)
        sim = np.einsum("bd,bod->bo", qemb, vemb.reshape(B, O, -1))
        preds.append(sim)
        answers.append(np.asarray(batch["answer"]))
        types.append(np.asarray(batch["type"]))
    out = M.egomcq_accuracy(np.concatenate(preds), np.concatenate(answers),
                            np.concatenate(types))
    print(json.dumps(out))
    return out


def main(args):
    model, variables, tokenizer, model_name = load_model_from_checkpoint(
        args)
    if args.dataset == "ek100_mir":
        out = eval_ek100_mir(
            model, variables, tokenizer, model_name, root=args.root,
            metadata=args.metadata, clip_length=args.clip_length,
            clip_stride=args.clip_stride, batch_size=args.batch_size,
            workers=args.workers, num_clips=args.num_clips,
            num_crops=args.num_crops,
            narration_selection=args.narration_selection,
            narration_pool=args.narration_pool,
            relevancy_path=args.relevancy_path or None)
    elif args.dataset == "ego4d_mcq":
        out = eval_mcq(args, model, variables, tokenizer, model_name)
    elif args.dataset in ("ek100_cls", "egtea", "charades_ego"):
        from lavila_tpu.data.label_maps import generate_label_map
        labels, mapping = generate_label_map(args.dataset,
                                             metadata=args.metadata)
        out = eval_classification(
            args, model, variables, tokenizer, model_name, labels, mapping,
            multilabel=args.dataset == "charades_ego")
    else:
        raise NotImplementedError(args.dataset)
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(out, f)
    return out


if __name__ == "__main__":
    main(get_args_parser().parse_args())
