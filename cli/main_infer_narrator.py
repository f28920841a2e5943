"""Distributed narrator inference: pseudo-label clips at scale.

Equivalent of the reference main_infer_narrator.py: the dataset is
sharded across hosts, each host writes ``cache.{rank}.pkl`` of
(video_uid, t_start, t_end, captions, ppls) records, and host 0 merges
round-robin into ``total.pkl`` — the exact output contract the pretrain
SSL path consumes (reference main_infer_narrator.py:141-251).

Decode itself is the TPU-cached ``generate`` (scan + KV cache), batched
across clips × return sequences.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from lavila_tpu.data import transforms as T
from lavila_tpu.data.datasets import DatasetConfig, VideoCaptionDataset
from lavila_tpu.data.loader import DataLoader
from lavila_tpu.data.tokenizers import generate_tokenizer
from lavila_tpu.models import build_model


def get_args_parser():
    p = argparse.ArgumentParser("narrator inference / pseudo-labeling")
    p.add_argument("--dataset", default="ego4d")
    p.add_argument("--root", default="datasets/Ego4D/video_288px")
    p.add_argument("--metadata", default="datasets/Ego4D/ego4d_train.pkl")
    p.add_argument("--checkpoint", "--resume", dest="checkpoint",
                   default="",
                   help="narrator checkpoint (reference --resume, "
                        "main_infer_narrator.py:84-85)")
    p.add_argument("--model",
                   default="VCLM_OPENAI_TIMESFORMER_MINI_GPT2_MINI")
    p.add_argument("--clip-length", type=int, default=4)
    p.add_argument("--clip-stride", type=int, default=16,
                   help="reference --clip-stride "
                        "(main_infer_narrator.py:43)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--decoding", default="sample",
                   choices=["sample", "beam_sample", "group_beam"],
                   help="reference --caption-sample "
                        "(multinomial_sample / beam_sample / "
                        "group_beam_search, main_infer_narrator.py:54, "
                        ":177-215)")
    p.add_argument("--num-return-sequences", type=int, default=10)
    p.add_argument("--num-beams", type=int, default=3,
                   help="reference --caption-num-beams")
    p.add_argument("--num-beam-groups", type=int, default=3,
                   help="for --decoding group_beam (reference "
                        "--caption-num-beam-groups); must be > 1 and "
                        "divide --num-beams")
    p.add_argument("--length-penalty", type=float, default=1.0,
                   help="reference --caption-length-penalty")
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--top-p", type=float, default=0.95)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--max-text-length", type=int, default=77,
                   help="reference --caption-max-len")
    p.add_argument("--early-stop", action="store_true",
                   help="accepted for reference parity "
                        "(--caption-early-stop): decode always exits at "
                        "batch-max EOS here, with identical outputs")
    p.add_argument("--print-freq", type=int, default=10)
    p.add_argument("--max-samples", type=int, default=0)
    p.add_argument("--output-dir", default="/tmp/narrator_out")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute + params (the reference's "
                        "--use-half, main_infer_narrator.py:49; halves "
                        "the decode weight stream — docs/PERF.md). "
                        "Batches >= 128 additionally get the "
                        "lane-filling decode formulation")
    return p


def main(args):
    rank = jax.process_index()
    world = jax.process_count()
    os.makedirs(args.output_dir, exist_ok=True)

    model = build_model(args.model, num_frames=args.clip_length,
                        gated_xattn=True,
                        **({"dtype": jnp.bfloat16} if args.bf16 else {}))
    crop = 336 if "336PX" in args.model else (
        64 if "MINI" in args.model else 224)
    transform = T.EvalTransform(crop, *T.normalization_for_model(args.model))

    dcfg = DatasetConfig(dataset=args.dataset, root=args.root,
                         metadata=args.metadata,
                         clip_length=args.clip_length,
                         clip_stride=args.clip_stride)
    ds = VideoCaptionDataset(dcfg, transform, tokenizer=None,
                             is_training=False)
    samples_meta = ds.samples
    if args.max_samples:
        ds.samples = ds.samples[:args.max_samples]
        samples_meta = ds.samples
    # with_indices: each batch carries the global dataset indices of its
    # samples, so (video_uid, caption) pairing survives any shuffle /
    # drop_last change — no fragile sampler re-iteration.
    loader = DataLoader(ds, args.batch_size, shuffle=False, drop_last=False,
                        num_workers=args.workers, shard_index=rank,
                        num_shards=world, with_indices=True)

    frames0 = jnp.zeros((1, args.clip_length, crop, crop, 3), jnp.float32)
    text0 = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.key(args.seed), frames0, text0)["params"]
    if args.checkpoint:
        from lavila_tpu.models import import_torch as imp
        if args.checkpoint.endswith((".pt", ".pth")):
            sd = imp.load_torch_state_dict(args.checkpoint)
            # depths counted from the checkpoint itself, never guessed
            # from the model name (cli/eval_zeroshot.py does the same)
            params = imp.import_vclm(
                sd, vis_depth=imp.count_layers(sd, "visual.blocks."),
                gpt2_layers=imp.count_layers(
                    sd, "text_decoder.transformer.h."),
                num_frames=args.clip_length)
        else:
            from lavila_tpu.utils.checkpoints import CheckpointManager
            mgr = CheckpointManager(osp.dirname(args.checkpoint) or ".")
            tree, _ = mgr.restore({"params": params}, tag=args.checkpoint)
            params = tree["params"]
    if args.bf16:
        from lavila_tpu.utils.precision import cast_params_bf16
        params = cast_params_bf16(params)
    variables = {"params": params}

    try:
        tok = generate_tokenizer(args.model)
        decode = tok.decode
        bos, eos, pad = tok.bos_token_id, tok.eos_token_id, tok.pad_token_id
    except (FileNotFoundError, OSError):
        decode = lambda ids: " ".join(map(str, ids))  # noqa: E731
        bos, eos, pad = 50256, 50256, 0

    encode_image = jax.jit(
        lambda v, f: model.apply(v, f, method="encode_image"))

    def gen(v, toks, key):
        return model.apply(
            v, toks, rng=key, bos_id=bos, eos_id=eos, pad_id=pad,
            max_text_length=args.max_text_length,
            temperature=args.temperature,
            top_k=args.top_k or None, top_p=args.top_p,
            num_return_sequences=args.num_return_sequences,
            method="generate")

    gen = jax.jit(gen)
    dec = None
    if args.decoding != "sample":
        # beam pseudo-labeling (reference main_infer_narrator.py:189-215);
        # the stored per-caption scores are the beam joint scores, like
        # the reference's beam 'ppls'
        from lavila_tpu.models.beam import BeamDecoder
        if args.decoding == "group_beam" and not (
                args.num_beam_groups > 1
                and args.num_beams % args.num_beam_groups == 0):
            raise SystemExit(
                "--decoding group_beam needs --num-beam-groups > 1 "
                "dividing --num-beams (reference "
                "main_infer_narrator.py:203)")
        dec = BeamDecoder(model, variables, bos_id=bos, eos_id=eos,
                          pad_id=pad, max_text_length=args.max_text_length)

    key = jax.random.key(args.seed + rank)
    beam_rng = np.random.default_rng(args.seed + rank)
    records = []
    for bi, batch in enumerate(loader):
        toks = encode_image(variables, jnp.asarray(batch["frames"]))
        key, sub = jax.random.split(key)
        if args.decoding == "sample":
            ids, ppls = gen(variables, toks, sub)
        elif args.decoding == "beam_sample":
            ids, ppls = dec.beam_sample(
                toks, rng=beam_rng, num_beams=args.num_beams,
                temperature=args.temperature, top_p=args.top_p,
                top_k=args.top_k or None,
                length_penalty=args.length_penalty,
                num_return_sequences=args.num_return_sequences)
        else:
            ids, ppls = dec.group_beam_search(
                toks, num_beams=args.num_beams,
                num_beam_groups=args.num_beam_groups,
                temperature=args.temperature, top_p=args.top_p,
                top_k=args.top_k or None,
                length_penalty=args.length_penalty,
                num_return_sequences=args.num_return_sequences)
        ids = np.asarray(ids)
        ppls = np.asarray(ppls)
        n = batch["frames"].shape[0]
        for j in range(n):
            gi = int(batch["index"][j])
            meta = samples_meta[gi]
            caps = []
            for r in range(args.num_return_sequences):
                row = list(ids[j * args.num_return_sequences + r][1:])
                if eos in row:
                    row = row[:row.index(eos)]
                caps.append(decode(row))
            pp = ppls[j * args.num_return_sequences:
                      (j + 1) * args.num_return_sequences].tolist()
            records.append((meta[0], meta[1], meta[2], caps, pp))
        if bi % args.print_freq == 0:
            print(f"[rank {rank}] {bi}/{len(loader)}", flush=True)

    shard_path = osp.join(args.output_dir, f"cache.{rank}.pkl")
    with open(shard_path, "wb") as f:
        pickle.dump(records, f)
    print(f"[rank {rank}] wrote {len(records)} records -> {shard_path}")

    # barrier + rank-0 round-robin merge (reference :232-251)
    if world > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("narrator_shards")
    if rank == 0:
        shards = []
        for r in range(world):
            with open(osp.join(args.output_dir, f"cache.{r}.pkl"),
                      "rb") as f:
                shards.append(pickle.load(f))
        merged = []
        for i in range(max(len(s) for s in shards)):
            for s in shards:
                if i < len(s):
                    merged.append(s[i])
        total = osp.join(args.output_dir, "total.pkl")
        with open(total, "wb") as f:
            pickle.dump(merged, f)
        print(f"merged {len(merged)} records -> {total}")
    return records


if __name__ == "__main__":
    main(get_args_parser().parse_args())
