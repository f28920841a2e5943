"""Narrator evaluation: teacher-forced PPL + free decoding + NLG metrics.

Equivalent of the reference eval_narrator.py: per clip, (a) teacher-forced
perplexity against the human narration, (b) free-running generation with
the chosen decoding strategy, then corpus BLEU/METEOR/ROUGE-L/CIDEr
(reference eval_narrator.py:172-301; nlg-eval replaced by the offline
implementations in lavila_tpu.eval.nlg).
"""

from __future__ import annotations

import argparse
import json
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from lavila_tpu.data import transforms as T
from lavila_tpu.data.datasets import DatasetConfig, VideoCaptionDataset
from lavila_tpu.data.loader import DataLoader
from lavila_tpu.data.tokenizers import generate_tokenizer
from lavila_tpu.eval.nlg import bert_style_normalize, nlg_scores
from lavila_tpu.models import build_model
from lavila_tpu.models.beam import BeamDecoder


def get_args_parser():
    p = argparse.ArgumentParser("narrator evaluation")
    p.add_argument("--dataset", default="ego4d")
    p.add_argument("--root", default="")
    p.add_argument("--metadata", "--metadata-val", dest="metadata",
                   default="",
                   help="val metadata pkl (reference --metadata-val)")
    p.add_argument("--checkpoint", "--resume", dest="checkpoint",
                   default="")
    p.add_argument("--output-dir", default="",
                   help="when no --checkpoint/--resume is given, load "
                        "checkpoint_best from here (reference "
                        "eval_narrator.py:93-94)")
    p.add_argument("--model",
                   default="VCLM_OPENAI_TIMESFORMER_MINI_GPT2_MINI")
    p.add_argument("--clip-length", type=int, default=4)
    p.add_argument("--clip-stride", type=int, default=16,
                   help="reference --clip-stride (eval_narrator.py:62)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--eval-freq", type=int, default=100,
                   help="evaluate every k-th sample (val subsampling)")
    p.add_argument("--decoding", default="sample",
                   choices=["sample", "beam", "beam_sample", "group_beam"])
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--top-p", type=float, default=0.95)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--num-return-sequences", type=int, default=1,
                   help="candidates per clip; every candidate is scored "
                        "against the clip's references (reference "
                        "--caption-num-return-sequences, "
                        "eval_narrator.py:215-261)")
    p.add_argument("--num-beams", type=int, default=3,
                   help="reference --caption-num-beams (default 3)")
    p.add_argument("--num-beam-groups", type=int, default=3,
                   help="for --decoding group_beam; must divide "
                        "--num-beams and be > 1 (reference "
                        "--caption-num-beam-groups, eval_narrator.py:203)")
    p.add_argument("--length-penalty", type=float, default=1.0,
                   help="reference --caption-length-penalty")
    p.add_argument("--max-text-length", type=int, default=77,
                   help="reference --caption-max-len")
    p.add_argument("--early-stop", action="store_true",
                   help="accepted for reference parity "
                        "(--caption-early-stop): decode always exits at "
                        "batch-max EOS here, with identical outputs")
    p.add_argument("--num-clips", type=int, default=1,
                   help="accepted for reference parity; values > 1 are "
                        "rejected — the reference's multi-view transform "
                        "branch (eval_narrator.py:143-150) produces "
                        "list-valued batches its own validate_caption "
                        "cannot consume")
    p.add_argument("--num-crops", type=int, default=1,
                   help="see --num-clips")
    p.add_argument("--sparse-sample", action="store_true",
                   help="accepted for reference parity; dead there too "
                        "(eval_narrator.py:161 hardcodes "
                        "sparse_sample=False)")
    p.add_argument("--print-freq", type=int, default=10)
    p.add_argument("--max-samples", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output-json", "--caption-output-filename",
                   dest="output_json", default="")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute + params (the reference's "
                        "--use-half, eval_narrator.py:86)")
    return p


def main(args):
    if args.num_clips > 1 or args.num_crops > 1:
        raise SystemExit(
            "multi-view narrator eval is not supported (the reference's "
            "num_clips/num_crops > 1 branch is itself non-functional — "
            "see --num-clips help)")
    # checkpoint precedence mirrors the reference (eval_narrator.py:91-94):
    # explicit path wins, else checkpoint_best under --output-dir
    if not args.checkpoint and args.output_dir:
        best = osp.join(args.output_dir, "checkpoint_best")
        if osp.exists(best):
            args.checkpoint = best
    model = build_model(args.model, num_frames=args.clip_length,
                        gated_xattn=True,
                        **({"dtype": jnp.bfloat16} if args.bf16 else {}))
    crop = 336 if "336PX" in args.model else (
        64 if "MINI" in args.model else 224)
    transform = T.EvalTransform(crop, *T.normalization_for_model(args.model))

    tokenizer = generate_tokenizer(args.model)
    bos, eos, pad = (tokenizer.bos_token_id, tokenizer.eos_token_id,
                     tokenizer.pad_token_id)

    dcfg = DatasetConfig(dataset=args.dataset, root=args.root,
                         metadata=args.metadata,
                         clip_length=args.clip_length,
                         clip_stride=args.clip_stride,
                         subsample_stride=args.eval_freq,
                         narration_selection="random")
    ds = VideoCaptionDataset(dcfg, transform, tokenizer, is_training=False,
                             seed=args.seed)
    if args.max_samples:
        ds.samples = ds.samples[:args.max_samples]
    # keep raw captions for NLG references
    raw = VideoCaptionDataset(dcfg, None, None, is_training=False,
                              seed=args.seed)
    if args.max_samples:
        raw.samples = raw.samples[:args.max_samples]
    loader = DataLoader(ds, args.batch_size, shuffle=False, drop_last=False,
                        num_workers=args.workers)

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

    encode_image = jax.jit(
        lambda v, f: model.apply(v, f, method="encode_image"))
    teacher = jax.jit(lambda v, toks, tgt, key: model.apply(
        v, toks, rng=key, bos_id=bos, eos_id=eos, pad_id=pad,
        max_text_length=tgt.shape[1], target=tgt, teacher_forcing=True,
        method="generate"))
    free = jax.jit(lambda v, toks, key: model.apply(
        v, toks, rng=key, bos_id=bos, eos_id=eos, pad_id=pad,
        max_text_length=args.max_text_length, temperature=args.temperature,
        top_k=args.top_k or None, top_p=args.top_p, method="generate"))
    if args.decoding == "group_beam" and not (
            args.num_beam_groups > 1
            and args.num_beams % args.num_beam_groups == 0):
        raise SystemExit(
            "--decoding group_beam needs --num-beam-groups > 1 dividing "
            "--num-beams (reference eval_narrator.py:203)")
    dec = BeamDecoder(model, variables, bos_id=bos, eos_id=eos, pad_id=pad,
                      max_text_length=args.max_text_length)

    key = jax.random.key(args.seed)
    ppls, hyps, refs = [], [], []
    sample_idx = 0
    for bi, batch in enumerate(loader):
        if bi % args.print_freq == 0:
            print(f"[{bi}/{len(loader)}]", flush=True)
        toks = encode_image(variables, jnp.asarray(batch["frames"]))
        tgt = jnp.asarray(batch["text"])
        key, k1, k2 = jax.random.split(key, 3)
        _, tf_ppl = teacher(variables, toks, tgt, k1)
        ppls.extend(np.asarray(tf_ppl).tolist())
        nrs = args.num_return_sequences
        if args.decoding == "sample":
            # interleaved repeat = the reference's repeat_interleave
            # (eval_narrator.py:107-108): nrs independent draws per clip
            toks_s = jnp.repeat(toks, nrs, axis=0) if nrs > 1 else toks
            ids, _ = free(variables, toks_s, k2)
            ids = np.asarray(ids)
        elif args.decoding == "beam":
            ids, _ = dec.beam_search(toks, num_beams=args.num_beams,
                                     num_return_sequences=nrs,
                                     length_penalty=args.length_penalty)
        elif args.decoding == "beam_sample":
            ids, _ = dec.beam_sample(toks,
                                     rng=np.random.default_rng(args.seed),
                                     num_beams=args.num_beams,
                                     temperature=args.temperature,
                                     top_p=args.top_p,
                                     num_return_sequences=nrs,
                                     length_penalty=args.length_penalty)
        else:
            ids, _ = dec.group_beam_search(
                toks, num_beams=args.num_beams,
                num_beam_groups=args.num_beam_groups,
                num_return_sequences=nrs,
                length_penalty=args.length_penalty)
        for row in ids:
            row = list(row[1:])
            if eos in row:
                row = row[:row.index(eos)]
            hyps.append(tokenizer.decode(row).strip())
        n = batch["frames"].shape[0]
        for j in range(n):
            narration = raw.samples[sample_idx + j][3]
            rr = narration if isinstance(narration, list) else [narration]
            # each of the nrs candidates scores against the same refs
            # (reference eval_narrator.py:259-261)
            refs.extend([rr] * nrs)
        sample_idx += n

    # BERT-tokenizer re-normalization of hyps AND refs before scoring
    # (reference eval_narrator.py:267-271); exact wordpiece round-trip
    # when a bert vocab is available, BasicTokenizer normalization else
    wordpiece = None
    try:
        from lavila_tpu.data.tokenizers import WordPieceTokenizer
        import os
        assets = os.environ.get("LAVILA_TOKENIZER_DIR", "")
        for name in ("bert-base-uncased", "distilbert-base-uncased"):
            vocab = osp.join(assets, name, "vocab.txt")
            if osp.exists(vocab):
                wordpiece = WordPieceTokenizer(vocab)
                break
    except (FileNotFoundError, OSError, KeyError):
        wordpiece = None
    hyps = [bert_style_normalize(h, wordpiece) for h in hyps]
    refs = [[bert_style_normalize(r, wordpiece) for r in rr] for rr in refs]

    out = nlg_scores(hyps, refs)
    out["teacher_ppl"] = float(np.mean(ppls))
    print(json.dumps(out))
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(out, f)
    return out


if __name__ == "__main__":
    main(get_args_parser().parse_args())
