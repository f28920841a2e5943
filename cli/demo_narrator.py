"""Narrator demo: caption one video clip.

Equivalent of the reference demo_narrator.py (ego view; pass
``--model VCLM_OPENAI_TIMESFORMER_LARGE_336PX_GPT2_XL`` + the released
checkpoint) and demo_narrator_3rd_person.py (``--third-person`` flips to
the HTM checkpoint's crop/normalization convention).
"""

from __future__ import annotations

import argparse
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from lavila_tpu.data import transforms as T
from lavila_tpu.data.sampling import uniform_frame_ids
from lavila_tpu.data.tokenizers import generate_tokenizer
from lavila_tpu.data.video import VideoReader, encode_test_video
from lavila_tpu.models import build_model
from lavila_tpu.models.beam import BeamDecoder


def get_args_parser():
    p = argparse.ArgumentParser("narrator demo")
    p.add_argument("--video-path", default="")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--model",
                   default="VCLM_OPENAI_TIMESFORMER_MINI_GPT2_MINI")
    p.add_argument("--clip-length", type=int, default=4)
    p.add_argument("--num-return-sequences", type=int, default=5)
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--top-p", type=float, default=0.95)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--decoding", default="sample",
                   choices=["sample", "beam", "beam_sample", "group_beam"])
    p.add_argument("--third-person", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p


def load_clip(args, crop):
    if not args.video_path:
        path = "/tmp/lavila_demo.mp4"
        if not osp.exists(path):
            encode_test_video(path, 256, 256, 30, 120)
        args.video_path = path
        print(f"(no --video-path; using synthetic clip {path})")
    vr = VideoReader(args.video_path)
    ids = uniform_frame_ids(0, len(vr), args.clip_length, jitter=False)
    frames = vr.get_batch(ids).astype(np.float32)
    vr.close()
    mean, std = (T.OPENAI_MEAN, T.OPENAI_STD)
    transform = T.EvalTransform(crop, mean, std)
    return transform(frames)


def main(args):
    crop = 336 if "336PX" in args.model else (
        64 if "MINI" in args.model else 224)
    clip = load_clip(args, crop)

    model = build_model(args.model, num_frames=args.clip_length,
                        gated_xattn=True)
    frames = jnp.asarray(clip[None])
    text = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.key(args.seed), frames, text)["params"]
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
    variables = {"params": params}

    try:
        tokenizer = generate_tokenizer(args.model)
        bos, eos, pad = (tokenizer.bos_token_id, tokenizer.eos_token_id,
                         tokenizer.pad_token_id)
        decode = tokenizer.decode
    except (FileNotFoundError, OSError):
        print("(GPT-2 tokenizer files not found; printing raw token ids)")
        tokenizer, decode = None, lambda ids: str(list(ids))
        bos, eos, pad = 50256, 50256, 0

    image_tokens = model.apply(variables, frames, method="encode_image")
    print(f"image tokens: {image_tokens.shape}")

    if args.decoding == "sample":
        ids, ppl = model.apply(
            variables, image_tokens, rng=jax.random.key(args.seed),
            bos_id=bos, eos_id=eos, pad_id=pad, max_text_length=77,
            temperature=args.temperature, top_k=args.top_k or None,
            top_p=args.top_p,
            num_return_sequences=args.num_return_sequences,
            method="generate")
        ids, scores = np.asarray(ids), -np.log(np.asarray(ppl))
    else:
        dec = BeamDecoder(model, variables, bos_id=bos, eos_id=eos,
                          pad_id=pad, max_text_length=77)
        if args.decoding == "beam":
            ids, scores = dec.beam_search(
                image_tokens, num_beams=5,
                num_return_sequences=args.num_return_sequences)
        elif args.decoding == "beam_sample":
            ids, scores = dec.beam_sample(
                image_tokens, rng=np.random.default_rng(args.seed),
                num_beams=5, temperature=args.temperature,
                top_p=args.top_p,
                num_return_sequences=args.num_return_sequences)
        else:
            ids, scores = dec.group_beam_search(
                image_tokens, num_beams=6, num_beam_groups=3,
                num_return_sequences=args.num_return_sequences)

    for i, (row, score) in enumerate(zip(ids, scores)):
        row = list(row)
        body = row[1:]
        if eos in body:
            body = body[:body.index(eos)]
        print(f"[{i}] (score {float(score):.3f}) {decode(body)}")
    return ids


if __name__ == "__main__":
    main(get_args_parser().parse_args())
