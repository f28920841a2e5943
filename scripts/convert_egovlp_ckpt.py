#!/usr/bin/env python
"""Rename EgoVLP checkpoint keys to the lavila naming scheme so the
torch importer (lavila_tpu/models/import_torch.py) can load them
(same mapping as the reference scripts/convert_egovlp_ckpt.py:
video_model→visual, text_model→textual, vid_proj→image_projection,
txt_proj→text_projection).

Usage:
  python scripts/convert_egovlp_ckpt.py --input-ckpt egovlp.pth \
      --output-ckpt egovlp_converted.pth
"""

import argparse

RENAMES = [
    ("module.video_model", "module.visual"),
    ("module.text_model", "module.textual"),
    ("module.txt_proj", "module.text_projection"),
    ("module.vid_proj", "module.image_projection"),
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input-ckpt", required=True)
    parser.add_argument("--output-ckpt", required=True)
    args = parser.parse_args()

    import torch
    ckpt = torch.load(args.input_ckpt, map_location="cpu",
                      weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    out = {}
    for key, value in sd.items():
        for old, new in RENAMES:
            if key.startswith(old):
                out[new + key[len(old):]] = value
                break
        else:
            raise ValueError(f"unrecognized EgoVLP key: {key}")
    torch.save({"epoch": 0, "state_dict": out, "best_acc1": 0},
               args.output_ckpt)
    print(f"wrote {len(out)} tensors -> {args.output_ckpt}")


if __name__ == "__main__":
    main()
