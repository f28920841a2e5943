#!/usr/bin/env python
"""Offline Ego4D preprocessing: chunk every full-scale video into
5-minute mp4 segments resized to 288px short side — the storage layout
the chunked loader expects (root/<uid>.mp4/<chunk_start>.mp4,
see lavila_tpu/data/video.py:video_loader; same contract as the
reference's scripts/crop_and_resize_ego4d.sh).

Requires an ffmpeg binary (offline preprocessing box, not the TPU host).
Validates each chunk by probing it with the framework's own native
decoder and retries failed chunks.

Usage:
  python scripts/crop_and_resize_ego4d.py \
      --input-dir /data/ego4d/full_scale \
      --output-dir /data/ego4d/video_288px \
      [--chunk-len 300] [--short-side 288] [--workers 8] [--dry-run]
"""

from __future__ import annotations

import argparse
import math
import os
import os.path as osp
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor


def ffmpeg_cmd(src: str, dst: str, start: int, chunk_len: int,
               short_side: int) -> list[str]:
    # scale filter: short side -> short_side, other side even
    vf = (f"scale='if(gt(iw,ih),-2,{short_side})':'"
          f"if(gt(iw,ih),{short_side},-2)'")
    return [
        "ffmpeg", "-y", "-loglevel", "error",
        "-ss", str(start), "-t", str(chunk_len), "-i", src,
        "-vf", vf, "-c:v", "libx264", "-preset", "fast", "-crf", "23",
        "-an", dst,
    ]


def probe_duration(src: str) -> float:
    try:
        sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
        from lavila_tpu.data.video import VideoReader
        r = VideoReader(src)
        dur = len(r) / max(r.fps, 1e-6)
        r.close()
        return dur
    except Exception:
        out = subprocess.run(
            ["ffprobe", "-v", "error", "-show_entries", "format=duration",
             "-of", "csv=p=0", src], capture_output=True, text=True)
        return float(out.stdout.strip() or 0)


def validate(dst: str) -> bool:
    try:
        from lavila_tpu.data.video import VideoReader
        r = VideoReader(dst)
        ok = len(r) > 0
        r.close()
        return ok
    except Exception:
        return False


def process(src: str, out_root: str, chunk_len: int, short_side: int,
            dry_run: bool, retries: int = 2) -> None:
    uid = osp.splitext(osp.basename(src))[0]
    vdir = osp.join(out_root, f"{uid}.mp4")
    os.makedirs(vdir, exist_ok=True)
    duration = probe_duration(src)
    n_chunks = max(int(math.ceil(duration / chunk_len)), 1)
    for c in range(n_chunks):
        start = c * chunk_len
        dst = osp.join(vdir, f"{start}.mp4")
        if osp.exists(dst) and validate(dst):
            continue
        cmd = ffmpeg_cmd(src, dst, start, chunk_len, short_side)
        if dry_run:
            print(" ".join(cmd))
            continue
        for attempt in range(retries + 1):
            subprocess.run(cmd, check=False)
            if validate(dst):
                break
            print(f"retry {attempt + 1}: {dst}")
    print(f"done: {uid} ({n_chunks} chunks)")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input-dir", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--chunk-len", type=int, default=300)
    parser.add_argument("--short-side", type=int, default=288)
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args()

    videos = [osp.join(args.input_dir, f)
              for f in sorted(os.listdir(args.input_dir))
              if f.lower().endswith(".mp4")]
    print(f"{len(videos)} videos")
    with ThreadPoolExecutor(args.workers) as pool:
        list(pool.map(lambda v: process(v, args.output_dir, args.chunk_len,
                                        args.short_side, args.dry_run),
                      videos))


if __name__ == "__main__":
    main()
