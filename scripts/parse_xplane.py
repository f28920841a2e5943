"""Summarize a jax.profiler xplane trace: per-op device-time breakdown.

Usage:
  python scripts/parse_xplane.py <trace_dir> [--steps N] [--top K] [--detail OP]

<trace_dir> is the directory passed to jax.profiler.trace(...) (the tool
finds plugins/profile/*/&ast;.xplane.pb underneath). --steps divides totals
by the number of traced steps. Works on the axon tunnel (device events
are captured remotely and embedded in the xplane).

This is the observability companion to scripts/profile_step.py: the
profiler attributes wall time to every XLA op (fusions, Pallas
custom-calls, layout copies, async DMA), which is how the attention
relayout taxes and LayerNorm costs documented in ops/pallas/divided.py
were found. The reference ships only wall-clock meters
(reference: lavila/utils/meter.py:12-65, main_pretrain.py:423-425).
"""

import argparse
import collections
import glob
import os
import re
import sys


def load_plane(trace_dir):
    from jax.profiler import ProfileData
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        sys.exit(f"no .xplane.pb under {trace_dir}")
    pd = ProfileData.from_file(paths[-1])
    for plane in pd.planes:
        if plane.name.startswith("/device:") and "CUSTOM" not in plane.name:
            for line in plane.lines:
                if line.name == "XLA Ops":
                    return plane.name, list(line.events)
    sys.exit("no device plane with an 'XLA Ops' line found")


def base_name(ev_name):
    m = re.match(r"%([A-Za-z0-9_.-]+) = ", ev_name)
    op = m.group(1) if m else ev_name[:40]
    return re.sub(r"\.\d+$", "", op)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=1,
                    help="number of traced steps to divide totals by")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--detail", default=None,
                    help="show top individual events whose base name "
                         "matches this (e.g. 'fusion', 'copy')")
    args = ap.parse_args()

    plane_name, events = load_plane(args.trace_dir)
    print(f"plane {plane_name}: {len(events)} events")

    tot = collections.Counter()
    cnt = collections.Counter()
    detail = []
    for ev in events:
        b = base_name(ev.name)
        tot[b] += ev.duration_ns
        cnt[b] += 1
        if args.detail and b == args.detail:
            detail.append((ev.duration_ns, ev.name))

    n = args.steps
    print(f"{'op base name':44s} {'ms/step':>9s} {'n/step':>8s}")
    for b, ns in tot.most_common(args.top):
        print(f"{b:44s} {ns/n/1e6:9.3f} {cnt[b]/n:8.1f}")
    print(f"TOTAL busy: {sum(tot.values())/n/1e6:.2f} ms/step")

    if args.detail:
        sig_tot = collections.Counter()
        sig_cnt = collections.Counter()
        for d, name in detail:
            sig = re.sub(r"%[A-Za-z0-9_.-]+", "X", name)[:110]
            sig_tot[sig] += d
            sig_cnt[sig] += 1
        print(f"\n-- {args.detail} variants by total time --")
        for sig, ns in sig_tot.most_common(15):
            print(f"{ns/n/1e6:8.3f} ms/step x{sig_cnt[sig]/n:6.1f}  {sig}")


if __name__ == "__main__":
    main()
