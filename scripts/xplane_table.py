"""Parse a jax.profiler xplane.pb into a per-fusion timing table — VERDICT r3 #2.

The round-3 step budget (PARITY.md kernel table) was built by *differencing*
in-jit harnesses; this turns an actual captured trace (``trainer.profile_dir``
knob, train/loop.py) into the observed per-fusion timeline: every device op
>= 0.05 ms/step named, summing to the step, so the residual "differencing
slack" row becomes a measured list of fusions.

Usage:
    python scripts/xplane_table.py <profile_dir_or_xplane.pb> [--steps N]
                                   [--json out.json]

``--steps N`` divides totals by N (the profile window's step count) to report
per-step ms. The device plane is auto-detected (the plane whose name contains
"TPU" with the most event time; falls back to any non-host plane).

Parsing uses tensorflow.tsl's xplane_pb2 (tensorflow is installed in this
image for exactly this kind of tooling; the training path never imports it).
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys


def find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True))
    if not hits:
        raise FileNotFoundError(f"no *.xplane.pb under {path}")
    return hits[-1]  # latest capture


def load_space(pb_path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(pb_path, "rb") as f:
        space.ParseFromString(f.read())
    return space


def plane_event_totals(plane):
    """name -> (total_ps, count) over the plane's sync-op line.

    A TPU device plane nests several views of the same wall time: 'Steps'
    (one span per step), 'XLA Modules' (one span per executable), 'XLA Ops'
    (every synchronous HLO op, sums to the step), and 'Async XLA Ops'
    (async-start/done spans that OVERLAP the sync ops — summing those
    double-counts hidden DMA time as if it were serial). Only 'XLA Ops'
    partitions the step, so use it when present; fall back to all lines for
    non-TPU planes."""
    meta = plane.event_metadata
    lines = [l for l in plane.lines if l.name == "XLA Ops"] or plane.lines
    totals = collections.defaultdict(lambda: [0, 0])
    for line in lines:
        for ev in line.events:
            name = meta[ev.metadata_id].name if ev.metadata_id in meta else f"id{ev.metadata_id}"
            t = totals[name]
            t[0] += ev.duration_ps
            t[1] += 1
    return totals


def pick_device_plane(space):
    best, best_time = None, -1
    for plane in space.planes:
        total = sum(ev.duration_ps for line in plane.lines for ev in line.events)
        is_dev = "TPU" in plane.name or plane.name.startswith("/device:")
        if is_dev and total > best_time:
            best, best_time = plane, total
    return best


def classify(name: str) -> str:
    n = name.lower()
    if "fusion" in n:
        return "fusion"
    if any(k in n for k in ("convolution", "conv")):
        return "conv"
    if any(k in n for k in ("dot", "matmul")):
        return "matmul"
    if any(k in n for k in ("all-reduce", "all-gather", "reduce-scatter", "collective")):
        return "collective"
    if any(k in n for k in ("copy", "transpose", "reshape", "bitcast")):
        return "data-movement"
    if any(k in n for k in ("infeed", "outfeed", "transfer", "h2d", "d2h")):
        return "transfer"
    if "custom" in n or "mosaic" in n or "tpu_custom_call" in n:
        return "custom-kernel"
    return "other"


def family(name: str) -> str:
    """Collapse '%attn.43 = bf16[12,474,2304]... custom-call(...)' to
    'attn bf16[12,474,2304]' so the 12 per-block instances of each fusion
    aggregate to one row."""
    import re

    m = re.match(r"%([A-Za-z_\-]+)[\d.]*\s*=\s*(\(?\s*[a-z0-9]+\[[^\]]*\])?", name)
    if not m:
        return name[:60]
    base, shape = m.group(1), (m.group(2) or "").replace(" ", "")
    return f"{base} {shape}".strip()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="profile dir (searched recursively) or xplane.pb")
    ap.add_argument("--steps", type=int, default=1, help="steps in the window")
    ap.add_argument("--min-ms", type=float, default=0.05, help="per-step cutoff")
    ap.add_argument("--group", action="store_true",
                    help="aggregate per-block fusion instances into families "
                         "(op base name + output shape)")
    ap.add_argument("--json", default=None, help="also write the table as JSON")
    args = ap.parse_args()

    pb = find_xplane(args.path)
    space = load_space(pb)
    print(f"# {pb}")
    print(f"# planes: {[p.name for p in space.planes]}")
    plane = pick_device_plane(space)
    if plane is None:
        print("no device plane found", file=sys.stderr)
        sys.exit(1)

    totals = plane_event_totals(plane)
    if args.group:
        grouped = collections.defaultdict(lambda: [0, 0])
        for name, (ps, count) in totals.items():
            g = grouped[(family(name), classify(name))]
            g[0] += ps
            g[1] += count
        totals = {name: v for (name, _), v in grouped.items()}
    rows = []
    for name, (ps, count) in totals.items():
        ms_per_step = ps / 1e9 / args.steps
        rows.append(
            {
                "op": name,
                "ms_per_step": round(ms_per_step, 4),
                "calls_per_step": round(count / args.steps, 2),
                "kind": classify(name),
            }
        )
    rows.sort(key=lambda r: -r["ms_per_step"])
    shown = [r for r in rows if r["ms_per_step"] >= args.min_ms]
    total_ms = sum(r["ms_per_step"] for r in rows)
    shown_ms = sum(r["ms_per_step"] for r in shown)

    print(f"# device plane: {plane.name}; {len(rows)} distinct ops, "
          f"{total_ms:.3f} ms/step total device time over {args.steps} steps")
    print(f"{'ms/step':>9}  {'calls':>6}  {'kind':<13} op")
    for r in shown:
        print(f"{r['ms_per_step']:>9.3f}  {r['calls_per_step']:>6.1f}  "
              f"{r['kind']:<13} {r['op'][:110]}")
    print(f"{total_ms - shown_ms:>9.3f}  {'':>6}  {'(below cutoff)':<13} "
          f"{len(rows) - len(shown)} ops < {args.min_ms} ms/step")

    by_kind = collections.defaultdict(float)
    for r in rows:
        by_kind[r["kind"]] += r["ms_per_step"]
    print("\n# by kind (ms/step):")
    for k, v in sorted(by_kind.items(), key=lambda kv: -kv[1]):
        print(f"  {k:<14} {v:8.3f}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(
                {"xplane": pb, "plane": plane.name, "steps": args.steps,
                 "total_ms_per_step": round(total_ms, 4), "rows": shown,
                 "by_kind": {k: round(v, 4) for k, v in by_kind.items()}},
                f, indent=1,
            )
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
