#!/usr/bin/env python
"""A/B: norm1 absorbed into the flat attention boundary (fuse_ln_qkv).

VERDICT r4 item 1(b): the round-4 profile shows 5.14 ms/step of
LN-adjacent reduce fusions; the round-2 standalone Pallas LN lost because
its custom_vjp boundary forfeited LN<->matmul fusion. fuse_ln_qkv extends
the EXISTING attention boundary upstream through norm1 (no new boundary;
ops/pallas/ln_qkv.py). This measures the full production train step both
ways — same methodology as scripts/ab_scan_blocks.py.

Run on the real chip:  python scripts/ab_ln_qkv.py [--steps 60]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ab_scan_blocks import measure  # the one shared step-measure harness


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--only", choices=["off", "on"], default=None)
    args = p.parse_args(argv)
    variants = [False, True] if args.only is None else [args.only == "on"]
    results = []
    for fuse in variants:
        r = measure(steps=args.steps, fuse_ln_qkv=fuse)
        print(json.dumps(r), flush=True)
        results.append(r)
    if len(results) == 2:
        a, b = results
        print(
            json.dumps(
                {"delta_ms": round(b["ms_per_step"] - a["ms_per_step"], 3),
                 "speedup": round(a["ms_per_step"] / b["ms_per_step"], 4)}
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
