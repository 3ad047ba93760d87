"""Capture a jax.profiler trace of the PRODUCTION train step — VERDICT r3 #2.

Dispatches the flagship audioset train step (mel frontend + mixup +
SpecAugment + PaSST fwd/bwd + fused bf16+SR optimizer — the exact graph
fit() runs) on a device-RESIDENT batch for --steps steps inside one
``jax.profiler`` trace, so the capture attributes the ~29 ms step itself
rather than the dev tunnel's transfer time (which dominates any fit()-loop
capture on this host; see scripts/ab_fit_gap.py). Render the table with:

    python scripts/xplane_table.py <workdir>/trace --steps N

Reference anchor: the reference's closest tool is its in-loop speed test
(`ex_audioset.py:365-426`); it ships no profiler integration at all.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 12
T = 320000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--workdir", default="/tmp/fit_throughput")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from passt_tpu.experiments.audioset import experiment
    from passt_tpu.experiments.common import enable_compilation_cache

    enable_compilation_cache(os.path.join(args.workdir, "xla_cache"))
    cfg = experiment.default_config
    model, state, train_step, _, _ = experiment.build(cfg)
    rng = jax.random.PRNGKey(0)
    wave = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T)).astype(np.float32)
    )
    tgt = jnp.asarray(np.zeros((B, 527), np.float32))
    batch = {"wave": wave, "target": tgt}

    # compile + warm
    state, m = train_step(state, batch, rng)
    float(m["loss"])
    for _ in range(3):
        state, m = train_step(state, batch, rng)
    float(m["loss"])

    trace_dir = os.path.join(args.workdir, "trace_step")
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = train_step(state, batch, rng)
    loss = float(m["loss"])  # sync
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()

    print(json.dumps({
        "trace_dir": trace_dir,
        "steps": args.steps,
        "ms_per_step_wall": round(dt / args.steps * 1000, 2),
        "specs_per_s": round(args.steps * B / dt, 1),
        "loss": loss,
        "xplanes": sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                                    recursive=True)),
    }))


if __name__ == "__main__":
    main()
