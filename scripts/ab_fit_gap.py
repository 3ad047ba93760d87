"""Decompose the fit()-loop vs in-jit throughput gap — VERDICT r3 #1.

fit_throughput.py measured 30.4 specs/s sustained through the production
loop vs bench.py's 414.5 in-jit (7.3%). This script measures each candidate
bottleneck in isolation on the real chip:

  A. host->device bandwidth  (device_put of batch-sized float32/int16 arrays)
  B. per-dispatch step rate  (train step dispatched per step on a
     device-RESIDENT batch: isolates dispatch/tunnel overhead + compute,
     no transfer, no loader)
  C. loader-only rate        (iterate the production train loader, drop
     batches: native plane + prefetch, no device work)
  D. B + transfer            (per-dispatch step on a host batch device_put
     each step — the fit loop minus the loader)

Run:  python scripts/ab_fit_gap.py [--container /tmp/fit_throughput/train_3000.h5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 12
T = 320000  # 10 s @ 32 kHz


def bw_test(jnp, n=8, dtype=np.float32):
    x = np.random.default_rng(0).standard_normal((B, T)).astype(dtype)
    mb = x.nbytes / 1e6
    # warm up the transfer path
    jnp.asarray(x).block_until_ready()
    t0 = time.perf_counter()
    devs = [jnp.asarray(x + np.float32(i).astype(dtype)) for i in range(n)]
    # force all transfers to complete: reduce each to a scalar and fetch
    s = sum(float(d[0, 0]) for d in devs)
    dt = time.perf_counter() - t0
    return {"MB_per_batch": round(mb, 2), "MB_per_s": round(n * mb / dt, 1),
            "ms_per_batch": round(dt / n * 1000, 1), "checksum": s}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--container", default="/tmp/fit_throughput/train_3000.h5")
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from passt_tpu.experiments.audioset import experiment
    from passt_tpu.experiments.common import enable_compilation_cache

    enable_compilation_cache("/tmp/fit_throughput/xla_cache")
    out = {}

    # ---- A: raw h2d bandwidth -------------------------------------------
    out["h2d_float32"] = bw_test(jnp)
    out["h2d_int16"] = bw_test(jnp, dtype=np.int16)
    print("A h2d:", json.dumps(out["h2d_float32"]), json.dumps(out["h2d_int16"]), flush=True)

    # ---- build the production step (same config as fit_throughput) ------
    import dataclasses

    cfg = experiment.default_config
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, train_hdf5=args.container,
                                 eval_hdf5=args.container, epoch_len=3000),
    )
    model, state, train_step, _, _ = experiment.build(cfg)
    rng = jax.random.PRNGKey(0)
    wave_h = np.random.default_rng(0).standard_normal((B, T)).astype(np.float32)
    tgt_h = np.zeros((B, 527), np.float32)
    dev_batch = {"wave": jnp.asarray(wave_h), "target": jnp.asarray(tgt_h)}

    # warmup/compile
    state, m = train_step(state, dev_batch, rng)
    float(m["loss"])

    # ---- B: per-dispatch step, device-resident batch ---------------------
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = train_step(state, dev_batch, rng)
    float(m["loss"])  # one sync at the end (same as the fit loop's cadence)
    dt = time.perf_counter() - t0
    out["dispatch_device_batch"] = {
        "ms_per_step": round(dt / args.steps * 1000, 1),
        "specs_per_s": round(args.steps * B / dt, 1),
    }
    print("B dispatch(dev batch):", json.dumps(out["dispatch_device_batch"]), flush=True)

    # ---- D: per-dispatch step + per-step device_put ----------------------
    t0 = time.perf_counter()
    for i in range(args.steps):
        db = {"wave": jnp.asarray(wave_h), "target": jnp.asarray(tgt_h)}
        state, m = train_step(state, db, rng)
    float(m["loss"])
    dt = time.perf_counter() - t0
    out["dispatch_plus_transfer"] = {
        "ms_per_step": round(dt / args.steps * 1000, 1),
        "specs_per_s": round(args.steps * B / dt, 1),
    }
    print("D dispatch+transfer:", json.dumps(out["dispatch_plus_transfer"]), flush=True)

    # ---- C: loader-only ---------------------------------------------------
    from passt_tpu.experiments.common import build_train_loader

    loader = build_train_loader(cfg)
    loader.set_epoch(0)
    it = iter(loader)
    n = 0
    t0 = time.perf_counter()
    for batch in it:
        n += 1
        if n >= args.steps:
            if hasattr(it, "stop"):
                it.stop()
            break
    dt = time.perf_counter() - t0
    out["loader_only"] = {
        "ms_per_batch": round(dt / n * 1000, 1),
        "clips_per_s": round(n * B / dt, 1),
        "native": loader.batch_builder is not None,
    }
    print("C loader:", json.dumps(out["loader_only"]), flush=True)

    print(json.dumps({"gap_decomposition": out}))


if __name__ == "__main__":
    main()
