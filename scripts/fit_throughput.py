"""Sustained END-TO-END fit() throughput on the real chip — VERDICT r3 #1.

Every headline throughput number so far (bench.py's 414.5 specs/s) comes
from an in-jit ``fori_loop`` harness: mel+train step iterated inside ONE
compiled graph, no loader, no ``device_put``, no per-step dispatch. The
reference's anchor, though, is wall-clock training
(~24 h to mAP .47 on 2x2080 Ti, reference ex_audioset.py:502) — so this
script measures what a user actually gets from ``audioset main``: the full
production loop (native C++ batch plane -> prefetch thread -> device_put
over the axon tunnel -> per-step dispatch -> JSONL logging), reported as
sustained specs/s from the epoch ``it_per_s`` records.

Protocol
- Packs a synthetic raw-int16 PCM container (decode-free: mp3 decode needs
  ~5 cores to feed the chip — PARITY §2.4 — and this host has ONE; raw PCM
  isolates the loop machinery, which is what differs from bench.py).
- Runs the REAL ``Experiment.main`` with the audioset recipe (weighted
  sampler, wavmix+roll augmentation on host, mixup+SpecAugment on device,
  orbax checkpointing) for --epochs epochs.
- Epoch 0 pays the compile; sustained = best epoch it_per_s x batch_size.
  (it_per_s excludes eval/checkpoint time by construction — epoch_time is
  taken at the end of the batch loop; eval cadence is still exercised.)

Run:  python scripts/fit_throughput.py [--steps 167] [--epochs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_container(path: str, n_clips: int, n_classes: int = 527, seconds: int = 10,
                   sr: int = 32000) -> None:
    from passt_tpu.data.prepare.pack_hdf5 import pack_waveform_hdf5

    rng = np.random.default_rng(0)
    base = (rng.standard_normal(seconds * sr).astype(np.float32) * 0.1)

    def items():
        for i in range(n_clips):
            # content is irrelevant to throughput (int16 decode is
            # frombuffer); a rolled/scaled template keeps packing fast
            wave = np.roll(base, (i * 997) % len(base)) * (0.5 + (i % 7) / 8.0)
            target = np.zeros(n_classes)
            target[i % n_classes] = 1
            yield (f"clip{i}.wav", wave, target)

    n = pack_waveform_hdf5(path, items())
    print(f"packed {n} clips -> {path} ({os.path.getsize(path) / 1e9:.2f} GB)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=167, help="train steps per epoch")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=12)
    ap.add_argument("--workdir", default="/tmp/fit_throughput")
    ap.add_argument("--reuse", action="store_true", help="reuse an existing container")
    ap.add_argument("--profile", action="store_true",
                    help="capture a jax.profiler trace of steps 60..75")
    ap.add_argument("--transfer-dtype", default=None, choices=["float32", "int16"],
                    help="override trainer.transfer_dtype (int16 halves "
                         "host->device bytes; see config.py)")
    ap.add_argument("--device-prefetch", type=int, default=None,
                    help="override trainer.device_prefetch (0 = inline "
                         "synchronous device_put)")
    ap.add_argument("--no-checkpoint", action="store_true",
                    help="disable orbax saves: on the axon tunnel the "
                         "per-epoch ASYNC save pulls ~700 MB of params+"
                         "moments d2h at ~30 MB/s, saturating the shared "
                         "link ~20 s into the next epoch's steps — a real "
                         "cost worth reporting, but not part of the "
                         "steady-state step rate")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    n_clips = args.steps * args.batch_size
    train_h5 = os.path.join(args.workdir, f"train_{n_clips}.h5")
    eval_h5 = os.path.join(args.workdir, "eval_120.h5")
    if not (args.reuse and os.path.exists(train_h5)):
        make_container(train_h5, n_clips)
    if not (args.reuse and os.path.exists(eval_h5)):
        make_container(eval_h5, 120)

    import dataclasses

    import jax

    from passt_tpu.experiments.audioset import experiment
    from passt_tpu.experiments.common import enable_compilation_cache

    # amortize the ~4 min flagship-step compile across reruns of this
    # harness (compile time is excluded from the sustained number anyway —
    # epoch 0 is dropped — but the wall saving makes iteration practical)
    enable_compilation_cache(os.path.join(args.workdir, "xla_cache"))

    cfg = experiment.default_config
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data,
            train_hdf5=train_h5,
            eval_hdf5=eval_h5,
            epoch_len=n_clips,  # no-replacement weighted sampler: one full pass
            batch_size=args.batch_size,
        ),
        trainer=dataclasses.replace(
            cfg.trainer,
            max_epochs=args.epochs,
            checkpoint_dir=(None if args.no_checkpoint
                            else os.path.join(args.workdir, "ckpt")),
            limit_eval_batches=2,  # eval path exercised, not measured
            profile_dir=os.path.join(args.workdir, "trace") if args.profile else None,
            profile_start_step=60,
            profile_num_steps=15,
            **({"transfer_dtype": args.transfer_dtype}
               if args.transfer_dtype is not None else {}),
            **({"device_prefetch": args.device_prefetch}
               if args.device_prefetch is not None else {}),
        ),
    )
    print(f"devices: {jax.devices()}  steps/epoch: {args.steps}  B: {args.batch_size}")
    t0 = time.time()
    result = experiment.main(cfg)
    wall = time.time() - t0

    hist = result["history"]
    rates = [r["it_per_s"] for r in hist if "it_per_s" in r]
    sustained = max(rates[1:] or rates)  # epoch 0 pays the compile
    specs = sustained * args.batch_size
    bench = 414.52  # BENCH_r03 in-jit fori_loop number (same B, same chip)
    out = {
        "metric": "fit_loop_sustained_throughput",
        "value": round(specs, 2),
        "unit": "specs/second",
        "epoch_it_per_s": rates,
        "steps_per_epoch": args.steps,
        "batch_size": args.batch_size,
        "wall_s_total": round(wall, 1),
        "vs_in_jit_bench": round(specs / bench, 4),
        "device_prefetch": cfg.trainer.device_prefetch,
        "transfer_dtype": cfg.trainer.transfer_dtype,
        "checkpointing": not args.no_checkpoint,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
