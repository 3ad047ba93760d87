"""Worker-count sweep of the flagship two-container loader chain — the
standing PARITY §2.4 caveat made push-button.

The feed requirement for the measured ~435 specs/s TPU step is ~5 cores
of the measured 76-85 clips/s/core native chain; that extrapolation
assumes the loader thread pool scales linearly with workers, which a
1-core build host cannot observe (HDF5 has a single-reader lock per file
handle and the pool shares one CPython GIL — the native plane releases
the GIL inside decode, the numpy fallback does not). Run THIS script on
the first many-core host to replace the extrapolation with a measurement:

  python -u scripts/loader_worker_sweep.py [n_clips_per_container] [workers,...]

Prints clips/s and parallel efficiency per worker count for the native
C++ plane and the numpy fallback, on real 32 kHz CBR mp3 two-container
chains (weighted sampler + mp3 decode + gain/roll + wavmix + packed
targets — the exact audioset ``main`` path). Reference anchor: the
reference runs 16 torch DataLoader worker PROCESSES per GPU for the same
job (audioset/README.md:3); this plane uses threads, so GIL/lock scaling
is the question a process pool never had to answer.
"""

import dataclasses
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from measure_mp3_loader import build_container  # noqa: E402


def sweep(n_clips=64, worker_counts=None, native_modes=(True, False)):
    from passt_tpu.experiments import EXPERIMENTS

    cores = os.cpu_count() or 1
    if worker_counts is None:
        worker_counts = [w for w in (1, 2, 4, 8, 16) if w <= 2 * cores]
    results = {}
    with tempfile.TemporaryDirectory() as td:
        bal, unbal = os.path.join(td, "bal.h5"), os.path.join(td, "unbal.h5")
        build_container(bal, n_clips, seed=0)
        build_container(unbal, n_clips, seed=1)

        base = EXPERIMENTS["audioset"].default_config
        for native_on in native_modes:
            per_worker = {}
            for w in worker_counts:
                data = dataclasses.replace(
                    base.data,
                    train_hdf5=bal,
                    train_hdf5_extra=unbal,
                    epoch_len=8 * n_clips,
                    batch_size=12,
                    native_loader=native_on,
                    num_workers=w,
                )
                cfg = dataclasses.replace(
                    base,
                    data=data,
                    trainer=dataclasses.replace(base.trainer, limit_train_batches=None),
                )
                out = EXPERIMENTS["audioset"].test_loaders_train_speed(cfg)
                per_worker[w] = out["pass2_clips_per_s"]  # warm pass
            base_rate = per_worker[worker_counts[0]] / worker_counts[0]
            print(f"\nnative={native_on} ({cores} cores):")
            print("  workers  clips/s  efficiency-vs-linear")
            for w, rate in per_worker.items():
                eff = rate / (base_rate * w)
                print(f"  {w:7d}  {rate:7.1f}  {eff:.2f}")
            results[native_on] = per_worker
    return results


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    ws = [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else None
    sweep(n, ws)
