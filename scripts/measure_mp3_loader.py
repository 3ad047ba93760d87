"""Measure mp3-container loader throughput through the worker pool — the
round-1 verdict gap #3: PARITY.md had only a per-core decode number (223
clips/s) while the TPU consumes ~364 clips/s; this measures the actual
`test_loaders_train_speed` path on REAL 32 kHz mono CBR mp3 containers
(encoded in-process via libmp3lame), for both the flagship two-container
chain (native C++ plane) and the numpy fallback.

Usage: python -u scripts/measure_mp3_loader.py [n_clips_per_container]
"""

import dataclasses
import os
import sys
import tempfile
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def build_container(path, n_clips, seconds=10, rate=32000, seed=0):
    from passt_tpu.data.prepare import pack_bytes_hdf5
    from passt_tpu.data.prepare.mp3enc import encode_mp3

    rng = np.random.default_rng(seed)
    items = []
    t0 = time.perf_counter()
    # a handful of distinct encodes, cycled: decode cost per clip is
    # identical, encode time stays bounded
    distinct = []
    for i in range(min(n_clips, 8)):
        wave = (rng.standard_normal(rate * seconds) * 0.1).astype(np.float32)
        distinct.append(encode_mp3(wave, rate))
    for i in range(n_clips):
        target = np.zeros(527)
        target[i % 527] = 1
        items.append((f"clip_{seed}_{i:04d}.mp3", distinct[i % len(distinct)], target))
    print(f"encoded {len(distinct)} x {seconds}s in {time.perf_counter()-t0:.1f}s")
    pack_bytes_hdf5(path, items, column="mp3", packed_targets=True, sample_rate=rate)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from passt_tpu.experiments import EXPERIMENTS

    with tempfile.TemporaryDirectory() as td:
        bal, unbal = os.path.join(td, "bal.h5"), os.path.join(td, "unbal.h5")
        build_container(bal, n, seed=0)
        build_container(unbal, n, seed=1)

        base = EXPERIMENTS["audioset"].default_config
        for native_on in (True, False):
            data = dataclasses.replace(
                base.data,
                train_hdf5=bal,
                train_hdf5_extra=unbal,
                epoch_len=960,
                batch_size=12,
                native_loader=native_on,
                num_workers=os.cpu_count() or 1,
            )
            trainer = dataclasses.replace(base.trainer, limit_train_batches=None)
            cfg = dataclasses.replace(base, data=data, trainer=trainer)
            out = EXPERIMENTS["audioset"].test_loaders_train_speed(cfg)
            print(f"native={native_on}: {out}")


if __name__ == "__main__":
    main()
