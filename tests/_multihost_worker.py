"""Worker for test_multihost.py: one JAX process of a 2-process CPU job.

Exercises the REAL multi-process path (jax.distributed.initialize +
multihost_utils.process_allgather): rank-sliced eval outputs of UNEQUAL
lengths gathered via _gather_across_processes, and the auto-wired sampler
rank sharding. Writes results as .npz for the parent test to verify.

Usage: python _multihost_worker.py <coordinator> <num_procs> <pid> <outdir>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    coord, nprocs, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nprocs, process_id=pid
    )
    assert jax.process_count() == nprocs and jax.process_index() == pid

    from passt_tpu.data.sampler import WeightedEpochSampler
    from passt_tpu.train.loop import _gather_across_processes

    # --- gather: per-rank eval shards with UNEQUAL lengths (pad+trim path)
    n = 7 if pid == 0 else 5
    rng = np.random.default_rng(100 + pid)
    out = rng.standard_normal((n, 4)).astype(np.float32)
    target = (rng.uniform(size=(n, 4)) < 0.4).astype(np.float32)
    loss = rng.standard_normal(n).astype(np.float32)
    g_out, g_target, g_loss = _gather_across_processes(out, target, loss)

    # --- gather: one rank holds ZERO eval examples (tiny eval set
    # round-robined over more hosts than batches) — evaluate() fabricates
    # (0,)-shaped float32 placeholders; the gather must recover the
    # trailing shapes from the non-empty rank and must not deadlock.
    if pid == 0:
        e_out, e_target, e_loss = out, target, loss
    else:
        z = np.zeros((0,), np.float32)
        e_out, e_target, e_loss = z, z, z
    ge_out, ge_target, ge_loss = _gather_across_processes(e_out, e_target, e_loss)

    # --- sampler: auto process-topology sharding (what _resolve_rank wires)
    weights = np.linspace(0.5, 2.0, 40)
    sampler = WeightedEpochSampler(
        weights, epoch_len=20,
        num_replicas=jax.process_count(), rank=jax.process_index(), seed=9,
    )
    sampler.set_epoch(2)
    np.savez(
        os.path.join(outdir, f"rank{pid}.npz"),
        out=out, target=target, loss=loss,
        g_out=g_out, g_target=g_target, g_loss=g_loss,
        ge_out=ge_out, ge_target=ge_target, ge_loss=ge_loss,
        indices=np.asarray(list(sampler), np.int64),
    )
    print(f"rank {pid} done", flush=True)


if __name__ == "__main__":
    main()
