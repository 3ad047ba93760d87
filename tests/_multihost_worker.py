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

    # --- the multi-process TRAIN step: one jitted DP step over a mesh that
    # SPANS the two processes, each feeding only its rank-local batch shard
    # (jax.make_array_from_process_local_data). The gradient psum therefore
    # crosses a real process boundary — the one distributed path the
    # reference's DDP exercises every step (ex_audioset.py:475-524) that
    # virtual single-process meshes cannot. The parent test asserts the
    # updated params/opt state equal the single-process step on the
    # concatenated batch, for two consecutive steps.
    from jax.sharding import NamedSharding, PartitionSpec as P

    from passt_tpu.models.passt import PaSSTConfig
    from passt_tpu.ops.frontend import MelConfig
    from passt_tpu.parallel.mesh import DATA_AXIS, make_mesh, make_parallel_train_step
    from passt_tpu.train.steps import create_train_state, make_optimizer, make_train_step

    cfg = PaSSTConfig(
        input_fdim=32, input_tdim=50, embed_dim=64, depth=2, num_heads=4,
        num_classes=8, s_patchout_t=1, s_patchout_f=1,
    )
    mcfg = MelConfig(n_mels=32, freqm=4, timem=8)
    tx = make_optimizer(lr=1e-3, steps_per_epoch=2)
    # identical deterministic init on every rank (same PRNGKey)
    model, state = create_train_state(cfg, tx, jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=nprocs, n_model=1)

    def rep(x):  # replicated: every process contributes the full value
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), np.asarray(x)
        )

    state = state.replace(
        params=jax.tree.map(rep, state.params),
        opt_state=jax.tree.map(rep, state.opt_state),
        step=rep(state.step),
    )

    # global batch 4: rank r contributes rows [2r, 2r+2) — process-id order,
    # matching np.concatenate in the parent's single-process reference
    grng = np.random.default_rng(7)
    batch_wave = grng.standard_normal((2 * nprocs, 16000)).astype(np.float32)
    batch_target = (grng.uniform(size=(2 * nprocs, 8)) < 0.3).astype(np.float32)
    bsh = NamedSharding(mesh, P(DATA_AXIS))

    def shard_local(g):
        loc = g[2 * pid : 2 * pid + 2]
        return jax.make_array_from_process_local_data(bsh, loc, global_shape=g.shape)

    batch = {"wave": shard_local(batch_wave), "target": shard_local(batch_target)}

    # production wiring: raw (unjitted) step wrapped for the mesh
    raw = make_train_step(model, tx, mcfg, use_mixup=True, jit=False)
    step_fn = make_parallel_train_step(raw, mesh, jit=True)
    rng = jax.random.PRNGKey(42)
    trained = {}
    with mesh:
        for s in (1, 2):
            state, _ = step_fn(state, batch, rng)
            # fully-replicated outputs: the local shard IS the full value
            leaves = jax.tree.leaves(state.params)
            trained.update(
                {f"s{s}_p{i}": np.asarray(l) for i, l in enumerate(leaves)}
            )
            oleaves = [
                l for l in jax.tree.leaves(state.opt_state) if hasattr(l, "shape")
            ]
            trained.update(
                {f"s{s}_o{i}": np.asarray(l) for i, l in enumerate(oleaves)}
            )

    np.savez(
        os.path.join(outdir, f"rank{pid}.npz"),
        out=out, target=target, loss=loss,
        g_out=g_out, g_target=g_target, g_loss=g_loss,
        ge_out=ge_out, ge_target=ge_target, ge_loss=ge_loss,
        indices=np.asarray(list(sampler), np.int64),
        **trained,
    )
    print(f"rank {pid} done", flush=True)


if __name__ == "__main__":
    main()
