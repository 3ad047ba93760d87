"""Worker for test_multihost.py::test_two_process_fit_checkpoint_resume.

One JAX process of a REAL 2-process CPU job that runs the actual ``fit()``
loop end to end — epochs, rank-sliced loaders, SWA, best-metric retention,
COLLECTIVE orbax saves (every rank enters ``CheckpointManager.save``) —
then restores the best checkpoint and resumes for one more epoch. This is
the multi-host behavior SCALING.md promises (preemption-safe collective
saves) executed rather than documented; the reference's closest analogue
is Lightning DDP checkpointing (ex_audioset.py:315-319 + :499-524).

Usage: python _multihost_fit_worker.py <coordinator> <num_procs> <pid> <outdir>
  <outdir>/ckpt is the SHARED checkpoint dir (orbax collective saves);
  results land in <outdir>/fit_rank{pid}.json + .npz for the parent test.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


class ShardLoader:
    """Rank-sliced synthetic loader: every rank sees the same GLOBAL epoch
    stream (deterministic in (epoch, step)); rank r yields rows
    [r*B_local, (r+1)*B_local) of each global batch — process-id order, the
    same contract as the production sampler's ``indices[rank::N]``."""

    def __init__(self, n_batches, global_b, n_classes, t, rank, nprocs,
                 epoch_dependent=True, ragged_last=None):
        self.n_batches = n_batches
        self.global_b = global_b
        self.n_classes = n_classes
        self.t = t
        self.rank = rank
        self.nprocs = nprocs
        self.epoch = 0
        self.epoch_dependent = epoch_dependent
        # ragged_last: per-rank row count of the LAST batch (unequal eval
        # shards, e.g. {0: 2, 1: 1}) — exercises the pad/gather path
        self.ragged_last = ragged_last

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __len__(self):
        return self.n_batches

    def __iter__(self):
        for i in range(self.n_batches):
            seed = (1000 * self.epoch + i) if self.epoch_dependent else i
            g = np.random.default_rng(seed)
            wave = g.standard_normal((self.global_b, self.t)).astype(np.float32)
            target = (g.uniform(size=(self.global_b, self.n_classes)) < 0.3
                      ).astype(np.float32)
            b_local = self.global_b // self.nprocs
            lo = self.rank * b_local
            w, tg = wave[lo:lo + b_local], target[lo:lo + b_local]
            if self.ragged_last is not None and i == self.n_batches - 1:
                k = self.ragged_last[self.rank]
                w, tg = w[:k], tg[:k]
            yield {"wave": w, "target": tg}


def main():
    coord, nprocs, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nprocs, process_id=pid
    )
    assert jax.process_count() == nprocs and jax.process_index() == pid

    from passt_tpu.models.passt import PaSSTConfig
    from passt_tpu.ops.frontend import MelConfig
    from passt_tpu.parallel.mesh import make_mesh
    from passt_tpu.parallel.runtime import MeshRuntime
    from passt_tpu.train.loop import MetricsLogger, fit, restore_checkpoint
    from passt_tpu.train.steps import (
        create_train_state, make_optimizer, make_train_step,
    )

    cfg = PaSSTConfig(
        input_fdim=32, input_tdim=50, embed_dim=64, depth=2, num_heads=4,
        num_classes=8, s_patchout_t=1, s_patchout_f=1,
    )
    mcfg = MelConfig(n_mels=32, freqm=4, timem=8)
    tx = make_optimizer(lr=1e-3, steps_per_epoch=3)
    model, state = create_train_state(cfg, tx, jax.random.PRNGKey(0))

    runtime = MeshRuntime(make_mesh(n_data=nprocs, n_model=1))
    state = runtime.shard_state(state)
    raw = make_train_step(model, tx, mcfg, use_mixup=True, jit=False)
    train_step = runtime.wrap_train_step(raw)
    from passt_tpu.train.steps import make_eval_step

    eval_step = make_eval_step(model, mcfg)

    train_loader = ShardLoader(3, 4, 8, 16000, pid, nprocs)
    # unequal eval shards: 3 batches of global 4, last one ragged (rank0: 2
    # rows, rank1: 1) -> 11 eval examples total, 6 on rank0 / 5 on rank1
    val_loader = ShardLoader(
        3, 4, 8, 16000, pid, nprocs, epoch_dependent=False,
        ragged_last={0: 2, 1: 1},
    )

    ckpt_dir = os.path.join(outdir, "ckpt")
    rng = jax.random.PRNGKey(42)
    res = fit(
        train_step=train_step,
        eval_step=eval_step,
        state=state,
        train_loader=train_loader,
        val_loader=val_loader,
        max_epochs=3,
        base_rng=rng,
        logger=MetricsLogger(quiet=True),
        checkpoint_dir=ckpt_dir,
        keep_last_n=3,
        monitor="allap",
        monitor_mode="max",
        swa_epoch_start=2,
        swa_freq=1,
        runtime=runtime,
        handle_sigterm=False,
        # int16 wave transfer + DeviceFeed under MULTIPLE processes: the
        # feed thread must do transfers only; the jitted dequant on the
        # global batch is dispatched from the main thread, in the same
        # order on every rank (a feed-thread dispatch would race the main
        # thread's collective dispatches — multi-controller ordering)
        transfer_dtype="int16",
        device_prefetch=2,
    )

    # --- collective restore of the BEST checkpoint + resume for 1 epoch
    template = create_train_state(cfg, tx, jax.random.PRNGKey(0))[1]
    template = runtime.shard_state(template)
    best_state, best_swa, best_epoch = restore_checkpoint(
        ckpt_dir, template, monitor="allap"
    )
    latest_state, latest_swa, latest_epoch = restore_checkpoint(ckpt_dir, template)

    res2 = fit(
        train_step=train_step,
        eval_step=eval_step,
        state=latest_state,
        train_loader=train_loader,
        val_loader=val_loader,
        max_epochs=4,
        start_epoch=latest_epoch + 1,
        base_rng=rng,
        logger=MetricsLogger(quiet=True),
        checkpoint_dir=ckpt_dir,
        keep_last_n=3,
        monitor="allap",
        monitor_mode="max",
        swa_epoch_start=2,
        swa_freq=1,
        swa_restore=latest_swa,
        runtime=runtime,
        handle_sigterm=False,
    )

    hist = res.history + res2.history
    with open(os.path.join(outdir, f"fit_rank{pid}.json"), "w") as f:
        json.dump(
            {
                "history": hist,
                "best_epoch": int(best_epoch),
                "latest_epoch": int(latest_epoch),
                "swa_n_final": int(res2.swa.n_averaged),
            },
            f,
        )
    # final params must be identical across ranks (each rank's local
    # replica of the pure-DP state)
    leaves = jax.tree.leaves(res2.state.params)
    np.savez(
        os.path.join(outdir, f"fit_rank{pid}.npz"),
        **{f"p{i}": np.asarray(l.addressable_data(0)) for i, l in enumerate(leaves)},
        best_p0=np.asarray(jax.tree.leaves(best_state.params)[0].addressable_data(0)),
    )
    print(f"fit rank {pid} done", flush=True)


if __name__ == "__main__":
    main()
