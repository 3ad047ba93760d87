"""Recipe-level mesh activation: ``trainer.n_data`` / ``trainer.n_model``.

The reference activates data-parallel training with one env var (``DDP=2``
forks N processes, reference: ex_audioset.py:499-524). The TPU-native
equivalent is one config override::

    python -m passt_tpu.cli audioset main trainer.n_data=8 ...

which builds a ``(data, model)`` :class:`jax.sharding.Mesh`, shards the
train state and every batch, and lets GSPMD insert the gradient psum over
ICI. ``trainer.n_model=2`` additionally turns on Megatron-style tensor
parallelism (beyond the reference's capabilities).

This module is the small glue layer between the experiment runner and
:mod:`passt_tpu.parallel.mesh`: state placement, per-batch device_put with
the data-axis sharding, and eval-batch padding (eval sets are rarely
divisible by the mesh size; padded rows are trimmed from the outputs before
metrics).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from passt_tpu.parallel.mesh import (
    DATA_AXIS,
    make_mesh,
    make_parallel_train_step,
    shard_params,
)


@dataclasses.dataclass
class MeshRuntime:
    """Everything the experiment runner needs to train/eval on a mesh."""

    mesh: Mesh

    @property
    def n_data(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    @property
    def n_model(self) -> int:
        from passt_tpu.parallel.mesh import MODEL_AXIS

        return self.mesh.shape[MODEL_AXIS]

    # -- multi-process ---------------------------------------------------
    @property
    def spans_processes(self) -> bool:
        """True when the mesh crosses JAX processes (real multi-host /
        multi-process runs, reference DDP's N-GPU fork). Host arrays must
        then be assembled into global jax.Arrays from per-process shards
        (``jax.make_array_from_process_local_data``) instead of a plain
        ``device_put`` — each process only holds ITS slice of the batch
        (rank-sliced sampler, data/sampler.py)."""
        return jax.process_count() > 1

    def local_replica(self, tree):
        """This process's addressable copy of a replicated (pure-DP) tree —
        used by evaluate() in multi-process runs: each rank evals its OWN
        loader shard locally (lockstep mesh eval would require identical
        per-rank batch counts, which rank-sliced eval sets don't have),
        then the host gather merges (reference DDP all_gather before
        'allap', ex_audioset.py:274-285)."""
        if self.n_model > 1 and self.spans_processes:
            raise NotImplementedError(
                "local eval of TP-sharded params across processes; keep the "
                "model axis within one process (n_model <= devices/host)"
            )
        return jax.tree.map(
            lambda p: p.addressable_data(0) if isinstance(p, jax.Array) else p,
            tree,
        )

    def ensure_global(self, x):
        """Make a leaf safe for a COLLECTIVE orbax save in multi-process
        runs: orbax refuses host-local jax.Arrays there (e.g. the ``swa_n``
        scalar built with ``jnp.int32`` outside the sharded step). Such
        leaves are replicated identically on every rank, so assemble them
        into a process-spanning replicated global array; already-global
        (non-fully-addressable) leaves pass through untouched."""
        if isinstance(x, jax.Array) and not x.sharding.is_fully_addressable:
            return x
        rep = NamedSharding(self.mesh, P())
        return jax.make_array_from_process_local_data(rep, np.asarray(x))

    # -- state ----------------------------------------------------------
    def shard_state(self, state):
        """Params + opt_state per the TP rules (replicated on a pure-DP
        mesh), step replicated. shard_params matches TP rules on path
        suffixes, so AdamW's mu/nu shard exactly like their params."""
        if self.spans_processes:
            if self.n_model > 1:
                raise NotImplementedError(
                    "TP sharding across processes (shard_params would need "
                    "per-process slicing); keep the model axis within a host"
                )
            # pure DP: every leaf is replicated and every process holds the
            # identical full value (same PRNGKey init), so local == global
            rep = NamedSharding(self.mesh, P())

            def put(x):
                return jax.make_array_from_process_local_data(rep, np.asarray(x))

            return state.replace(
                params=jax.tree.map(put, state.params),
                opt_state=jax.tree.map(put, state.opt_state),
                step=put(state.step),
            )
        return state.replace(
            params=shard_params(state.params, self.mesh),
            opt_state=shard_params(state.opt_state, self.mesh),
            step=jax.device_put(state.step, NamedSharding(self.mesh, P())),
        )

    @property
    def local_batch_scale(self) -> int:
        """How many per-replica batches THIS PROCESS's loader must build:
        the data-axis devices local to this host. Multi-process global
        arrays are assembled as the concatenation of per-rank shards
        (device_put below), so scaling the loader by the GLOBAL n_data
        would inflate the global batch by the process count (round-5
        review finding)."""
        pc = jax.process_count()
        if self.n_data % pc != 0:
            raise RuntimeError(
                f"data axis ({self.n_data}) must divide evenly across "
                f"{pc} processes"
            )
        return self.n_data // pc

    # -- batches --------------------------------------------------------
    def device_put(self, x):
        """Shard a host batch array along its leading axis over ``data``.

        Multi-process: ``x`` is this process's LOCAL shard (the rank-sliced
        loader's batch); the global array is assembled across processes,
        global batch = sum of the per-rank batches in process-id order."""
        x = np.asarray(x)
        sh = NamedSharding(self.mesh, P(DATA_AXIS))
        if self.spans_processes:
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)

    def pad_eval_batch(
        self, arrays: Dict[str, np.ndarray]
    ) -> Tuple[Dict[str, jax.Array], int]:
        """Pad a (possibly ragged tail) eval batch up to a multiple of
        ``n_data`` by repeating the last row, shard it, and return the
        original row count so callers trim outputs back to it."""
        n = int(next(iter(arrays.values())).shape[0])
        pad = (-n) % self.n_data
        out = {}
        for k, a in arrays.items():
            a = np.asarray(a)
            if pad:
                a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], axis=0)
            out[k] = self.device_put(a)
        return out, n

    # -- steps ----------------------------------------------------------
    def wrap_train_step(self, raw_step, jit: bool = True):
        return make_parallel_train_step(raw_step, self.mesh, jit=jit)


def maybe_mesh_runtime(trainer_cfg) -> Optional[MeshRuntime]:
    """Build a MeshRuntime iff the config asks for one (n_data set and/or
    n_model > 1); None keeps the plain single-device step."""
    n_data = getattr(trainer_cfg, "n_data", None)
    n_model = getattr(trainer_cfg, "n_model", 1) or 1
    if n_data is None and n_model == 1:
        return None
    have = len(jax.devices())
    if n_model > have:
        # guard this case explicitly: (have // n_model) rounds to 0 and
        # would defeat the need<=have check below (round-5 review finding)
        raise RuntimeError(
            f"trainer.n_model={n_model} exceeds the {have} available devices"
        )
    if n_data is not None and n_data < 1:
        raise RuntimeError(f"trainer.n_data must be >= 1, got {n_data}")
    need = (n_data or (have // n_model)) * n_model
    if need > have:
        raise RuntimeError(
            f"trainer.n_data={n_data} n_model={n_model} needs {need} devices, "
            f"have {have} (tests force 8 virtual CPU devices via "
            "xla_force_host_platform_device_count)"
        )
    return MeshRuntime(make_mesh(n_data=n_data, n_model=n_model))
