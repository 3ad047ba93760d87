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

    # -- state ----------------------------------------------------------
    def shard_state(self, state):
        """Params + opt_state per the TP rules (replicated on a pure-DP
        mesh), step replicated. shard_params matches TP rules on path
        suffixes, so AdamW's mu/nu shard exactly like their params."""
        return state.replace(
            params=shard_params(state.params, self.mesh),
            opt_state=shard_params(state.opt_state, self.mesh),
            step=jax.device_put(state.step, NamedSharding(self.mesh, P())),
        )

    # -- batches --------------------------------------------------------
    def device_put(self, x):
        """Shard a host batch array along its leading axis over ``data``."""
        x = np.asarray(x)
        return jax.device_put(x, NamedSharding(self.mesh, P(DATA_AXIS)))

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
    need = (n_data or (have // n_model)) * n_model
    if need > have:
        raise RuntimeError(
            f"trainer.n_data={n_data} n_model={n_model} needs {need} devices, "
            f"have {have} (tests force 8 virtual CPU devices via "
            "xla_force_host_platform_device_count)"
        )
    return MeshRuntime(make_mesh(n_data=n_data, n_model=n_model))
