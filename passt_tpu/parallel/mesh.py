"""Device-mesh parallelism: data-parallel + optional tensor-parallel.

The reference's only distribution strategy is DDP by process fork with NCCL
allreduce (reference: ex_audioset.py:475-524; per-rank data sharding in
audioset/dataset.py:381-400). The TPU-native equivalent needs no
communication library and no process forking on a single host: a
``jax.sharding.Mesh`` over ICI with

- a ``data`` axis: batch sharded, params replicated — XLA inserts the
  gradient psum automatically (this alone reproduces DDP semantics), and
- an optional ``model`` axis (beyond-reference): attention-head- and
  MLP-sharded transformer weights for models/batches that exceed one chip,
  with activations all-reduced over ICI where GSPMD decides.

Everything is plain ``jax.jit`` over sharded arrays — GSPMD propagates the
layouts; collectives ride ICI.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A (data, model) mesh. Defaults to all devices on the data axis."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, f"mesh {n_data}x{n_model} exceeds {n} devices"
    grid = mesh_utils.create_device_mesh(
        (n_data, n_model), devices=devices[: n_data * n_model]
    )
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


#: (regex on the flattened param path, PartitionSpec) — first match wins.
#: Kernels are (in, out); attention qkv/mlp-up shard the output dim over
#: ``model``, their down-projections shard the input dim, so each block needs
#: a single all-reduce per sublayer (the Megatron pattern). Everything else
#: (embeddings, norms, biases on sharded outputs) follows GSPMD propagation
#: or stays replicated.
TP_RULES = [
    (r"attn/qkv/kernel$", P(None, MODEL_AXIS)),
    (r"attn/qkv/bias$", P(MODEL_AXIS)),
    (r"attn/proj/kernel$", P(MODEL_AXIS, None)),
    (r"mlp/fc1/kernel$", P(None, MODEL_AXIS)),
    (r"mlp/fc1/bias$", P(MODEL_AXIS)),
    (r"mlp/fc2/kernel$", P(MODEL_AXIS, None)),
]


def param_partition_spec(path: str, tp: bool, ndim: Optional[int] = None) -> P:
    """``ndim``: rank of the leaf being placed. The TP_RULES specs are
    written for the per-block (2-D kernel / 1-D bias) layout; the
    ``blocks_impl='scan'`` model stacks a leading [depth] axis onto every
    block leaf, so a matching leaf one rank larger gets the same spec with
    the stack axis left unsharded."""
    if tp:
        for pattern, spec in TP_RULES:
            if re.search(pattern, path):
                if ndim is not None and ndim == len(spec) + 1:
                    return P(None, *spec)
                return spec
    return P()  # replicated


def _flat_path(keypath) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in keypath)


def shard_params(params, mesh: Mesh, tp: Optional[bool] = None):
    """Place a param pytree on the mesh (replicated, or TP-sharded when the
    mesh has a nontrivial model axis)."""
    if tp is None:
        tp = mesh.shape[MODEL_AXIS] > 1

    def place(keypath, leaf):
        spec = param_partition_spec(
            _flat_path(keypath), tp, ndim=getattr(leaf, "ndim", None)
        )
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch, mesh: Mesh):
    """Shard every batch array along its leading (batch) axis over ``data``."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def make_parallel_train_step(step_fn, mesh: Mesh, jit: bool = True):
    """Wrap a (state, batch, rng) -> (state, metrics) step for the mesh.

    The step function is already pure; correct distribution falls out of
    input shardings (state placed by :func:`shard_params` /
    :func:`replicate`, batch by :func:`shard_batch`) + GSPMD propagation.
    This wrapper pins (a) the batch sharding constraint, so a replicated
    batch accidentally passed in still gets split rather than silently
    computed redundantly, and (b) the OUTPUT state's param/opt shardings to
    the canonical path-suffix rules (the same ones :func:`shard_params`
    applies). (b) matters for optimizer transforms whose internals GSPMD
    cannot see through — the fused Pallas AdamW flattens each leaf through
    a pallas_call, and without the output constraint the updated moments
    come back replicated, silently regathering the TP shards every step.
    """
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    tp = mesh.shape[MODEL_AXIS] > 1

    def constrain_like_params(tree):
        def pin(keypath, leaf):
            if not hasattr(leaf, "ndim") or leaf.ndim == 0:
                return leaf
            spec = param_partition_spec(_flat_path(keypath), tp, ndim=leaf.ndim)
            return jax.lax.with_sharding_constraint(leaf, NamedSharding(mesh, spec))

        return jax.tree_util.tree_map_with_path(pin, tree)

    def wrapped(state, batch, rng):
        batch = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, batch_sharding), batch
        )
        new_state, metrics = step_fn(state, batch, rng)
        new_state = new_state.replace(
            params=constrain_like_params(new_state.params),
            opt_state=constrain_like_params(new_state.opt_state),
        )
        return new_state, metrics

    # jit=False returns the constrained-but-unjitted step for callers that
    # embed it in a larger jitted graph (model_speed_test's fori_loop)
    return jax.jit(wrapped, donate_argnums=(0,)) if jit else wrapped
