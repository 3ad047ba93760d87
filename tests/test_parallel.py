"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Validates: DP gradient equivalence (8-way sharded batch == single-device),
TP param layouts, and a full dp x tp train step executing with correct
output shardings — the semantics the reference gets from DDP forking +
NCCL allreduce (ex_audioset.py:475-524), here from GSPMD.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from passt_tpu.models.passt import PaSSTConfig
from passt_tpu.ops.frontend import MelConfig
from passt_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    replicate,
    shard_batch,
    shard_params,
)
from passt_tpu.train.steps import create_train_state, make_optimizer, make_train_step


def _tiny():
    cfg = PaSSTConfig(
        input_fdim=32, input_tdim=50, embed_dim=64, depth=2, num_heads=4,
        num_classes=8, s_patchout_t=1, u_patchout=2,
    )
    mcfg = MelConfig(n_mels=32, freqm=4, timem=8)
    tx = make_optimizer(lr=1e-3, steps_per_epoch=5)
    model, state = create_train_state(cfg, tx, jax.random.PRNGKey(0))
    return cfg, mcfg, tx, model, state


def _batch(rng_np, b=8):
    waves = rng_np.standard_normal((b, 16000)).astype(np.float32)
    targets = (rng_np.uniform(size=(b, 8)) < 0.3).astype(np.float32)
    return {"wave": jnp.asarray(waves), "target": jnp.asarray(targets)}


@pytest.mark.slow
def test_dp_step_matches_single_device(rng_np):
    cfg, mcfg, tx, model, state = _tiny()
    raw = make_train_step(model, tx, mcfg, use_mixup=False, donate=False, jit=False)
    batch = _batch(rng_np)
    rng = jax.random.PRNGKey(7)

    single_state, single_metrics = jax.jit(raw)(state, batch, rng)

    mesh = make_mesh(n_data=8, n_model=1)
    sh_state = jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), state)
    sh_batch = shard_batch(batch, mesh)
    par = make_parallel_train_step(raw, mesh)
    par_state, par_metrics = par(sh_state, sh_batch, rng)

    np.testing.assert_allclose(
        float(par_metrics["loss"]), float(single_metrics["loss"]), rtol=2e-6
    )
    flat_a = jax.tree.leaves(single_state.params)
    flat_b = jax.tree.leaves(par_state.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_tp_param_layouts():
    cfg, mcfg, tx, model, state = _tiny()
    mesh = make_mesh(n_data=4, n_model=2)
    params = shard_params(state.params, mesh)
    qkv = params["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, "model")
    fc2 = params["blocks_0"]["mlp"]["fc2"]["kernel"]
    assert fc2.sharding.spec == P("model", None)
    cls = params["cls_token"]
    assert cls.sharding.spec == P()


@pytest.mark.slow
def test_dp_tp_train_step_executes(rng_np):
    cfg, mcfg, tx, model, state = _tiny()
    mesh = make_mesh(n_data=4, n_model=2)
    params = shard_params(state.params, mesh)
    # AdamW mu/nu mirror the param tree; shard_params matches TP rules on
    # path suffixes, so the optimizer state shards like its params.
    opt_state = shard_params(state.opt_state, mesh)
    mu = opt_state[0].mu
    assert mu["blocks_0"]["attn"]["qkv"]["kernel"].sharding.spec == P(None, "model")
    assert mu["cls_token"].sharding.spec == P()
    state = state.replace(params=params, opt_state=opt_state)
    batch = shard_batch(_batch(rng_np), mesh)
    raw = make_train_step(model, tx, mcfg, use_mixup=True, donate=False, jit=False)
    par = make_parallel_train_step(raw, mesh)
    new_state, metrics = par(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # TP layout preserved through the optimizer update (params and mu).
    qkv = new_state.params["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, "model")
    new_mu = new_state.opt_state[0].mu
    assert new_mu["blocks_0"]["attn"]["qkv"]["kernel"].sharding.spec == P(None, "model")
    # Second step runs (donation-free path) and changes the loss.
    new_state2, metrics2 = par(new_state, batch, jax.random.PRNGKey(1))
    assert float(metrics2["loss"]) != float(metrics["loss"])


def test_eval_outputs_gatherable(rng_np):
    """all_gather-equivalent for eval: outputs sharded over data come back
    addressable for host-side mAP (the reference all_gathers eval outputs,
    ex_audioset.py:274-285)."""
    from passt_tpu.train.steps import make_eval_step

    cfg, mcfg, tx, model, state = _tiny()
    mesh = make_mesh(n_data=8)
    params = replicate(state.params, mesh)
    ev = make_eval_step(model, mcfg)
    batch = shard_batch(_batch(rng_np, b=16), mesh)
    out = ev(params, batch)
    arr = np.asarray(out["out"])  # implicit cross-device gather to host
    assert arr.shape == (16, 8)


def test_grad_accum_opt_state_shards_on_mesh(rng_np):
    """trainer.grad_accum wraps the optimizer in optax.MultiSteps, whose
    state nests the inner AdamW state AND an acc_grads tree mirroring the
    params — shard_params matches TP rules on path suffixes, so both must
    pick up the TP layouts, and a dp x tp accumulated step must execute."""
    cfg = PaSSTConfig(
        input_fdim=32, input_tdim=50, embed_dim=64, depth=2, num_heads=4,
        num_classes=8,
    )
    mcfg = MelConfig(n_mels=32, freqm=4, timem=8)
    tx = make_optimizer(lr=1e-3, steps_per_epoch=4, grad_accum=2)
    model, state = create_train_state(cfg, tx, jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=4, n_model=2)
    params = shard_params(state.params, mesh)
    opt_state = shard_params(state.opt_state, mesh)
    # the accumulator and the inner AdamW moments both carry TP layouts
    acc = opt_state.acc_grads
    assert acc["blocks_0"]["attn"]["qkv"]["kernel"].sharding.spec == P(None, "model")
    mu = opt_state.inner_opt_state[0].mu
    assert mu["blocks_0"]["mlp"]["fc2"]["kernel"].sharding.spec == P("model", None)
    state = state.replace(params=params, opt_state=opt_state)
    raw = make_train_step(model, tx, mcfg, use_mixup=False, donate=False, jit=False)
    par = make_parallel_train_step(raw, mesh)
    batch = shard_batch(_batch(rng_np), mesh)
    # the parallel step donates its input state: snapshot before stepping
    p0 = np.asarray(jax.device_get(state.params["cls_token"]))
    st1, m1 = par(state, batch, jax.random.PRNGKey(1))
    p1 = np.asarray(jax.device_get(st1.params["cls_token"]))
    st2, m2 = par(st1, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    # after micro-step 1 params are unchanged; after micro-step 2 they move
    p2 = np.asarray(jax.device_get(st2.params["cls_token"]))
    np.testing.assert_array_equal(p0, p1)
    assert not np.array_equal(p1, p2)


@pytest.mark.slow
def test_dp_tp_step_with_fused_kernels(rng_np):
    """The production kernel path under GSPMD: fused Pallas attention
    (attn_impl='fused', interpreted on CPU) + fused Pallas AdamW with bf16
    stochastic-rounded moments — must shard, execute, and keep the TP
    layout through the update (what a real multi-chip TPU run uses)."""
    from passt_tpu.train.optim import FusedAdamWState

    cfg = PaSSTConfig(
        input_fdim=32, input_tdim=50, embed_dim=64, depth=2, num_heads=4,
        num_classes=8, s_patchout_t=1, u_patchout=2, attn_impl="fused",
        ln_impl="fused",
    )
    mcfg = MelConfig(n_mels=32, freqm=4, timem=8)
    tx = make_optimizer(lr=1e-3, steps_per_epoch=5, moments_dtype="bfloat16_sr")
    model, state = create_train_state(cfg, tx, jax.random.PRNGKey(0))
    assert isinstance(state.opt_state, FusedAdamWState)
    mesh = make_mesh(n_data=4, n_model=2)
    state = state.replace(
        params=shard_params(state.params, mesh),
        opt_state=shard_params(state.opt_state, mesh),
    )
    assert state.opt_state.mu["blocks_0"]["attn"]["qkv"]["kernel"].dtype == jnp.bfloat16
    batch = shard_batch(_batch(rng_np), mesh)
    raw = make_train_step(model, tx, mcfg, use_mixup=True, donate=False, jit=False)
    par = make_parallel_train_step(raw, mesh)
    new_state, metrics = par(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    qkv = new_state.params["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, "model")
    assert new_state.opt_state.mu["blocks_0"]["attn"]["qkv"]["kernel"].sharding.spec == P(None, "model")


def test_tp_halves_per_device_param_and_opt_bytes():
    """TP evidence beyond "executes": per-device resident bytes, counted
    exactly per leaf. Under dp4 x tp2 every TP-ruled leaf (qkv/proj/fc1/fc2
    kernels+biases) holds nbytes/2 per device, everything else nbytes; the
    same accounting covers the AdamW moments. At flagship scale the sharded
    leaves are ~98% of the 86M params, so n_model=2 cuts per-device
    param+optimizer memory nearly in half — the measured basis for the
    SCALING.md claim."""
    from passt_tpu.parallel.mesh import _flat_path, param_partition_spec

    cfg, mcfg, tx, model, state = _tiny()
    mesh = make_mesh(n_data=4, n_model=2)
    dev0 = mesh.devices.flatten()[0]

    def device0_bytes(tree):
        total = 0
        for leaf in jax.tree.leaves(tree):
            for shard in leaf.addressable_shards:
                if shard.device == dev0:
                    total += shard.data.nbytes
        return total

    def expected_bytes(tree, tp):
        total = 0
        def add(keypath, leaf):
            nonlocal total
            spec = param_partition_spec(_flat_path(keypath), tp)
            frac = 2 if any(ax == "model" for ax in spec if ax) else 1
            total += leaf.nbytes // frac
        jax.tree_util.tree_map_with_path(add, tree)
        return total

    for tree in (state.params, state.opt_state):
        repl = replicate(tree, mesh)
        shrd = shard_params(tree, mesh)
        got_repl, got_tp = device0_bytes(repl), device0_bytes(shrd)
        assert got_repl == expected_bytes(tree, tp=False)
        assert got_tp == expected_bytes(tree, tp=True)
        assert got_tp < got_repl  # TP strictly reduces per-device memory


def test_local_batch_scale_and_runtime_validation():
    """local_batch_scale divides the data axis by the process count (the
    loader builds the LOCAL shard; scaling by global n_data would inflate
    the global batch by P — round-5 review finding), and degenerate
    n_model/n_data configs raise clearly instead of crashing inside
    mesh_utils."""
    import pytest

    from passt_tpu.parallel.runtime import MeshRuntime, maybe_mesh_runtime
    from passt_tpu.parallel.mesh import make_mesh

    rt = MeshRuntime(make_mesh(n_data=4, n_model=2))
    assert rt.local_batch_scale == 4  # single process: local == global

    class T:
        n_data = None
        n_model = 16  # > 8 virtual devices

    with pytest.raises(RuntimeError, match="exceeds"):
        maybe_mesh_runtime(T())

    class T2:
        n_data = 0
        n_model = 1

    with pytest.raises(RuntimeError, match="must be >= 1"):
        maybe_mesh_runtime(T2())
