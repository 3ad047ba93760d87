"""blocks_impl="scan": one Block scanned over stacked [depth, ...] params.

The scan form exists for the BACKWARD graph (one weight-grad GEMM instance
+ one stacked optimizer fusion instead of `depth` separate per-block
fusions — PARITY.md "Profile attribution": 6.20 ms/step at 39-50% MXU in
the unrolled form). These tests pin the part that must never drift: the
MATH is the loop form's, exactly — same reference block semantics
(reference models/passt.py:364-380), interchangeable checkpoints.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from passt_tpu.models.passt import PaSSTConfig, init_passt
from passt_tpu.models.pretrained import (
    stack_block_params,
    unstack_block_params,
)

KW = dict(
    input_fdim=64, input_tdim=100, embed_dim=64, depth=3, num_heads=4,
    num_classes=11, dtype="float32", attn_impl="xla",
)


@pytest.fixture(scope="module")
def loop_model():
    cfg = PaSSTConfig(**KW)
    model, params = init_passt(cfg, jax.random.PRNGKey(0))
    return cfg, model, params


def test_logits_bitwise_equal_loop_vs_scan(loop_model, rng_np):
    _, m_loop, p_loop = loop_model
    m_scan, _ = init_passt(PaSSTConfig(**KW, blocks_impl="scan"), jax.random.PRNGKey(0))
    x = jnp.asarray(rng_np.standard_normal((2, 1, 64, 100)).astype(np.float32))
    lo_l, feat_l = m_loop.apply({"params": p_loop}, x, train=False)
    lo_s, feat_s = m_scan.apply({"params": stack_block_params(p_loop)}, x, train=False)
    assert jnp.array_equal(lo_l, lo_s)  # same ops in the same order
    assert jnp.array_equal(feat_l, feat_s)


def test_stack_unstack_roundtrip_exact(loop_model):
    _, _, p_loop = loop_model
    rt = unstack_block_params(stack_block_params(p_loop))
    assert jax.tree.all(jax.tree.map(lambda a, b: bool((a == b).all()), rt, p_loop))
    assert sorted(rt) == sorted(p_loop)


@pytest.mark.slow
def test_grads_match_loop_vs_scan(loop_model, rng_np):
    """d loss/d params agrees leaf-for-leaf after restacking — the scan
    backward (reverse scan + stacked dW) computes the same gradients as
    the unrolled form."""
    _, m_loop, p_loop = loop_model
    m_scan, _ = init_passt(PaSSTConfig(**KW, blocks_impl="scan"), jax.random.PRNGKey(0))
    x = jnp.asarray(rng_np.standard_normal((2, 1, 64, 100)).astype(np.float32))
    y = jnp.asarray((rng_np.uniform(size=(2, 11)) < 0.3).astype(np.float32))

    def loss_loop(p):
        logits, _ = m_loop.apply({"params": p}, x, train=False)
        return optax_sigmoid_ce(logits, y)

    def loss_scan(p):
        logits, _ = m_scan.apply({"params": p}, x, train=False)
        return optax_sigmoid_ce(logits, y)

    g_loop = jax.grad(loss_loop)(p_loop)
    g_scan = jax.grad(loss_scan)(stack_block_params(p_loop))
    g_scan_unstacked = unstack_block_params(g_scan)
    flat_l, _ = jax.tree_util.tree_flatten_with_path(g_loop)
    flat_s = dict(jax.tree_util.tree_flatten_with_path(g_scan_unstacked)[0])
    for path, leaf in flat_l:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_s[path]), rtol=1e-5, atol=1e-6,
            err_msg=str(path),
        )


def optax_sigmoid_ce(logits, y):
    import optax

    return optax.sigmoid_binary_cross_entropy(logits, y).mean()


@pytest.mark.slow
def test_scan_train_step_runs_and_matches_loop_loss(rng_np):
    """A full train step (mel + mixup + fwd/bwd + AdamW) through the scan
    model: runs, loss finite, and — with the loop model's params stacked in
    — step-0 loss identical to the loop model's (identical forward)."""
    from passt_tpu.ops.frontend import MelConfig
    from passt_tpu.train.steps import TrainState, make_optimizer, make_train_step

    tx = make_optimizer(lr=1e-3, steps_per_epoch=4)
    kw = dict(KW, s_patchout_t=2, s_patchout_f=1, u_patchout=2)
    cfg_l = PaSSTConfig(**kw)
    cfg_s = PaSSTConfig(**kw, blocks_impl="scan")
    m_l, p_l = init_passt(cfg_l, jax.random.PRNGKey(0))
    m_s, _ = init_passt(cfg_s, jax.random.PRNGKey(0))
    mel_cfg = MelConfig(n_mels=64, freqm=4, timem=8)
    batch = {
        "wave": jnp.asarray(rng_np.standard_normal((2, 32000)).astype(np.float32)),
        "target": jnp.asarray((rng_np.uniform(size=(2, 11)) < 0.3).astype(np.float32)),
    }
    rng = jax.random.PRNGKey(7)
    step_l = make_train_step(m_l, tx, mel_cfg, jit=False)
    step_s = make_train_step(m_s, tx, mel_cfg, jit=False)
    st_l = TrainState(params=p_l, opt_state=tx.init(p_l), step=jnp.int32(0))
    ps = stack_block_params(p_l)
    st_s = TrainState(params=ps, opt_state=tx.init(ps), step=jnp.int32(0))
    st_l2, met_l = step_l(st_l, batch, rng)
    st_s2, met_s = step_s(st_s, batch, rng)
    np.testing.assert_allclose(
        float(met_l["loss"]), float(met_s["loss"]), rtol=1e-6
    )
    assert int(st_s2.step) == 1
    # params moved
    assert not jnp.array_equal(
        st_s2.params["blocks"]["block"]["attn"]["qkv"]["kernel"],
        ps["blocks"]["block"]["attn"]["qkv"]["kernel"],
    )


def test_scan_requires_zero_droppath():
    with pytest.raises(NotImplementedError, match="drop_path"):
        PaSSTConfig(**KW, blocks_impl="scan", drop_path_rate=0.1).use_scan_blocks
    with pytest.raises(ValueError, match="blocks_impl"):
        PaSSTConfig(**KW, blocks_impl="bogus").use_scan_blocks


def test_tp_rules_shard_stacked_leaves():
    """Stacked [depth, in, out] block kernels pick up the per-block TP spec
    with the stack axis left unsharded."""
    from jax.sharding import PartitionSpec as P

    from passt_tpu.parallel.mesh import param_partition_spec

    assert param_partition_spec("blocks/block/attn/qkv/kernel", True, ndim=3) == P(
        None, None, "model"
    )
    assert param_partition_spec("blocks/block/attn/qkv/bias", True, ndim=2) == P(
        None, "model"
    )
    assert param_partition_spec("blocks/block/mlp/fc2/kernel", True, ndim=3) == P(
        None, "model", None
    )
    # per-block layout unchanged
    assert param_partition_spec("blocks_0/attn/qkv/kernel", True, ndim=2) == P(
        None, "model"
    )


@pytest.mark.slow
def test_scan_model_on_mesh_matches_single_device(loop_model, rng_np):
    """One train step of the scan model on a dp4×tp2 mesh == single-device,
    with the stacked leaves actually TP-sharded."""
    from passt_tpu.ops.frontend import MelConfig
    from passt_tpu.parallel import make_mesh, make_parallel_train_step, shard_batch, shard_params
    from passt_tpu.train.steps import TrainState, make_optimizer, make_train_step

    cfg = PaSSTConfig(**KW, blocks_impl="scan")
    model, params = init_passt(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(lr=1e-3, steps_per_epoch=4)
    mel_cfg = MelConfig(n_mels=64)
    batch = {
        "wave": jnp.asarray(rng_np.standard_normal((4, 32000)).astype(np.float32)),
        "target": jnp.asarray((rng_np.uniform(size=(4, 11)) < 0.3).astype(np.float32)),
    }
    rng = jax.random.PRNGKey(3)
    raw = make_train_step(model, tx, mel_cfg, use_mixup=False, donate=False, jit=False)

    st = TrainState(params=params, opt_state=tx.init(params), step=jnp.int32(0))
    _, met_single = raw(st, batch, rng)

    mesh = make_mesh(n_data=4, n_model=2)
    sp = shard_params(params, mesh)
    qkv_sh = sp["blocks"]["block"]["attn"]["qkv"]["kernel"].sharding
    assert qkv_sh.spec == jax.sharding.PartitionSpec(None, None, "model")
    st_m = TrainState(params=sp, opt_state=shard_params(tx.init(params), mesh), step=jnp.int32(0))
    step = make_parallel_train_step(raw, mesh)
    _, met_mesh = step(st_m, shard_batch(batch, mesh), rng)
    np.testing.assert_allclose(
        float(met_single["loss"]), float(met_mesh["loss"]), rtol=2e-6
    )


def test_npz_checkpoint_cross_layout_load(tmp_path, loop_model):
    """An .npz saved from the per-block layout loads into a scan model (and
    vice versa) through load_pretrained_params' layout adaptation."""
    from passt_tpu.models.pretrained import (
        load_pretrained_params,
        save_params_npz,
    )

    cfg, _, p_loop = loop_model
    path = str(tmp_path / "loop.npz")
    save_params_npz(path, p_loop)
    m_scan, init_s = init_passt(PaSSTConfig(**KW, blocks_impl="scan"), jax.random.PRNGKey(1))
    loaded = load_pretrained_params(path, cfg, init_s)
    assert "blocks" in loaded and "blocks_0" not in loaded
    assert loaded["blocks"]["block"]["attn"]["qkv"]["kernel"].shape[0] == KW["depth"]

    path2 = str(tmp_path / "scan.npz")
    save_params_npz(path2, loaded)
    _, init_l = init_passt(cfg, jax.random.PRNGKey(2))
    back = load_pretrained_params(path2, cfg, init_l)
    assert "blocks_0" in back and "blocks" not in back
    assert jax.tree.all(jax.tree.map(lambda a, b: bool((a == b).all()), back, p_loop))
