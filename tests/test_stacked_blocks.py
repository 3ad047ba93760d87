"""blocks_impl="stacked": unrolled forward + hand-written deferred-dW
backward over stacked [depth, ...] params (models/stacked_blocks.py).

Oracle: AD through the scan model (same stacked param tree) and the loop
model (per-block tree, restacked). The hand backward must agree with AD
to float rounding — it IS the production gradient when enabled.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from passt_tpu.models.passt import PaSSTConfig, init_passt
from passt_tpu.models.pretrained import stack_block_params, unstack_block_params

KW = dict(
    input_fdim=64, input_tdim=100, embed_dim=64, depth=3, num_heads=4,
    num_classes=11, dtype="float32", attn_impl="fused",
)


@pytest.fixture(scope="module")
def trees():
    _, p_loop = init_passt(PaSSTConfig(**KW), jax.random.PRNGKey(0))
    return p_loop, stack_block_params(p_loop)


def _models():
    m_loop, _ = init_passt(PaSSTConfig(**KW), jax.random.PRNGKey(1))
    m_st, _ = init_passt(PaSSTConfig(**KW, blocks_impl="stacked"), jax.random.PRNGKey(1))
    m_sc, _ = init_passt(PaSSTConfig(**KW, blocks_impl="scan"), jax.random.PRNGKey(1))
    return m_loop, m_st, m_sc


def test_param_tree_matches_scan_layout():
    _, p_st = init_passt(PaSSTConfig(**KW, blocks_impl="stacked"), jax.random.PRNGKey(0))
    _, p_sc = init_passt(PaSSTConfig(**KW, blocks_impl="scan"), jax.random.PRNGKey(0))
    assert jax.tree_util.tree_structure(p_st) == jax.tree_util.tree_structure(p_sc)
    for a, b in zip(jax.tree.leaves(p_st), jax.tree.leaves(p_sc)):
        assert a.shape == b.shape and a.dtype == b.dtype
    # and it unstacks to a loop-layout tree
    _, p_loop = init_passt(PaSSTConfig(**KW), jax.random.PRNGKey(0))
    un = unstack_block_params(p_st)
    assert sorted(un) == sorted(p_loop)


def test_forward_matches_loop(trees, rng_np):
    p_loop, p_stacked = trees
    m_loop, m_st, _ = _models()
    x = jnp.asarray(rng_np.standard_normal((2, 1, 64, 100)).astype(np.float32))
    lo_l, feat_l = m_loop.apply({"params": p_loop}, x, train=False)
    lo_s, feat_s = m_st.apply({"params": p_stacked}, x, train=False)
    np.testing.assert_allclose(np.asarray(lo_l), np.asarray(lo_s), atol=2e-6)
    np.testing.assert_allclose(np.asarray(feat_l), np.asarray(feat_s), atol=2e-6)


@pytest.mark.slow
def test_hand_backward_matches_ad(trees, rng_np):
    """The deferred-batched-dW backward == AD of the scan model (same
    stacked tree) to fp32 rounding, every leaf."""
    _, p_stacked = trees
    _, m_st, m_sc = _models()
    x = jnp.asarray(rng_np.standard_normal((2, 1, 64, 100)).astype(np.float32))
    y = jnp.asarray((rng_np.uniform(size=(2, 11)) < 0.3).astype(np.float32))

    def loss(m):
        def f(p):
            lo, _ = m.apply({"params": p}, x, train=False)
            return optax.sigmoid_binary_cross_entropy(lo, y).mean()

        return f

    g_ad = jax.grad(loss(m_sc))(p_stacked)
    g_hand = jax.grad(loss(m_st))(p_stacked)
    flat_ad = jax.tree_util.tree_flatten_with_path(g_ad)[0]
    flat_hand = dict(jax.tree_util.tree_flatten_with_path(g_hand)[0])
    for path, leaf in flat_ad:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_hand[path]),
            atol=3e-6, rtol=1e-4, err_msg=str(path),
        )


@pytest.mark.slow
def test_train_mode_patchout_runs(trees, rng_np):
    """train=True (patchout active outside the blocks) runs and is finite;
    step-0 loss == the loop model's under the same rngs."""
    from passt_tpu.ops.frontend import MelConfig
    from passt_tpu.train.steps import TrainState, make_optimizer, make_train_step

    p_loop, p_stacked = trees
    kw = dict(KW, s_patchout_t=2, s_patchout_f=1, u_patchout=2)
    m_l, _ = init_passt(PaSSTConfig(**kw), jax.random.PRNGKey(0))
    m_s, _ = init_passt(PaSSTConfig(**kw, blocks_impl="stacked"), jax.random.PRNGKey(0))
    tx = make_optimizer(lr=1e-3, steps_per_epoch=4)
    mel_cfg = MelConfig(n_mels=64, freqm=4, timem=8)
    batch = {
        "wave": jnp.asarray(rng_np.standard_normal((2, 32000)).astype(np.float32)),
        "target": jnp.asarray((rng_np.uniform(size=(2, 11)) < 0.3).astype(np.float32)),
    }
    rng = jax.random.PRNGKey(7)
    step_l = make_train_step(m_l, tx, mel_cfg, jit=False)
    step_s = make_train_step(m_s, tx, mel_cfg, jit=False)
    st_l = TrainState(params=p_loop, opt_state=tx.init(p_loop), step=jnp.int32(0))
    st_s = TrainState(params=p_stacked, opt_state=tx.init(p_stacked), step=jnp.int32(0))
    _, met_l = step_l(st_l, batch, rng)
    st_s2, met_s = step_s(st_s, batch, rng)
    np.testing.assert_allclose(float(met_l["loss"]), float(met_s["loss"]), rtol=1e-5)
    assert int(st_s2.step) == 1


def test_stacked_rejects_dropout_and_droppath():
    with pytest.raises(NotImplementedError, match="drop_rate"):
        PaSSTConfig(**KW, blocks_impl="stacked", drop_rate=0.1).use_scan_blocks
    with pytest.raises(NotImplementedError, match="drop_path"):
        PaSSTConfig(**KW, blocks_impl="stacked", drop_path_rate=0.1).use_scan_blocks


@pytest.mark.slow
def test_bf16_discipline_close_to_loop(trees, rng_np):
    """bf16 compute: stacked forward tracks the loop forward within bf16
    rounding accumulation."""
    p_loop, p_stacked = trees
    kw = dict(KW, dtype="bfloat16")
    m_l, _ = init_passt(PaSSTConfig(**kw), jax.random.PRNGKey(0))
    m_s, _ = init_passt(PaSSTConfig(**kw, blocks_impl="stacked"), jax.random.PRNGKey(0))
    x = jnp.asarray(rng_np.standard_normal((2, 1, 64, 100)).astype(np.float32))
    lo_l, _ = m_l.apply({"params": p_loop}, x, train=False)
    lo_s, _ = m_s.apply({"params": p_stacked}, x, train=False)
    np.testing.assert_allclose(np.asarray(lo_l), np.asarray(lo_s), atol=5e-2)


def test_stacked_rejects_unhonored_knobs():
    """Knobs the stacked impl cannot honor raise instead of silently
    measuring the same graph (round-5 review finding)."""
    with pytest.raises(NotImplementedError, match="attn_impl"):
        PaSSTConfig(**{**KW, "attn_impl": "xla"}, blocks_impl="stacked").use_scan_blocks
    with pytest.raises(NotImplementedError, match="softmax"):
        PaSSTConfig(**KW, blocks_impl="stacked", softmax_fp32=False).use_scan_blocks
    with pytest.raises(NotImplementedError, match="remat"):
        PaSSTConfig(**KW, blocks_impl="stacked", remat=True).use_scan_blocks
