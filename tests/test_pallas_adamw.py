"""Fused Pallas AdamW (ops/pallas/adamw.py) vs the optax oracle, plus the
config-activated path through make_optimizer and a mini train step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from passt_tpu.ops.pallas.adamw import FusedAdamWState, fused_adamw


def _params(seed=0):
    r = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(r.standard_normal((300, 40)), jnp.float32),
        "b": jnp.asarray(r.standard_normal((40,)), jnp.float32),  # pad path
        "scalarish": jnp.asarray(r.standard_normal((3,)), jnp.float32),
    }


def test_fp32_matches_optax_adamw():
    params = _params()
    tx = fused_adamw(
        1e-3, weight_decay=1e-4, moments_dtype=jnp.float32, sr_nu=False
    )
    ref = optax.adamw(1e-3, weight_decay=1e-4)
    s, rs = tx.init(params), ref.init(params)
    p1 = p2 = params
    for step in range(5):
        g = jax.tree_util.tree_map(lambda p: jnp.cos(p * (step + 1)), p1)
        u, s = tx.update(g, s, p1)
        p1 = optax.apply_updates(p1, u)
        g2 = jax.tree_util.tree_map(lambda p: jnp.cos(p * (step + 1)), p2)
        u2, rs = ref.update(g2, rs, p2)
        p2 = optax.apply_updates(p2, u2)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_schedule_and_bias_correction():
    """First-step update (bias correction t=1) under a schedule matches
    optax exactly — the schedule is evaluated at the pre-update count."""
    params = _params(1)
    ref = optax.adamw(optax.constant_schedule(1e-3), weight_decay=1e-4)
    tx2 = fused_adamw(optax.constant_schedule(1e-3), weight_decay=1e-4,
                      moments_dtype=jnp.float32, sr_nu=False)
    s, rs = tx2.init(params), ref.init(params)
    p1 = p2 = params
    g = jax.tree_util.tree_map(jnp.sin, params)
    u, s = tx2.update(g, s, p1)
    u2, rs = ref.update(g, rs, p2)
    for a, b in zip(jax.tree_util.tree_leaves(u), jax.tree_util.tree_leaves(u2)):
        # first-step update: bias correction t=1 must match exactly
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-7)


def test_bf16_moments_track_fp32():
    """bf16 moment storage stays close to the fp32 trajectory over many
    steps (deterministic rounding on CPU; hardware adds SR for nu)."""
    params = _params(2)
    tx16 = fused_adamw(1e-3, moments_dtype=jnp.bfloat16)
    tx32 = fused_adamw(1e-3, moments_dtype=jnp.float32, sr_nu=False)
    s16, s32 = tx16.init(params), tx32.init(params)
    assert jax.tree_util.tree_leaves(s16.mu)[0].dtype == jnp.bfloat16
    p16 = p32 = params
    for step in range(10):
        g = jax.tree_util.tree_map(lambda p: jnp.sin(p + step), p16)
        u, s16 = tx16.update(g, s16, p16)
        p16 = optax.apply_updates(p16, u)
        g2 = jax.tree_util.tree_map(lambda p: jnp.sin(p + step), p32)
        u2, s32 = tx32.update(g2, s32, p32)
        p32 = optax.apply_updates(p32, u2)
    for a, b in zip(jax.tree_util.tree_leaves(p16), jax.tree_util.tree_leaves(p32)):
        # relative parameter drift stays at bf16-rounding scale
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3)


def test_config_activated_train_step():
    """opt_moments_dtype='bfloat16_sr' trains through the real step."""
    from passt_tpu.models.passt import PaSSTConfig
    from passt_tpu.train.steps import create_train_state, make_optimizer, make_train_step
    from passt_tpu.ops.frontend import MelConfig

    cfg = PaSSTConfig(
        input_fdim=32, input_tdim=64, embed_dim=32, depth=1, num_heads=2,
        num_classes=5, patch_size=(8, 8), stride=(8, 8), dtype="float32",
    )
    tx = make_optimizer(lr=1e-3, steps_per_epoch=10, moments_dtype="bfloat16_sr")
    model, state = create_train_state(cfg, tx, jax.random.PRNGKey(0))
    assert isinstance(state.opt_state, FusedAdamWState)
    mel_cfg = MelConfig(n_mels=32, stft_method="matmul")
    step = make_train_step(model, tx, mel_cfg, input_tdim=64)
    r = np.random.default_rng(0)
    batch = {
        "wave": jnp.asarray(r.standard_normal((2, 32000)), jnp.float32),
        "target": jnp.asarray((r.uniform(size=(2, 5)) < 0.3), jnp.float32),
    }
    losses = []
    for i in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert int(state.opt_state.count) == 3
