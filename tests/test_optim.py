"""bf16-moments AdamW with stochastic-rounded nu (train/optim.py): oracle
trajectory vs optax, SR unbiasedness, the nu-freeze failure mode it
exists to fix, and the config-activated train-step path. (An earlier
per-leaf Pallas implementation was measured 3 ms slower end-to-end and
removed — see optim.py docstring.)"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from passt_tpu.train.optim import (
    FusedAdamWState,
    _stochastic_round_bf16,
    adamw_bf16sr,
)


def _params(seed=0):
    r = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(r.standard_normal((300, 40)), jnp.float32),
        "b": jnp.asarray(r.standard_normal((40,)), jnp.float32),
        "scalarish": jnp.asarray(r.standard_normal((3,)), jnp.float32),
    }


def test_tracks_optax_adamw_fp32():
    """Parameter trajectory stays within bf16-rounding distance of the
    fp32 optax.adamw trajectory over several steps."""
    params = _params()
    tx = adamw_bf16sr(1e-3, weight_decay=1e-4)
    ref = optax.adamw(1e-3, weight_decay=1e-4)
    s, rs = tx.init(params), ref.init(params)
    p1 = p2 = params
    for step in range(10):
        g = jax.tree_util.tree_map(lambda p: jnp.cos(p * (step + 1)), p1)
        u, s = tx.update(g, s, p1)
        p1 = optax.apply_updates(p1, u)
        g2 = jax.tree_util.tree_map(lambda p: jnp.cos(p * (step + 1)), p2)
        u2, rs = ref.update(g2, rs, p2)
        p2 = optax.apply_updates(p2, u2)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3)


def test_first_step_matches_optax():
    """First update from zero moments matches optax to bf16 storage
    precision (schedule evaluated at the pre-update count)."""
    params = _params(1)
    ref = optax.adamw(optax.constant_schedule(1e-3), weight_decay=1e-4)
    tx = adamw_bf16sr(optax.constant_schedule(1e-3), weight_decay=1e-4, sr_nu=False)
    s, rs = tx.init(params), ref.init(params)
    g = jax.tree_util.tree_map(jnp.sin, params)
    u, s = tx.update(g, s, params)
    u2, rs = ref.update(g, rs, params)
    for a, b in zip(jax.tree_util.tree_leaves(u), jax.tree_util.tree_leaves(u2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-2)


def test_stochastic_round_unbiased():
    x = jnp.full((20000,), 1.0 + 3e-4, jnp.float32)  # between bf16 points
    lo = float(jnp.asarray(1.0, jnp.bfloat16))
    rounded = _stochastic_round_bf16(x, jax.random.PRNGKey(0)).astype(jnp.float32)
    vals = set(np.unique(np.asarray(rounded)).tolist())
    assert len(vals) == 2 and lo in vals  # rounds to the two neighbors
    mean = float(rounded.mean())
    np.testing.assert_allclose(mean, 1.0 + 3e-4, atol=5e-5)
    # specials pass through
    sp = jnp.asarray([jnp.inf, -jnp.inf, jnp.nan], jnp.float32)
    out = _stochastic_round_bf16(sp, jax.random.PRNGKey(1))
    assert np.isinf(out[0]) and np.isinf(out[1]) and np.isnan(out[2])


def test_sr_prevents_nu_freeze():
    """The failure mode bf16 nu storage has WITHOUT stochastic rounding:
    beta2=0.999 increments (~1e-3 of the running value) vanish under
    nearest rounding, freezing nu; SR keeps the EMA moving."""
    p = {"w": jnp.zeros((256,), jnp.float32)}
    g = {"w": jnp.full((256,), 1.0, jnp.float32)}  # nu target = 1.0

    def run(sr):
        tx = adamw_bf16sr(0.0, weight_decay=0.0, sr_nu=sr)  # lr 0: isolate nu
        s = tx.init(p)
        # warm nu to ~0.26 (300 steps), where per-step increments are ~7e-4
        # of the running value — below bf16 resolution near 0.26
        for _ in range(300):
            _, s = tx.update(g, s, p)
        return float(jnp.mean(s.nu["w"].astype(jnp.float32)))

    nu_true = 1.0 - 0.999 ** 300  # exact EMA value
    nu_sr, nu_det = run(True), run(False)
    assert abs(nu_sr - nu_true) < 0.03  # SR tracks the EMA
    assert abs(nu_det - nu_true) > 3 * abs(nu_sr - nu_true)  # frozen short


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
    assert jax.tree_util.tree_leaves(state.opt_state.nu)[0].dtype == jnp.bfloat16
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
