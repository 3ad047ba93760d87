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


# ---------------------------------------------------------------------------
# bf16 parameter STORAGE with stochastic-rounded applies
# (trainer.param_dtype="bfloat16_sr": optim.apply_updates_sr /
#  optim.cast_params_storage — the HBM lever measured in
#  scripts/ab_param_dtype.py)
# ---------------------------------------------------------------------------


def test_apply_updates_sr_unbiased_below_ulp():
    """An update far below the bf16 ulp at weight scale still moves the
    weight in expectation (a nearest-rounded bf16 add would be a no-op)."""
    from passt_tpu.train.optim import apply_updates_sr

    p = {"w": jnp.full((4, 4096), 0.125, jnp.bfloat16)}  # ulp(0.125)=2^-11
    u = {"w": jnp.full((4, 4096), -2e-5, jnp.float32)}  # |u| ~ ulp/24
    # nearest rounding: p + u rounds back to exactly p
    nearest = (p["w"].astype(jnp.float32) + u["w"]).astype(jnp.bfloat16)
    assert (np.asarray(nearest) == np.asarray(p["w"])).all()
    out = apply_updates_sr(p, u, jax.random.PRNGKey(0))["w"]
    assert out.dtype == jnp.bfloat16
    moved = np.asarray(out.astype(jnp.float32)).mean() - 0.125
    # E[moved] = -2e-5; SR noise averages out over 16k elements
    assert -3e-5 < moved < -1e-5, moved


def test_apply_updates_sr_fp32_leaves_exact():
    """Non-bf16 leaves follow exact optax.apply_updates semantics."""
    from passt_tpu.train.optim import apply_updates_sr

    p = {"w": jnp.ones((3, 3), jnp.bfloat16), "b": jnp.ones((3,), jnp.float32)}
    u = {"w": jnp.zeros((3, 3), jnp.float32), "b": jnp.full((3,), 0.5, jnp.float32)}
    ref = optax.apply_updates({"b": p["b"]}, {"b": u["b"]})
    out = apply_updates_sr(p, u, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(out["b"]), np.asarray(ref["b"]))
    assert out["b"].dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(out["w"], np.float32), np.ones((3, 3), np.float32)
    )


def test_cast_params_storage():
    from passt_tpu.train.optim import cast_params_storage

    p = {"w": jnp.ones((3, 3), jnp.float32), "b": jnp.ones((3,), jnp.float32)}
    out = cast_params_storage(p, "bfloat16_sr")
    assert out["w"].dtype == jnp.bfloat16  # matrices cast
    assert out["b"].dtype == jnp.float32  # vectors stay fp32
    assert cast_params_storage(p, None) is p
    with pytest.raises(ValueError):
        cast_params_storage(p, "float16")


def test_param_sr_train_step_converges_like_fp32():
    """The full param_dtype='bfloat16_sr' step (bf16 storage + SR apply +
    bf16sr moments) tracks the fp32-storage loss trajectory on a small
    overfit task, and params actually move despite lr << bf16 ulp."""
    from passt_tpu.models.passt import PaSSTConfig
    from passt_tpu.ops.frontend import MelConfig
    from passt_tpu.train.steps import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = PaSSTConfig(
        input_fdim=32, input_tdim=64, embed_dim=32, depth=1, num_heads=2,
        num_classes=5, patch_size=(8, 8), stride=(8, 8), dtype="float32",
    )
    mel_cfg = MelConfig(n_mels=32, stft_method="matmul")
    r = np.random.default_rng(0)
    batch = {
        "wave": jnp.asarray(r.standard_normal((2, 32000)), jnp.float32),
        "target": jnp.asarray((r.uniform(size=(2, 5)) < 0.3), jnp.float32),
    }

    def run(param_dtype):
        tx = make_optimizer(
            lr=1e-3, steps_per_epoch=10, moments_dtype="bfloat16_sr"
        )
        model, state = create_train_state(
            cfg, tx, jax.random.PRNGKey(0), param_dtype=param_dtype
        )
        step = make_train_step(
            model, tx, mel_cfg, input_tdim=64,
            param_sr=param_dtype == "bfloat16_sr",
        )
        losses = []
        for i in range(8):
            state, m = step(state, batch, jax.random.PRNGKey(7))
            losses.append(float(m["loss"]))
        return losses, state

    losses_sr, state_sr = run("bfloat16_sr")
    losses_fp, _ = run(None)
    w = jax.tree_util.tree_leaves(state_sr.params)
    assert any(p.dtype == jnp.bfloat16 for p in w)  # storage really bf16
    assert np.isfinite(losses_sr).all()
    assert losses_sr[-1] < losses_sr[0]  # learning
    # same trajectory to within bf16 storage noise
    np.testing.assert_allclose(losses_sr, losses_fp, rtol=0.08)


def test_param_sr_through_experiment_build(tmp_path):
    """trainer.param_dtype='bfloat16_sr' threads through Experiment.build:
    bf16 storage, finite mini-train loss, and orbax checkpoint round-trip
    at the bf16 dtype."""
    from passt_tpu.config import parse_cli
    from passt_tpu.experiments.audioset import experiment as ex

    _, cfg = parse_cli(
        [
            "main", "with", "mini_train",
            "trainer.param_dtype=bfloat16_sr",
            f"trainer.checkpoint_dir={tmp_path}",
        ],
        ex.default_config,
    )
    model, state, train_step, eval_step, tx = ex.build(cfg, steps_per_epoch=2)
    assert any(
        p.dtype == jnp.bfloat16 for p in jax.tree_util.tree_leaves(state.params)
    )
    r = np.random.default_rng(0)
    batch = {
        "wave": jnp.asarray(
            r.standard_normal((2, cfg.model.input_tdim * 320)), jnp.float32
        ),
        "target": jnp.asarray(
            (r.uniform(size=(2, cfg.model.n_classes)) < 0.1), jnp.float32
        ),
    }
    state2, m = train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    w2 = jax.tree_util.tree_leaves(state2.params)
    assert any(p.dtype == jnp.bfloat16 for p in w2)


def test_param_dtype_auto_resolution():
    """trainer.param_dtype='auto' resolves by compute dtype: bf16+SR
    storage under bf16 compute (bit-identical forward), fp32 master
    weights under fp32 compute (exact-parity posture)."""
    from passt_tpu.config import ExperimentConfig, apply_overrides

    cfg = ExperimentConfig()
    assert cfg.trainer.param_dtype == "auto"
    assert cfg.model.dtype == "bfloat16"
    assert cfg.resolved_param_dtype() == "bfloat16_sr"
    cfg32 = apply_overrides(cfg, {"model.dtype": "float32"})
    assert cfg32.resolved_param_dtype() is None
    off = apply_overrides(cfg, {"trainer.param_dtype": "null"})
    assert off.resolved_param_dtype() is None
    explicit = apply_overrides(
        cfg32, {"trainer.param_dtype": "bfloat16_sr"}
    )
    assert explicit.resolved_param_dtype() == "bfloat16_sr"


def test_null_moments_dtype_stays_fp32_under_bf16_param_storage():
    """opt_moments_dtype=null is the documented strict fp32-moment parity
    setting — it must hold even when params are STORED bf16
    (param_dtype='bfloat16_sr'). optax moments inherit the dtype of the
    tx.init template, so initializing on the bf16-cast params would
    silently create bf16 nearest-rounded mu/nu (exactly the nu-freeze
    failure mode scripts/ab_param_dtype.py measures as wrong). The init
    must therefore see the pre-cast fp32 params — both through
    create_train_state and through Experiment.build."""
    from passt_tpu.models.passt import PaSSTConfig
    from passt_tpu.train.steps import create_train_state, make_optimizer

    cfg = PaSSTConfig(
        input_fdim=32, input_tdim=64, embed_dim=32, depth=1, num_heads=2,
        num_classes=5, patch_size=(8, 8), stride=(8, 8),
    )
    tx = make_optimizer(lr=1e-3, steps_per_epoch=2, moments_dtype=None)
    _, state = create_train_state(
        cfg, tx, jax.random.PRNGKey(0), param_dtype="bfloat16_sr"
    )
    # storage really bf16 ...
    assert any(
        p.dtype == jnp.bfloat16 for p in jax.tree_util.tree_leaves(state.params)
    )
    # ... but every float optimizer moment is fp32
    float_leaves = [
        l
        for l in jax.tree_util.tree_leaves(state.opt_state)
        if jnp.issubdtype(l.dtype, jnp.floating)
    ]
    assert float_leaves
    assert all(l.dtype == jnp.float32 for l in float_leaves)

    # the same invariant through the config/build path
    from passt_tpu.config import parse_cli
    from passt_tpu.experiments.audioset import experiment as ex

    _, ecfg = parse_cli(
        ["main", "with", "mini_train", "trainer.opt_moments_dtype=null"],
        ex.default_config,
    )
    assert ecfg.resolved_param_dtype() == "bfloat16_sr"  # default bf16 compute
    _, estate, _, _, _ = ex.build(ecfg, steps_per_epoch=2, make_steps=False)
    efloat = [
        l
        for l in jax.tree_util.tree_leaves(estate.opt_state)
        if jnp.issubdtype(l.dtype, jnp.floating)
    ]
    assert efloat and all(l.dtype == jnp.float32 for l in efloat)


def test_cast_params_storage_keeps_stacked_vectors_fp32():
    """Under the stacked block layouts (blocks_impl=scan/stacked) the
    LayerNorm scales/biases and Dense biases are [depth, C] — rank 2 but
    still precision-critical VECTORS per block. The storage cast must key
    on per-block rank, not raw ndim (round-5 regression)."""
    import jax

    from passt_tpu.models.passt import PaSSTConfig, init_passt
    from passt_tpu.train.optim import cast_params_storage

    kw = dict(input_fdim=64, input_tdim=100, embed_dim=64, depth=2,
              num_heads=4, num_classes=5)
    for impl in ("loop", "scan", "stacked"):
        _, p = init_passt(
            PaSSTConfig(**kw, blocks_impl=impl), jax.random.PRNGKey(0)
        )
        c = cast_params_storage(p, "bfloat16_sr")
        blk = c["blocks_0"] if impl == "loop" else c["blocks"]["block"]
        assert blk["norm1"]["scale"].dtype == jnp.float32, impl
        assert blk["attn"]["qkv"]["bias"].dtype == jnp.float32, impl
        assert blk["attn"]["qkv"]["kernel"].dtype == jnp.bfloat16, impl
        assert blk["mlp"]["fc1"]["kernel"].dtype == jnp.bfloat16, impl
        assert c["head_linear"]["kernel"].dtype == jnp.bfloat16, impl
