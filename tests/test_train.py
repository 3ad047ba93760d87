"""Training-layer tests: schedules vs the reference closures, mixup, losses
vs torch oracles, SWA math, metrics vs sklearn, and a 5-step mini-train
convergence smoke (the reference's `mini_train` diagnostic,
config_updates.py:24-26)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from passt_tpu.models.passt import PaSSTConfig
from passt_tpu.train import (
    SWAState,
    average_precision,
    bce_with_logits,
    cosine_cycle,
    exp_warmup_linear_down,
    make_eval_step,
    make_train_step,
    masked_bce_loss,
    mean_average_precision,
    roc_auc,
    sample_mixup,
    single_label_mixup_loss,
    swa_init,
    swa_should_update,
    swa_update,
)
from passt_tpu.train.mixup import apply_mixup
from passt_tpu.train.schedules import make_lr_schedule
from passt_tpu.train.steps import create_train_state, make_optimizer


# --------------------------------------------------------------------------
# Schedules: compare against the reference's own closures (pure numpy code,
# executed from /root/reference as an oracle).
# --------------------------------------------------------------------------
def _reference_ramp():
    import importlib.util, sys

    spec = importlib.util.spec_from_file_location("ref_ramp", "/root/reference/helpers/ramp.py")
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except ImportError:
        return None  # needs ba3l; stubbed in reference_oracle
    return mod


def test_exp_warmup_linear_down_matches_reference():
    from reference_oracle import _install_stubs

    _install_stubs()
    ref = _reference_ramp()
    if ref is None:
        pytest.skip("reference ramp not importable")
    ours = exp_warmup_linear_down(5, 50, 50, 0.01)
    theirs = ref.exp_warmup_linear_down(5, 50, 50, 0.01)
    for e in range(130):
        assert abs(ours(e) - theirs(e)) < 1e-12, e
    # even and odd cycle_len: the reference uses floor division cycle_len//2.
    # (ramp.py:117) which differs from /2 for odd lengths — schedule_mode
    # cos_cyc passes warm_up_len (default 5, odd) as cycle_len.
    for cl in (20, 5, 7):
        ours_c = cosine_cycle(cl, 100, 0.01)
        theirs_c = ref.cosine_cycle(cl, 100, 0.01)
        for e in range(250):
            assert abs(ours_c(e) - theirs_c(e)) < 1e-12, (cl, e)


def test_lr_schedule_step_table():
    fn = exp_warmup_linear_down(5, 50, 50, 0.01)
    sched = make_lr_schedule(2e-5, fn, steps_per_epoch=10)
    # constant within an epoch, follows the epoch closure across epochs
    assert float(sched(0)) == float(sched(9)) == pytest.approx(2e-5 * fn(0))
    assert float(sched(10)) == pytest.approx(2e-5 * fn(1))
    assert float(sched(55 * 10)) == pytest.approx(2e-5 * fn(55))


# --------------------------------------------------------------------------
# Mixup
# --------------------------------------------------------------------------
def test_mixup_sampling_and_blend():
    perm, lam = sample_mixup(jax.random.PRNGKey(0), 64, 0.3)
    assert perm.shape == (64,) and sorted(np.asarray(perm).tolist()) == list(range(64))
    assert (np.asarray(lam) >= 0.5).all() and (np.asarray(lam) <= 1.0).all()
    x = jnp.arange(8, dtype=jnp.float32).reshape(8, 1, 1, 1)
    mixed = apply_mixup(x, jnp.arange(8)[::-1], jnp.full((8,), 0.75))
    np.testing.assert_allclose(
        np.asarray(mixed)[:, 0, 0, 0], 0.75 * np.arange(8) + 0.25 * np.arange(8)[::-1]
    )


# --------------------------------------------------------------------------
# Losses vs torch oracles
# --------------------------------------------------------------------------
def test_bce_matches_torch(rng_np):
    torch = pytest.importorskip("torch")
    logits = rng_np.standard_normal((4, 10)).astype(np.float32)
    targets = rng_np.uniform(size=(4, 10)).astype(np.float32)
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets), reduction="none"
    ).numpy()
    got = np.asarray(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_single_label_mixup_loss_matches_torch(rng_np):
    torch = pytest.importorskip("torch")
    logits = rng_np.standard_normal((6, 50)).astype(np.float32)
    labels = rng_np.integers(0, 50, size=6)
    perm = np.asarray([3, 1, 0, 5, 4, 2])
    lam = rng_np.uniform(0.5, 1.0, size=6).astype(np.float32)
    tl, tla, tp = torch.from_numpy(logits), torch.from_numpy(labels), torch.from_numpy(perm)
    ref = (
        torch.nn.functional.cross_entropy(tl, tla, reduction="none") * torch.from_numpy(lam)
        + torch.nn.functional.cross_entropy(tl, tla[tp], reduction="none")
        * (1 - torch.from_numpy(lam))
    ).mean()
    got = single_label_mixup_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(perm), jnp.asarray(lam)
    )
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)


def test_masked_bce_uses_mask():
    logits = jnp.zeros((2, 20))
    twm = np.zeros((2, 40), dtype=np.float32)
    twm[:, :20] = 1.0  # labels all positive
    twm[0, 20:] = 1.0  # sample 0 fully observed, sample 1 fully masked out
    loss = masked_bce_loss(logits, jnp.asarray(twm))
    # only half the cells contribute log(2)
    np.testing.assert_allclose(float(loss), np.log(2.0) / 2.0, rtol=1e-6)


# --------------------------------------------------------------------------
# SWA
# --------------------------------------------------------------------------
def test_swa_running_average():
    p1 = {"w": jnp.asarray(2.0)}
    s = swa_init(p1, swa_epoch_start=2, swa_freq=2)
    # Reference cadence (swa_callback.py:128,194): swa_start = 2-1 = 1
    # (0-based), fires at START of epochs 1,3,5,... == END of epochs 0,2,4.
    assert swa_should_update(s, 0) and not swa_should_update(s, 1)
    assert swa_should_update(s, 2) and not swa_should_update(s, 3) and swa_should_update(s, 4)
    # swa_end cap (swa_callback.py:131): no update fires past epoch start
    # max_epochs-1, i.e. the final epoch's params never enter the average.
    assert not swa_should_update(s, 4, max_epochs=5)
    assert swa_should_update(s, 2, max_epochs=5)


def test_swa_cadence_matches_reference_callback():
    """Oracle the firing epochs against the reference condition evaluated
    verbatim: on_train_epoch_start fires when swa_start <= t <= swa_end and
    (t - swa_start) % swa_freq == 0 (swa_callback.py:194), with
    swa_start = swa_epoch_start - 1, swa_end = max_epochs - 1 (0-based).
    End of our epoch e == start of reference epoch t = e + 1."""
    for start, freq, max_epochs in [(50, 5, 130), (2, 1, 25), (10, 3, 100), (1, 1, 6)]:
        s = swa_init({"w": jnp.asarray(0.0)}, swa_epoch_start=start, swa_freq=freq)
        swa_start = max(start - 1, 0)
        swa_end = max_epochs - 1
        ref_fires = {
            t for t in range(1, max_epochs)  # t=0 = averaging the untrained
            # init params, unreachable from an end-of-epoch hook (only occurs
            # for swa_epoch_start=1, used by no recipe)
            if swa_start <= t <= swa_end and (t - swa_start) % freq == 0
        }
        ours = {e + 1 for e in range(max_epochs) if swa_should_update(s, e, max_epochs)}
        assert ours == ref_fires, (start, freq, ours ^ ref_fires)
    s = swa_update(s, {"w": jnp.asarray(2.0)})
    s = swa_update(s, {"w": jnp.asarray(4.0)})
    s = swa_update(s, {"w": jnp.asarray(6.0)})
    assert float(s.avg_params["w"]) == pytest.approx(4.0)
    assert s.n_averaged == 3


# --------------------------------------------------------------------------
# Metrics vs sklearn
# --------------------------------------------------------------------------
def test_ap_and_auc_match_sklearn(rng_np):
    skm = pytest.importorskip("sklearn.metrics")
    scores = rng_np.uniform(size=(200, 8))
    scores[:, 3] = np.round(scores[:, 3], 1)  # force ties
    targets = (rng_np.uniform(size=(200, 8)) < 0.1).astype(np.float64)
    targets[:, 5] = 0.0  # class with no positives
    ours = average_precision(targets, scores)
    theirs = np.array(
        [
            skm.average_precision_score(targets[:, j], scores[:, j])
            if targets[:, j].sum() > 0 else np.nan
            for j in range(8)
        ]
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-9, equal_nan=True)
    ours_auc = roc_auc(targets, scores)
    theirs_auc = np.array(
        [
            skm.roc_auc_score(targets[:, j], scores[:, j]) if 0 < targets[:, j].sum() < 200 else np.nan
            for j in range(8)
        ]
    )
    np.testing.assert_allclose(ours_auc, theirs_auc, rtol=1e-9, equal_nan=True)


# --------------------------------------------------------------------------
# Mini-train smoke: loss decreases over a few steps on a learnable task
# (the reference `mini_train` debugging config, config_updates.py:24-26).
# --------------------------------------------------------------------------
def _tiny_cfg(**kw):
    return PaSSTConfig(
        input_fdim=32, input_tdim=50, embed_dim=64, depth=2, num_heads=4,
        num_classes=8, s_patchout_t=1, s_patchout_f=1, u_patchout=2, **kw
    )


@pytest.mark.slow
def test_mini_train_loss_decreases(rng_np):
    cfg = _tiny_cfg()
    from passt_tpu.ops.frontend import MelConfig

    mcfg = MelConfig(n_mels=32, freqm=4, timem=8)
    tx = make_optimizer(lr=1e-3, steps_per_epoch=5, warm_up_len=1)
    model, state = create_train_state(cfg, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, mcfg, loss_type="multilabel", use_mixup=True, donate=False)

    # learnable data: two fixed waveforms with distinct labels
    waves = rng_np.standard_normal((4, 16000)).astype(np.float32)
    targets = np.zeros((4, 8), dtype=np.float32)
    targets[np.arange(4), np.arange(4)] = 1.0
    batch = {"wave": jnp.asarray(waves), "target": jnp.asarray(targets)}

    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(12):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert state.step == 12
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_per_block_grad_norm_logging(rng_np):
    """log_grad_norm_per_block emits one finite norm per top-level param
    group alongside the global norm (the scalar-cost analogue of the
    reference's wandb.watch gradient logging, ex_audioset.py:344-346)."""
    cfg = _tiny_cfg()
    from passt_tpu.ops.frontend import MelConfig

    mcfg = MelConfig(n_mels=32, freqm=4, timem=8)
    tx = make_optimizer(lr=1e-3, steps_per_epoch=5)
    model, state = create_train_state(cfg, tx, jax.random.PRNGKey(0))
    step = make_train_step(
        model, tx, mcfg, donate=False,
        log_grad_norm=True, log_grad_norm_per_block=True,
    )
    batch = {
        "wave": jnp.asarray(rng_np.standard_normal((2, 16000)).astype(np.float32)),
        "target": jnp.asarray((rng_np.uniform(size=(2, 8)) < 0.3).astype(np.float32)),
    }
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    for group in ("patch_embed", "blocks_0", "blocks_1", "head_linear",
                  "time_new_pos_embed"):
        key = f"grad_norm/{group}"
        assert key in metrics, sorted(metrics)
        assert np.isfinite(float(metrics[key]))
    # per-group norms compose to the global norm
    total = np.sqrt(sum(
        float(v) ** 2 for k, v in metrics.items() if k.startswith("grad_norm/")
    ))
    np.testing.assert_allclose(total, float(metrics["grad_norm"]), rtol=1e-5)


def test_eval_step_deterministic_and_shapes(rng_np):
    cfg = _tiny_cfg()
    from passt_tpu.ops.frontend import MelConfig

    mcfg = MelConfig(n_mels=32)
    tx = make_optimizer(steps_per_epoch=5)
    model, state = create_train_state(cfg, tx, jax.random.PRNGKey(0))
    ev = make_eval_step(model, mcfg, loss_type="multilabel")
    batch = {
        "wave": jnp.asarray(rng_np.standard_normal((2, 16000)).astype(np.float32)),
        "target": jnp.asarray(np.zeros((2, 8), dtype=np.float32)),
    }
    out1 = ev(state.params, batch)
    out2 = ev(state.params, batch)
    assert out1["out"].shape == (2, 8)
    np.testing.assert_array_equal(np.asarray(out1["out"]), np.asarray(out2["out"]))
    assert (np.asarray(out1["out"]) >= 0).all() and (np.asarray(out1["out"]) <= 1).all()


def test_masked_mean_average_precision():
    """OpenMIC masked metric: unobserved labels must not affect AP."""
    from passt_tpu.train.metrics import masked_mean_average_precision

    rng = np.random.default_rng(0)
    n = 100
    labels = (rng.uniform(size=(n, 3)) < 0.3).astype(np.float64)
    # perfect scores on observed, garbage on unobserved
    scores = labels.copy()
    mask = (rng.uniform(size=(n, 3)) < 0.7).astype(np.float64)
    scores[mask < 0.5] = rng.uniform(size=int((mask < 0.5).sum()))
    ap = masked_mean_average_precision(labels, scores, mask)
    assert ap == pytest.approx(1.0)  # observed part is perfectly ranked
    # sklearn cross-check with per-class sample weights
    skm = pytest.importorskip("sklearn.metrics")
    ref = np.mean([
        skm.average_precision_score(labels[mask[:, j] > 0.5, j], scores[mask[:, j] > 0.5, j])
        for j in range(3)
    ])
    np.testing.assert_allclose(ap, ref, rtol=1e-9)


def test_masked_roc_auc():
    """OpenMIC masked ROC: unobserved labels must not affect AUC, and the
    value matches sklearn with per-class sample weights."""
    from passt_tpu.train.metrics import masked_roc_auc

    rng = np.random.default_rng(3)
    n = 120
    labels = (rng.uniform(size=(n, 4)) < 0.4).astype(np.float64)
    scores = rng.uniform(size=(n, 4))
    mask = (rng.uniform(size=(n, 4)) < 0.7).astype(np.float64)
    auc = masked_roc_auc(labels, scores, mask)
    skm = pytest.importorskip("sklearn.metrics")
    ref = np.mean([
        skm.roc_auc_score(labels[mask[:, j] > 0.5, j], scores[mask[:, j] > 0.5, j])
        for j in range(4)
    ])
    np.testing.assert_allclose(auc, ref, rtol=1e-9)
    # flipping an UNOBSERVED score must not move the metric
    scores2 = scores.copy()
    unobs = np.nonzero(mask[:, 0] < 0.5)[0]
    scores2[unobs[0], 0] = 1.0 - scores2[unobs[0], 0]
    np.testing.assert_allclose(masked_roc_auc(labels, scores2, mask), auc, rtol=1e-12)


def test_optimizer_moments_dtype_bf16():
    """opt_moments_dtype="bfloat16" stores AdamW's first moment in bf16
    (beyond-reference memory knob; second moment stays fp32)."""
    import jax.numpy as jnp

    from passt_tpu.train.steps import make_optimizer

    tx = make_optimizer(steps_per_epoch=10, moments_dtype="bfloat16")
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}
    state = tx.init(params)
    mus = [l for l in jax.tree_util.tree_leaves(state) if l.dtype == jnp.bfloat16]
    assert len(mus) == 2  # mu for each param leaf
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, state2 = tx.update(g, state, params)
    assert all(jnp.isfinite(l).all() for l in jax.tree_util.tree_leaves(upd))


def test_grad_accum_matches_large_batch_update():
    """grad_accum=K: K accumulated micro-grads produce exactly the update
    the plain optimizer produces for their mean — including the LR
    schedule, whose inner steps-per-epoch shrinks by K so the LR-vs-epoch
    trajectory is unchanged (one update per K micro-steps)."""
    import jax.numpy as jnp
    import optax

    from passt_tpu.train.steps import make_optimizer

    kw = dict(lr=1e-3, schedule_mode="exp_lin", warm_up_len=2,
              ramp_down_start=5, ramp_down_len=5)
    tx_acc = make_optimizer(steps_per_epoch=10, grad_accum=2, **kw)
    tx_ref = make_optimizer(steps_per_epoch=5, grad_accum=1, **kw)

    params_a = {"w": jnp.arange(6.0).reshape(2, 3) / 7.0}
    params_r = jax.tree_util.tree_map(jnp.copy, params_a)
    sa, sr = tx_acc.init(params_a), tx_ref.init(params_r)

    rng = np.random.default_rng(0)
    for round_i in range(4):
        g1 = {"w": jnp.asarray(rng.standard_normal((2, 3)), jnp.float32)}
        g2 = {"w": jnp.asarray(rng.standard_normal((2, 3)), jnp.float32)}
        for g in (g1, g2):
            upd, sa = tx_acc.update(g, sa, params_a)
            params_a = optax.apply_updates(params_a, upd)
        gm = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g1, g2)
        upd, sr = tx_ref.update(gm, sr, params_r)
        params_r = optax.apply_updates(params_r, upd)
        np.testing.assert_allclose(
            np.asarray(params_a["w"]), np.asarray(params_r["w"]),
            rtol=1e-6, atol=1e-7,
        )


def test_grad_accum_schedule_exact_for_non_divisible_epochs():
    """steps_per_epoch=10 with grad_accum=4 (not divisible): the inner
    schedule is indexed by update count but scaled back to micro-steps
    (lr at update u == base schedule at micro-step u*K), so the LR-vs-
    epoch trajectory cannot run ahead the way a floor-divided
    steps_per_epoch would (10//4=2 updates/epoch vs the true 2.5)."""
    import jax
    import jax.numpy as jnp
    import optax

    from passt_tpu.train.steps import make_optimizer, make_schedule

    kw = dict(lr=1e-3, schedule_mode="exp_lin", warm_up_len=2,
              ramp_down_start=5, ramp_down_len=5)
    base = make_schedule(steps_per_epoch=10, **kw)
    tx_acc = make_optimizer(steps_per_epoch=10, grad_accum=4,
                            weight_decay=1e-4, **kw)
    # reference: plain AdamW whose schedule is base evaluated at u*4
    tx_ref = optax.adamw(lambda u: base(u * 4), weight_decay=1e-4)

    params_a = {"w": jnp.arange(6.0).reshape(2, 3) / 7.0}
    params_r = jax.tree_util.tree_map(jnp.copy, params_a)
    sa, sr = tx_acc.init(params_a), tx_ref.init(params_r)
    rng = np.random.default_rng(1)
    for _ in range(8):  # 8 updates = 32 micro-steps, crosses epoch bounds
        gs = [{"w": jnp.asarray(rng.standard_normal((2, 3)), jnp.float32)}
              for _ in range(4)]
        for g in gs:
            upd, sa = tx_acc.update(g, sa, params_a)
            params_a = optax.apply_updates(params_a, upd)
        gm = jax.tree_util.tree_map(lambda *x: sum(x) / 4.0, *gs)
        upd, sr = tx_ref.update(gm, sr, params_r)
        params_r = optax.apply_updates(params_r, upd)
    np.testing.assert_allclose(
        np.asarray(params_a["w"]), np.asarray(params_r["w"]), rtol=1e-6, atol=1e-7
    )


def test_map_fallback_matches_sklearn_on_empty_classes(rng_np):
    """A class with zero positives contributes AP 0.0 under sklearn's
    macro mean (the reference's convention); the numpy fallback must agree
    instead of nanmean-excluding it."""
    from passt_tpu.train.metrics import mean_average_precision

    t = (rng_np.uniform(size=(40, 4)) < 0.3).astype(np.float32)
    t[:, 2] = 0.0  # no positives in class 2
    s = rng_np.standard_normal((40, 4))
    a = mean_average_precision(t, s, use_sklearn=True)
    b = mean_average_precision(t, s, use_sklearn=False)
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_evaluate_empty_loader_fails_clearly():
    from passt_tpu.train.loop import evaluate

    with pytest.raises(ValueError, match="no eval batches"):
        evaluate(lambda p, b: None, {}, loader=[])


def test_masked_map_zero_positive_class_counts_as_zero():
    """A class with observed samples but no observed positives contributes
    AP 0.0 to the macro mean (the reference runs sklearn
    average_precision_score with sample_weight=y_mask for EVERY class and
    takes a plain .mean(), ex_openmic.py:241-252); skipping it would
    inflate the reported mAP (round-5 review finding)."""
    import numpy as np

    from passt_tpu.train.metrics import masked_mean_average_precision

    rng = np.random.default_rng(0)
    n = 40
    labels = np.zeros((n, 3))
    labels[:, 0] = (rng.uniform(size=n) < 0.4)  # normal class
    # class 1: observed everywhere, zero positives
    # class 2: normal
    labels[:, 2] = (rng.uniform(size=n) < 0.4)
    scores = rng.uniform(size=(n, 3))
    mask = np.ones((n, 3))
    ours = masked_mean_average_precision(labels, scores, mask)

    from sklearn import metrics as skm
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = np.mean(
            [
                skm.average_precision_score(
                    labels[:, j], scores[:, j], sample_weight=mask[:, j]
                )
                for j in range(3)
            ]
        )
    np.testing.assert_allclose(ours, ref, rtol=1e-9)
