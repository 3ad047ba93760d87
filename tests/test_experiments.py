"""End-to-end experiment tests: config CLI parsing, loaders, mini-train
through the real recipe path on synthetic HDF5 data (the reference's
`mini_train` + `test_loaders` diagnostics, config_updates.py:24-26,
ex_audioset.py:444-456)."""

import dataclasses

import numpy as np
import pytest

from passt_tpu.config import ExperimentConfig, PRESETS, apply_overrides, parse_cli
from passt_tpu.data.prepare import pack_waveform_hdf5
from passt_tpu.experiments import EXPERIMENTS
from passt_tpu.experiments.common import run_command


def test_cli_parsing_and_overrides():
    base = EXPERIMENTS["audioset"].default_config
    cmd, cfg = parse_cli(
        ["evaluate_only", "with", "trainer.lr=1e-4", "data.batch_size=24", "mini_train"],
        base,
    )
    assert cmd == "evaluate_only"
    assert cfg.trainer.lr == pytest.approx(1e-4)
    assert cfg.data.batch_size == 24
    assert cfg.trainer.limit_train_batches == 5
    # unknown key raises with candidates
    with pytest.raises(KeyError, match="unknown config key"):
        apply_overrides(base, {"trainer.nope": "1"})
    with pytest.raises(SystemExit):
        parse_cli(["main", "not_a_preset"], base)


def test_arch_presets_update_model():
    base = EXPERIMENTS["audioset"].default_config
    _, cfg = parse_cli(["main", "passt_l_kd_p16_128_ap47"], base)
    assert cfg.model.arch == "passt_l_kd_p16_128_ap47"
    assert cfg.model.pretrained is True
    _, cfg = parse_cli(["main", "passt_30sec"], base)
    assert cfg.model.input_tdim == 3000
    # reference passt_s_30sec sets clip_length=20 even for the 30-sec arch
    # (config_updates.py:46-53: 20 s clips into the 3000-frame encoding)
    assert cfg.data.clip_length == 20
    assert cfg.model.pretrained is True
    # wide-stride presets carry their checkpoint's stride
    # (config_updates.py:87-134)
    _, cfg = parse_cli(["main", "passt_s_p16_s16_128_ap468"], base)
    assert (cfg.model.fstride, cfg.model.tstride) == (16, 16)
    _, cfg = parse_cli(["main", "passt_s_swa_p16_s14_128_ap471"], base)
    assert (cfg.model.fstride, cfg.model.tstride) == (14, 14)
    # the reference's "mixup" named config name works (alias mixupx kept)
    _, cfg = parse_cli(["main", "with", "mixup"], base)
    assert cfg.trainer.use_mixup is True


def test_default_configs_match_reference_recipes():
    """Spot-check the recipe deltas against the reference ex_* defaults."""
    a = EXPERIMENTS["audioset"].default_config
    assert (a.model.s_patchout_t, a.model.s_patchout_f) == (40, 4)  # ex_audioset.py:62
    assert a.trainer.max_epochs == 130 and a.trainer.lr == 2e-5
    assert (a.trainer.swa_epoch_start, a.trainer.swa_freq) == (50, 5)
    e = EXPERIMENTS["esc50"].default_config
    assert e.model.n_classes == 50 and e.mel.timem == 80  # ex_esc50.py:59-65
    assert (e.trainer.swa_epoch_start, e.trainer.swa_freq) == (2, 1)
    f = EXPERIMENTS["fsd50k"].default_config
    assert f.mel.freqm == 0 and f.mel.timem == 0  # ex_fsd50k.py:72-73
    assert f.trainer.ramp_down_start == 10  # ex_fsd50k.py:94
    assert f.data.crop == "random"  # fsd50k/dataset.py:70-79
    o = EXPERIMENTS["openmic"].default_config
    assert o.data.batch_size == 6 and o.trainer.loss_type == "masked"
    assert o.data.merge_mask_wavmix
    # model_speed_test default batch is per-recipe: 12 for audioset/openmic
    # (ex_audioset.py:365), 100 for the fine-tune recipes (ex_esc50.py:281)
    assert EXPERIMENTS["audioset"].speed_test_batch_size == 12
    assert EXPERIMENTS["openmic"].speed_test_batch_size == 12
    assert EXPERIMENTS["esc50"].speed_test_batch_size == 100
    assert EXPERIMENTS["fsd50k"].speed_test_batch_size == 100


def _make_synth(tmp_path, rng_np, n=24, classes=8, single_label=False, with_mask=False):
    items = []
    for i in range(n):
        wave = (rng_np.standard_normal(32000) * 0.1).astype(np.float32)
        if single_label:
            target = np.asarray(i % classes)
        elif with_mask:
            t = np.zeros(2 * classes)
            t[i % classes] = 1.0
            t[classes:] = 1.0
            target = t
        else:
            target = np.zeros(classes)
            target[i % classes] = 1
        items.append((f"c{i}.wav", wave, target))
    path = str(tmp_path / ("synth.h5"))
    pack_waveform_hdf5(path, items, packed_targets=not (single_label or with_mask))
    return path


def _shrink(cfg: ExperimentConfig, path: str, classes: int) -> ExperimentConfig:
    """Small model + synthetic data for a fast end-to-end run."""
    return apply_overrides(
        cfg,
        {
            "model.input_fdim": "128",
            "model.input_tdim": "98",
            "model.s_patchout_t": "2",
            "model.s_patchout_f": "1",
            "model.u_patchout": "2",
            "model.dtype": "float32",
            "data.train_hdf5": path,
            "data.eval_hdf5": path,
            "data.clip_length": "1",
            "data.batch_size": "4",
            "data.eval_batch_size": "4",
            "data.epoch_len": "8",
            "trainer.max_epochs": "2",
            "trainer.lr": "1e-3",
            "trainer.limit_train_batches": "2",
            "trainer.limit_eval_batches": "2",
            "trainer.swa_epoch_start": "0",
            "trainer.swa_freq": "1",
            "trainer.log_every_steps": "1000",
        },
    )


def _tiny_model_cfg(cfg):
    # shrink the transformer itself via the arch-independent knobs
    object.__setattr__  # (frozen dataclass: use replace chains instead)
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, arch=cfg.model.arch),
    )


@pytest.mark.parametrize("name", ["audioset", "esc50", "openmic", "fsd50k"])
@pytest.mark.slow
def test_experiment_mini_train(name, tmp_path, rng_np, monkeypatch):
    exp = EXPERIMENTS[name]
    classes = exp.default_config.model.n_classes
    single = exp.single_label
    masked = exp.default_config.trainer.loss_type == "masked"
    path = _make_synth(
        tmp_path, rng_np, classes=min(classes, 8) if False else classes,
        single_label=single, with_mask=masked,
    )
    cfg = _shrink(exp.default_config, path, classes)
    # make the net tiny for test speed: depth 2, dim 64
    import passt_tpu.models.registry as registry

    spec = registry.ARCHS[cfg.model.arch]
    monkeypatch.setitem(
        registry.ARCHS,
        cfg.model.arch,
        dataclasses.replace(spec, depth=2, embed_dim=64, num_heads=4),
    )
    result = exp.main(cfg)
    assert result["done"] is True
    hist = result["history"]
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["train_loss"])
    key = "accuracy" if single else "ap"
    assert key in hist[-1]
    assert f"swa_{key}" in hist[-1]  # SWA evaluated alongside


@pytest.mark.slow
def test_experiment_mini_train_on_mesh(tmp_path, rng_np, monkeypatch):
    """The reference's one-flag DDP activation (DDP=N env,
    ex_audioset.py:499-524), here `trainer.n_data=4 trainer.n_model=2`:
    trains the AudioSet recipe on the 8-device CPU mesh end-to-end,
    checkpoints, and resumes — including ragged eval batches (padded to the
    mesh then trimmed)."""
    exp = EXPERIMENTS["audioset"]
    path = _make_synth(tmp_path, rng_np, classes=527)
    cfg = _shrink(exp.default_config, path, 527)
    cfg = apply_overrides(
        cfg,
        {
            "trainer.n_data": "4",
            "trainer.n_model": "2",
            "data.batch_size": "2",  # per-replica: global batch 8
            "data.epoch_len": "32",
            "data.eval_batch_size": "3",  # 3 % n_data != 0 -> pad+trim path
            "trainer.checkpoint_dir": str(tmp_path / "ckpt"),
        },
    )
    import passt_tpu.models.registry as registry

    spec = registry.ARCHS[cfg.model.arch]
    monkeypatch.setitem(
        registry.ARCHS,
        cfg.model.arch,
        dataclasses.replace(spec, depth=2, embed_dim=64, num_heads=4),
    )
    result = exp.main(cfg)
    hist = result["history"]
    assert len(hist) == 2 and np.isfinite(hist[-1]["train_loss"])
    assert hist[-1]["n_eval"] == 6  # 2 eval batches of 3, pad rows trimmed
    assert "ap" in hist[-1]

    # resume on the mesh for one more epoch
    cfg2 = apply_overrides(cfg, {"trainer.resume": "true", "trainer.max_epochs": "3"})
    result2 = exp.main(cfg2)
    hist2 = result2["history"]
    assert len(hist2) == 1 and hist2[0]["epoch"] == 2
    assert np.isfinite(hist2[0]["train_loss"])


@pytest.mark.slow
def test_fsd50k_dual_validation_per_epoch(tmp_path, rng_np, monkeypatch):
    """FSD50K validates on BOTH [valid, eval] every epoch with set-name
    prefixed metrics (reference ex_fsd50k.py:318-322, 220-260 logs
    valid_ap / eval_ap / valid_swa_ap / eval_swa_ap)."""
    exp = EXPERIMENTS["fsd50k"]
    path = _make_synth(tmp_path, rng_np, classes=200)
    cfg = _shrink(exp.default_config, path, 200)
    cfg = apply_overrides(cfg, {"data.valid_hdf5": path})
    import passt_tpu.models.registry as registry

    spec = registry.ARCHS[cfg.model.arch]
    monkeypatch.setitem(
        registry.ARCHS,
        cfg.model.arch,
        dataclasses.replace(spec, depth=2, embed_dim=64, num_heads=4),
    )
    result = exp.main(cfg)
    last = result["history"][-1]
    for key in ("valid_ap", "eval_ap", "valid_swa_ap", "eval_swa_ap",
                "valid_val_loss", "eval_val_loss"):
        assert key in last, sorted(last)
    assert "ap" not in last  # multi-set: every metric is prefixed


@pytest.mark.slow
def test_evaluate_only_restores_best_checkpoint(tmp_path, rng_np, monkeypatch, capsys):
    """evaluate_only with trainer.checkpoint_dir restores the retained-BEST
    checkpoint (by trainer.monitor) and reports the SAME metric the training
    run logged for that epoch, plus swa_-prefixed metrics when the
    checkpoint carries SWA weights — the rehearsal chain's final link
    (scripts/finetune_rehearsal.py; reference ESC-50 protocol evaluates the
    picked-best SWA model, esc50/README.md)."""
    import passt_tpu.models.registry as registry

    exp = EXPERIMENTS["esc50"]
    path = _make_synth(tmp_path, rng_np, classes=50, single_label=True)
    cfg = _shrink(exp.default_config, path, 50)
    cfg = apply_overrides(
        cfg,
        {
            "trainer.checkpoint_dir": str(tmp_path / "ckpt"),
            "trainer.monitor": "accuracy",
            "trainer.max_epochs": "3",
            "trainer.limit_eval_batches": "null",
        },
    )
    spec = registry.ARCHS[cfg.model.arch]
    monkeypatch.setitem(
        registry.ARCHS, cfg.model.arch,
        dataclasses.replace(spec, depth=2, embed_dim=64, num_heads=4),
    )
    hist = exp.main(cfg)["history"]
    accs = {h["epoch"]: h["accuracy"] for h in hist}
    best_epoch = max(accs, key=accs.get)

    capsys.readouterr()
    metrics = exp.evaluate_only(cfg)
    out = capsys.readouterr().out
    assert f"restored best by 'accuracy' checkpoint (epoch {best_epoch})" in out
    assert metrics["accuracy"] == accs[best_epoch]
    assert "swa_accuracy" in metrics  # swa started at epoch 0 in _shrink

    # without a monitor the latest checkpoint is restored instead
    cfg2 = apply_overrides(cfg, {"trainer.monitor": "null"})
    exp.evaluate_only(cfg2)
    out2 = capsys.readouterr().out
    assert f"restored latest checkpoint (epoch {len(hist) - 1})" in out2


def test_test_loaders_and_print_config(tmp_path, rng_np, capsys):
    exp = EXPERIMENTS["audioset"]
    path = _make_synth(tmp_path, rng_np, classes=527)
    cfg = _shrink(exp.default_config, path, 527)
    out = exp.test_loaders(cfg)
    assert out["training"] == (4, 32000)
    exp.print_config(cfg)
    captured = capsys.readouterr().out
    assert '"batch_size": 4' in captured


def test_predict_command(tmp_path, rng_np, monkeypatch):
    import dataclasses

    import passt_tpu.models.registry as registry

    exp = EXPERIMENTS["audioset"]
    path = _make_synth(tmp_path, rng_np, classes=527)
    cfg = _shrink(exp.default_config, path, 527)
    cfg = apply_overrides(
        cfg,
        {"trainer.checkpoint_dir": str(tmp_path), "trainer.limit_eval_batches": "null"},
    )
    spec = registry.ARCHS[cfg.model.arch]
    monkeypatch.setitem(
        registry.ARCHS, cfg.model.arch,
        dataclasses.replace(spec, depth=1, embed_dim=64, num_heads=4),
    )
    res = exp.predict(cfg)
    assert res["n"] == 24
    data = np.load(res["path"])
    assert data["out"].shape == (24, 527)
    assert (data["out"] >= 0).all() and (data["out"] <= 1).all()
    assert data["names"].shape == (24,)


@pytest.mark.slow
def test_model_speed_test_smoke(monkeypatch):
    import dataclasses

    import passt_tpu.models.registry as registry

    exp = EXPERIMENTS["audioset"]
    cfg = apply_overrides(
        exp.default_config,
        {"model.input_tdim": "98", "model.s_patchout_t": "2", "model.s_patchout_f": "1",
         "model.dtype": "float32"},
    )
    spec = registry.ARCHS[cfg.model.arch]
    monkeypatch.setitem(
        registry.ARCHS, cfg.model.arch,
        dataclasses.replace(spec, depth=1, embed_dim=64, num_heads=4),
    )
    res = exp.model_speed_test(cfg, speed_test_batch_size=2, test_length=3)
    assert res["specs_per_second"] > 0


@pytest.mark.slow
def test_evaluate_ensemble_command(tmp_path, rng_np, monkeypatch):
    """End-to-end ensemble evaluation with tiny models and ported-npz
    checkpoints on synthetic data."""
    import dataclasses

    import jax

    import passt_tpu.models.registry as registry
    from passt_tpu.models.passt import init_passt
    from passt_tpu.models.pretrained import save_params_npz

    # Shrink every arch in a 2-model ensemble and write npz "checkpoints".
    arch_list, _ = registry.ENSEMBLES["ensemble_s16_14"]
    for i, (arch, fs, ts) in enumerate(arch_list):
        spec = registry.ARCHS[arch]
        monkeypatch.setitem(
            registry.ARCHS, arch,
            dataclasses.replace(spec, depth=1, embed_dim=64, num_heads=4),
        )
        cfg_i = registry.get_model_config(
            arch, n_classes=8, fstride=fs, tstride=ts, input_tdim=98
        )
        _, params = init_passt(cfg_i, jax.random.PRNGKey(i))
        save_params_npz(str(tmp_path / f"{arch}.npz"), params)

    path = _make_synth(tmp_path, rng_np, classes=8)
    exp = EXPERIMENTS["audioset"]
    cfg = apply_overrides(
        exp.default_config,
        {
            "model.ensemble": "ensemble_s16_14",
            "model.ensemble_checkpoint_dir": str(tmp_path),
            "model.n_classes": "8",
            "model.input_tdim": "98",
            "data.num_classes": "8",
            "data.eval_hdf5": path,
            "data.clip_length": "1",
            "data.eval_batch_size": "8",
            "trainer.limit_eval_batches": "2",
        },
    )
    res = exp.evaluate_ensemble(cfg)
    assert 0.0 <= res["ap"] <= 1.0
    assert res["published_map"] == 0.48579


def test_evaluate_ensemble_requires_checkpoint_dir():
    """Without ported checkpoints the command must fail fast instead of
    evaluating randomly initialized members to ap~0.002."""
    exp = EXPERIMENTS["audioset"]
    cfg = apply_overrides(
        exp.default_config, {"model.ensemble": "ensemble_s16_14"}
    )
    with pytest.raises(SystemExit, match="ensemble_checkpoint_dir"):
        exp.evaluate_ensemble(cfg)


def test_eval_loader_sharded_flag(tmp_path, rng_np):
    """Commands with no cross-process gather (evaluate_ensemble, predict)
    request sharded=False and must see the FULL eval set even when the
    config carries a multi-replica data layout."""
    from passt_tpu.experiments.common import build_eval_loader

    path = _make_synth(tmp_path, rng_np, n=24, classes=8)
    exp = EXPERIMENTS["audioset"]
    cfg = _shrink(exp.default_config, path, 8)
    cfg = apply_overrides(
        cfg, {"data.num_replicas": "2", "data.rank": "0", "model.n_classes": "8",
              "data.num_classes": "8"}
    )

    def count(loader):
        it = iter(loader)
        n = sum(len(b["wave"]) for b in it)
        return n

    assert count(build_eval_loader(cfg)) == 12  # rank slice
    assert count(build_eval_loader(cfg, sharded=False)) == 24  # full set


def test_resume_moments_dtype_mismatch_is_actionable(tmp_path, rng_np):
    """Restoring a checkpoint written under a different
    trainer.opt_moments_dtype must raise an error that names the knob, not
    an opaque orbax tree mismatch."""
    import jax

    from passt_tpu.models.passt import PaSSTConfig
    from passt_tpu.train.loop import restore_checkpoint
    from passt_tpu.train.steps import create_train_state, make_optimizer

    cfg = PaSSTConfig(
        input_fdim=32, input_tdim=50, embed_dim=32, depth=1, num_heads=2,
        num_classes=8, dtype="float32",
    )
    tx32 = make_optimizer(lr=1e-3, steps_per_epoch=4, moments_dtype=None)
    _, state32 = create_train_state(cfg, tx32, jax.random.PRNGKey(0))

    import orbax.checkpoint as ocp

    ckdir = str(tmp_path / "ck")
    mgr = ocp.CheckpointManager(ckdir)
    mgr.save(
        0,
        args=ocp.args.StandardSave(
            {"params": state32.params, "opt_state": state32.opt_state,
             "step": state32.step}
        ),
    )
    mgr.wait_until_finished()

    tx_sr = make_optimizer(lr=1e-3, steps_per_epoch=4, moments_dtype="bfloat16_sr")
    _, state_sr = create_train_state(cfg, tx_sr, jax.random.PRNGKey(0))
    with pytest.raises(RuntimeError, match="opt_moments_dtype"):
        restore_checkpoint(ckdir, state_sr)
    # matching template restores fine
    st, swa, epoch = restore_checkpoint(ckdir, state32)
    assert epoch == 0 and swa is None


def test_compilation_cache_knob(tmp_path):
    """trainer.compilation_cache_dir wires JAX's persistent compile cache:
    after enabling, a jitted executable lands in the directory so later
    process starts skip the tens-of-seconds first compile (TPU UX; no
    reference analogue — PL/torch has no cross-process compile cache)."""
    import jax
    import jax.numpy as jnp

    from passt_tpu.experiments.common import enable_compilation_cache

    base = EXPERIMENTS["audioset"].default_config
    assert base.trainer.compilation_cache_dir is None  # default off
    _, cfg = parse_cli(
        ["main", f"trainer.compilation_cache_dir={tmp_path}"], base
    )
    enable_compilation_cache(cfg.trainer.compilation_cache_dir)
    try:
        jax.jit(lambda x: x * 3 + 1)(jnp.ones(8)).block_until_ready()
        assert any(p.name.endswith("-cache") for p in tmp_path.iterdir())
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_resolve_monitor_prefix_normalization():
    """trainer.monitor name resolution vs eval-set naming: prefixed
    ("valid_allap", the FSD50K recipe default mirroring the reference's
    set_name+"allap" logging, ex_fsd50k.py:222,254) must resolve to the
    unprefixed record key when only ONE eval set is configured — otherwise
    best-metric retention would silently never match."""
    from passt_tpu.experiments.common import Experiment

    one = {"": object()}
    two = {"valid": object(), "eval": object()}
    assert Experiment._resolve_monitor("valid_allap", one) == "allap"
    assert Experiment._resolve_monitor("eval_allap", one) == "allap"
    assert Experiment._resolve_monitor("valid_allap", two) == "valid_allap"
    assert Experiment._resolve_monitor("allap", one) == "allap"
    assert Experiment._resolve_monitor(None, one) is None
    assert Experiment._resolve_monitor("", {}) == ""
