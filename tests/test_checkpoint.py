"""Checkpoint/resume + utility tests."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from passt_tpu.models.passt import PaSSTConfig
from passt_tpu.ops.frontend import MelConfig
from passt_tpu.train.loop import MetricsLogger, fit, restore_checkpoint
from passt_tpu.train.steps import create_train_state, make_optimizer, make_train_step, make_eval_step
from passt_tpu.utils import count_non_zero_params, count_params, param_summary


class _ListLoader:
    def __init__(self, batches):
        self.batches = batches

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def _setup(rng_np):
    cfg = PaSSTConfig(
        input_fdim=32, input_tdim=50, embed_dim=64, depth=2, num_heads=4, num_classes=8
    )
    mcfg = MelConfig(n_mels=32, freqm=4, timem=8)
    tx = make_optimizer(lr=1e-3, steps_per_epoch=2)
    model, state = create_train_state(cfg, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, mcfg, donate=False)
    ev = make_eval_step(model, mcfg)
    batches = [
        {
            "wave": rng_np.standard_normal((4, 16000)).astype(np.float32),
            "target": (rng_np.uniform(size=(4, 8)) < 0.3).astype(np.float32),
            "name": ["x"] * 4,
        }
        for _ in range(2)
    ]
    return cfg, tx, model, state, step, ev, batches


@pytest.mark.slow
def test_fit_checkpoint_and_resume(tmp_path, rng_np):
    cfg, tx, model, state, step, ev, batches = _setup(rng_np)
    ckpt = str(tmp_path / "ckpt")
    res = fit(
        train_step=step,
        eval_step=ev,
        state=state,
        train_loader=_ListLoader(batches),
        val_loader=None,
        max_epochs=3,
        base_rng=jax.random.PRNGKey(1),
        checkpoint_dir=ckpt,
        keep_last_n=2,
        logger=MetricsLogger(quiet=True),
    )
    assert int(res.state.step) == 6

    # Restore into a fresh template.
    _, fresh = create_train_state(cfg, tx, jax.random.PRNGKey(99))[0], None
    model2, fresh_state = create_train_state(cfg, tx, jax.random.PRNGKey(99))
    restored, swa_params, epoch = restore_checkpoint(ckpt, fresh_state)
    assert epoch == 2
    assert int(restored.step) == 6
    a = jax.tree.leaves(res.state.params)
    b = jax.tree.leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # keep_last_n=2: epoch 0 checkpoint evicted.
    with pytest.raises(Exception):
        restore_checkpoint(ckpt, fresh_state, step=0)

    # Resumed training continues from the restored state.
    res2 = fit(
        train_step=step,
        eval_step=ev,
        state=restored,
        train_loader=_ListLoader(batches),
        max_epochs=4,
        start_epoch=3,
        base_rng=jax.random.PRNGKey(1),
        logger=MetricsLogger(quiet=True),
    )
    assert int(res2.state.step) == 8


@pytest.mark.slow
def test_best_metric_checkpoint_retention(tmp_path, rng_np, monkeypatch):
    """fit(monitor='allap') retains the BEST epoch by the monitored eval
    metric, not the last (reference FSD50K ModelCheckpoint(monitor='allap',
    save_top_k, mode='max'), ex_fsd50k.py:292-294). The metric is rigged
    via a scripted evaluate() so the best epoch is mid-run."""
    import passt_tpu.train.loop as loop_mod

    cfg, tx, model, state, step, ev, batches = _setup(rng_np)
    rigged = iter([0.3, 0.9, 0.5])

    def fake_evaluate(*a, **k):
        return {"val_loss": 1.0, "ap": 0.0, "allap": next(rigged), "n_eval": 4}

    monkeypatch.setattr(loop_mod, "evaluate", fake_evaluate)
    ckpt = str(tmp_path / "ckpt_best")
    res = fit(
        train_step=step,
        eval_step=ev,
        state=state,
        train_loader=_ListLoader(batches),
        val_loader=_ListLoader(batches),  # evaluate() is rigged; content unused
        max_epochs=3,
        base_rng=jax.random.PRNGKey(1),
        checkpoint_dir=ckpt,
        keep_last_n=1,
        monitor="allap",
        logger=MetricsLogger(quiet=True),
    )
    assert [h["allap"] for h in res.history] == [0.3, 0.9, 0.5]

    _, fresh_state = create_train_state(cfg, tx, jax.random.PRNGKey(99))
    # best-by-metric restore lands on epoch 1 (allap 0.9), step 4 = 2
    # epochs x 2 batches — NOT the final epoch 2 state
    restored, _, epoch = restore_checkpoint(ckpt, fresh_state, monitor="allap")
    assert epoch == 1
    assert int(restored.step) == 4
    # keep_last_n=1 best-retention: the final (worse) epoch was evicted
    with pytest.raises(Exception):
        restore_checkpoint(ckpt, fresh_state, step=2)
    # plain restore (latest retained) is the same best checkpoint
    assert restore_checkpoint(ckpt, fresh_state)[2] == 1


@pytest.mark.slow
def test_monitor_skips_epochs_without_eval(tmp_path, rng_np, monkeypatch, capsys):
    """With monitor set and eval_every=2, non-eval epochs are not
    checkpointed (the reference ModelCheckpoint saves on validation end)."""
    import passt_tpu.train.loop as loop_mod

    cfg, tx, model, state, step, ev, batches = _setup(rng_np)
    monkeypatch.setattr(
        loop_mod, "evaluate",
        lambda *a, **k: {"val_loss": 1.0, "allap": 0.5, "n_eval": 4},
    )
    ckpt = str(tmp_path / "ckpt_gap")
    fit(
        train_step=step,
        eval_step=ev,
        state=state,
        train_loader=_ListLoader(batches),
        val_loader=_ListLoader(batches),
        max_epochs=2,
        eval_every=2,
        base_rng=jax.random.PRNGKey(1),
        checkpoint_dir=ckpt,
        monitor="allap",
        logger=MetricsLogger(quiet=True),
    )
    out = capsys.readouterr().out
    assert "checkpoint skipped at epoch 0" in out
    _, fresh_state = create_train_state(cfg, tx, jax.random.PRNGKey(99))
    # only epoch 1 (the eval epoch) was saved
    assert restore_checkpoint(ckpt, fresh_state)[2] == 1


@pytest.mark.slow
def test_lr_logged(rng_np):
    cfg, tx, model, state, step, ev, batches = _setup(rng_np)
    from passt_tpu.train.steps import make_schedule

    sched = make_schedule(lr=1e-3, steps_per_epoch=2)
    res = fit(
        train_step=step,
        eval_step=ev,
        state=state,
        train_loader=_ListLoader(batches),
        max_epochs=2,
        base_rng=jax.random.PRNGKey(1),
        logger=MetricsLogger(quiet=True),
        lr_schedule=sched,
    )
    assert "lr" in res.history[0]
    assert res.history[0]["lr"] == pytest.approx(float(sched(2)))


def test_param_counting():
    params = {"a": jnp.zeros((3, 4)), "b": {"c": jnp.ones((5,))}}
    assert count_params(params) == 17
    desc, total, nz = count_non_zero_params(params)
    assert total == 17 and nz == 5
    summary = param_summary(params)
    assert "TOTAL" in summary and "17" in summary


def test_verbose_shapes_prints(capsys):
    from passt_tpu.models.passt import init_passt

    cfg = PaSSTConfig(
        input_fdim=32, input_tdim=50, embed_dim=64, depth=1, num_heads=4,
        num_classes=8, verbose_shapes=True,
    )
    model, params = init_passt(cfg, jax.random.PRNGKey(0))
    out = capsys.readouterr().out
    assert "patch_embed" in out and "final sequence" in out


@pytest.mark.slow
def test_fit_interrupt_saves_checkpoint(tmp_path, rng_np):
    """KeyboardInterrupt mid-training saves a resumable checkpoint."""
    cfg, tx, model, state, step, ev, batches = _setup(rng_np)

    calls = {"n": 0}

    def interrupting_step(st, batch, rng):
        calls["n"] += 1
        if calls["n"] == 3:
            raise KeyboardInterrupt
        return step(st, batch, rng)

    ckpt = str(tmp_path / "ckpt_int")
    res = fit(
        train_step=interrupting_step,
        eval_step=ev,
        state=state,
        train_loader=_ListLoader(batches),
        max_epochs=5,
        base_rng=jax.random.PRNGKey(1),
        checkpoint_dir=ckpt,
        logger=MetricsLogger(quiet=True),
    )
    # interrupted mid-epoch-1 after 2 full epoch-0 steps: the run exits
    # cleanly and the epoch-0 checkpoint (step=2) is the resume point.
    assert int(res.state.step) == 2
    model2, fresh = _setup(rng_np)[2:4]
    restored, _, epoch = restore_checkpoint(ckpt, fresh)
    assert epoch == 0
    assert int(restored.step) == 2


@pytest.mark.slow
def test_spectrogram_dump(tmp_path, rng_np):
    """dump_spectrograms=1 with 2 batches x 2 epochs: the global-step gate
    must stop after the first step and never re-fire."""
    import os

    cfg, tx, model, state, step, ev, batches = _setup(rng_np)
    fit(
        train_step=step,
        eval_step=ev,
        state=state,
        train_loader=_ListLoader(batches),
        max_epochs=2,
        base_rng=jax.random.PRNGKey(1),
        checkpoint_dir=str(tmp_path),
        logger=MetricsLogger(quiet=True),
        dump_spectrograms=1,
        mel_cfg=MelConfig(n_mels=32, freqm=4, timem=8),
    )
    a = np.load(tmp_path / "spectrograms_step0.npy")
    assert a.shape[0] == 4 and a.shape[1] == 32
    # train-mode mel: SpecAugment zeros appear as the normalized 0.9 value
    assert np.isclose(a, 0.9, atol=1e-6).any()
    for s in (1, 2, 3):
        assert not os.path.exists(tmp_path / f"spectrograms_step{s}.npy")


@pytest.mark.slow
def test_sigterm_preemption_clean_exit(tmp_path, rng_np):
    """SIGTERM mid-training exits cleanly with the last COMPLETED epoch's
    checkpoint on disk (TPU-pod preemption grace handling, beyond
    reference — its DDP parent just dies, ex_audioset.py:522-524). The
    signal is raised from a loader wrapper during epoch 1; fit must return
    (not die), keep epoch 0's checkpoint, and restore the original
    handler."""
    import os
    import signal

    cfg, tx, model, state, step, ev, batches = _setup(rng_np)
    prev_handler = signal.getsignal(signal.SIGTERM)

    class _KillingLoader(_ListLoader):
        def __iter__(self):
            for i, b in enumerate(self.batches):
                if self.epoch == 1 and i == 1:
                    os.kill(os.getpid(), signal.SIGTERM)
                yield b

    ckpt = str(tmp_path / "ckpt")
    res = fit(
        train_step=step,
        eval_step=ev,
        state=state,
        train_loader=_KillingLoader(batches),
        max_epochs=3,
        base_rng=jax.random.PRNGKey(1),
        checkpoint_dir=ckpt,
        logger=MetricsLogger(quiet=True),
    )
    # epoch 0 completed (2 batches) + epoch 1's first batch ran before the
    # flag check stopped the epoch; only epoch 0 is checkpointed/recorded.
    assert res.interrupted
    assert [r["epoch"] for r in res.history] == [0]
    model2, fresh = create_train_state(cfg, tx, jax.random.PRNGKey(99))
    restored, _, epoch = restore_checkpoint(ckpt, fresh)
    assert epoch == 0 and int(restored.step) == 2
    assert signal.getsignal(signal.SIGTERM) is prev_handler


@pytest.mark.slow
def test_sigterm_between_epochs_keeps_completed_epoch(tmp_path, rng_np, monkeypatch):
    """SIGTERM landing during eval (between epochs) exits after the
    completed epoch's checkpoint is written, not before."""
    import os
    import signal

    import passt_tpu.train.loop as loop_mod

    cfg, tx, model, state, step, ev, batches = _setup(rng_np)

    def killing_evaluate(*a, **k):
        os.kill(os.getpid(), signal.SIGTERM)
        return {"val_loss": 1.0, "ap": 0.5, "allap": 0.5, "n_eval": 4}

    monkeypatch.setattr(loop_mod, "evaluate", killing_evaluate)
    ckpt = str(tmp_path / "ckpt")
    res = fit(
        train_step=step,
        eval_step=ev,
        state=state,
        train_loader=_ListLoader(batches),
        val_loader=_ListLoader(batches),
        max_epochs=3,
        base_rng=jax.random.PRNGKey(1),
        checkpoint_dir=ckpt,
        logger=MetricsLogger(quiet=True),
    )
    # epoch 0 ran to completion (incl. its rigged eval) and was saved;
    # the loop then exited instead of starting epoch 1.
    assert res.interrupted
    assert [r["epoch"] for r in res.history] == [0]
    assert res.history[0]["allap"] == 0.5
    model2, fresh = create_train_state(cfg, tx, jax.random.PRNGKey(99))
    _, _, epoch = restore_checkpoint(ckpt, fresh)
    assert epoch == 0


@pytest.mark.slow
def test_profiler_trace_knob(tmp_path, rng_np):
    """profile_dir captures a jax.profiler trace of the configured step
    window (beyond reference: SURVEY.md §5 — no profiler integration
    there). The trace must close even though the window covers the whole
    2-step run."""
    cfg, tx, model, state, step, ev, batches = _setup(rng_np)
    prof = tmp_path / "trace"
    fit(
        train_step=step,
        eval_step=ev,
        state=state,
        train_loader=_ListLoader(batches),
        max_epochs=1,
        base_rng=jax.random.PRNGKey(1),
        logger=MetricsLogger(quiet=True),
        profile_dir=str(prof),
        profile_start_step=0,
        profile_num_steps=2,
    )
    traced = list(prof.rglob("*.xplane.pb"))
    assert traced, f"no trace files under {prof}"

@pytest.mark.slow
def test_exception_restores_sigterm_handler_and_closes_trace(tmp_path, rng_np):
    """An exception escaping the epoch loop (e.g. a prefetcher error) must
    still restore the previous SIGTERM handler and close an open profiler
    trace — otherwise a crashed-but-alive process swallows every later
    SIGTERM (flag set, nobody reads it) and the preemption feature is
    defeated (ADVICE r3, loop.py finally block)."""
    import signal

    cfg, tx, model, state, step, ev, batches = _setup(rng_np)
    prev_handler = signal.getsignal(signal.SIGTERM)

    class _ExplodingLoader(_ListLoader):
        def __iter__(self):
            yield self.batches[0]
            raise RuntimeError("prefetcher died")

    prof = tmp_path / "trace"
    with pytest.raises(RuntimeError, match="prefetcher died"):
        fit(
            train_step=step,
            eval_step=ev,
            state=state,
            train_loader=_ExplodingLoader(batches),
            max_epochs=2,
            base_rng=jax.random.PRNGKey(1),
            logger=MetricsLogger(quiet=True),
            profile_dir=str(prof),
            profile_start_step=0,
            profile_num_steps=100,  # window stays open when the loader dies
        )
    assert signal.getsignal(signal.SIGTERM) is prev_handler
    # the open trace was stopped in the finally block (a leaked trace makes
    # every later start_trace raise); prove it by starting/stopping another
    jax.profiler.start_trace(str(tmp_path / "trace2"))
    jax.profiler.stop_trace()


@pytest.mark.slow
def test_spectrogram_dump_matches_step_mel(tmp_path, rng_np):
    """The dumped spectrogram must be EXACTLY the mel input the train step
    computed at that global step — both sides consume steps.step_keys, so a
    refactor of the step's key-split order cannot desynchronize them
    (VERDICT r3 weak #5)."""
    from passt_tpu.ops.frontend import log_mel_spectrogram
    from passt_tpu.train.steps import step_keys

    cfg, tx, model, state, step, ev, batches = _setup(rng_np)
    mcfg = MelConfig(n_mels=32, freqm=4, timem=8)
    base_rng = jax.random.PRNGKey(1)
    fit(
        train_step=step,
        eval_step=ev,
        state=state,
        train_loader=_ListLoader(batches),
        max_epochs=1,
        base_rng=base_rng,
        checkpoint_dir=str(tmp_path),
        logger=MetricsLogger(quiet=True),
        dump_spectrograms=1,
        mel_cfg=mcfg,
    )
    dumped = np.load(tmp_path / "spectrograms_step0.npy")
    k_mel = step_keys(base_rng, 0)[0]
    expected = np.asarray(
        log_mel_spectrogram(jnp.asarray(batches[0]["wave"]), mcfg, rng=k_mel, train=True)
    )
    np.testing.assert_array_equal(dumped, expected)


@pytest.mark.slow
def test_profiler_fires_on_resumed_run(tmp_path, rng_np):
    """A resumed run whose restored step already exceeds profile_start_step
    must still capture a trace window (>= + one-shot, ADVICE r3 low #4)."""
    cfg, tx, model, state, step, ev, batches = _setup(rng_np)
    state = state.replace(step=jnp.int32(50))  # "resumed" past the window
    prof = tmp_path / "trace"
    fit(
        train_step=step,
        eval_step=ev,
        state=state,
        train_loader=_ListLoader(batches),
        max_epochs=1,
        base_rng=jax.random.PRNGKey(1),
        logger=MetricsLogger(quiet=True),
        profile_dir=str(prof),
        profile_start_step=10,
        profile_num_steps=1,
    )
    traced = list(prof.rglob("*.xplane.pb"))
    assert traced, f"no trace files under {prof} (window never fired on resume)"

@pytest.mark.slow
def test_device_feed_bitwise_matches_inline(tmp_path, rng_np):
    """device_prefetch only changes WHERE the transfer happens (feed thread
    vs inline) — params and losses must be bitwise identical."""
    cfg, tx, model, state0, step, ev, batches = _setup(rng_np)

    def run(device_prefetch):
        _, st = _setup(rng_np)[2:4]  # fresh identical init (same PRNGKey)
        res = fit(
            train_step=step,
            eval_step=ev,
            state=st,
            train_loader=_ListLoader(batches),
            max_epochs=2,
            base_rng=jax.random.PRNGKey(1),
            logger=MetricsLogger(quiet=True),
            device_prefetch=device_prefetch,
        )
        return res

    a, b = run(0), run(2)
    for x, y in zip(jax.tree.leaves(a.state.params), jax.tree.leaves(b.state.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert [r.get("train_loss") for r in a.history] == [
        r.get("train_loss") for r in b.history
    ]


@pytest.mark.slow
def test_transfer_dtype_int16(rng_np):
    """transfer_dtype='int16' ships the wave as int16 PCM and dequantizes
    on device: values from int16 containers round-trip exactly; arbitrary
    floats land within 2^-16 full scale. Training must run and produce
    finite, close-to-float32 losses."""
    cfg, tx, model, state, step, ev, batches = _setup(rng_np)
    # container-representable values: exact round-trip through the path
    w16 = (rng_np.integers(-32768, 32768, size=(4, 16000)).astype(np.float32)
           / 32768.0)
    exact_batches = [dict(batches[0], wave=w16)]
    res = fit(
        train_step=step,
        eval_step=ev,
        state=state,
        train_loader=_ListLoader(exact_batches + batches),
        max_epochs=1,
        base_rng=jax.random.PRNGKey(1),
        logger=MetricsLogger(quiet=True),
        transfer_dtype="int16",
    )
    assert np.isfinite(res.history[0]["train_loss"])

    # the dequantized device wave equals the host wave for int16-grid values
    import jax.numpy as jnp

    q = np.clip(np.rint(w16 * 32768.0), -32768, 32767).astype(np.int16)
    back = np.asarray(jnp.asarray(q).astype(jnp.float32) / 32768.0)
    np.testing.assert_array_equal(back, w16)
    # arbitrary floats: bounded quantization error
    w = rng_np.uniform(-1, 1, size=(2, 1000)).astype(np.float32)
    q2 = np.clip(np.rint(w * 32768.0), -32768, 32767).astype(np.int16)
    err = np.abs(q2.astype(np.float32) / 32768.0 - w).max()
    assert err <= 1.0 / 65536.0 + 1e-7

    with pytest.raises(ValueError, match="transfer_dtype"):
        fit(
            train_step=step, eval_step=ev, state=res.state,
            train_loader=_ListLoader(batches), max_epochs=1,
            base_rng=jax.random.PRNGKey(1), logger=MetricsLogger(quiet=True),
            transfer_dtype="int8",
        )


def test_device_feed_stop_and_error_propagation():
    """DeviceFeed.stop() releases the feed thread and the wrapped iterator;
    an exception in the conversion propagates to the consumer."""
    from passt_tpu.data.pipeline import DeviceFeed

    class _Inner:
        def __init__(self):
            self.stopped = False
            self._it = iter(range(100))

        def __iter__(self):
            return self

        def __next__(self):
            return next(self._it)

        def stop(self):
            self.stopped = True

    inner = _Inner()
    feed = DeviceFeed(inner, lambda x: x * 2, depth=2)
    assert next(feed) == 0 and next(feed) == 2
    feed.stop()
    assert inner.stopped
    assert not feed.thread.is_alive()

    def boom(x):
        if x == 3:
            raise RuntimeError("convert failed")
        return x

    feed2 = DeviceFeed(iter(range(10)), boom, depth=2)
    got = []
    with pytest.raises(RuntimeError, match="convert failed"):
        for v in feed2:
            got.append(v)
    assert got == [0, 1, 2]


@pytest.mark.slow
def test_restore_swa_template_fp32_under_bf16_params(tmp_path, rng_np):
    """The SWA running average is saved fp32 regardless of the params'
    storage dtype (swa_init pins fp32 — a bf16 average stalls). The
    restore template must be fp32 too: under param_dtype='bfloat16_sr' a
    template copied from state.params would make orbax silently downcast
    the restored average to bf16 — a one-shot quantization of the very
    weights the SWA protocols report."""
    cfg = PaSSTConfig(
        input_fdim=32, input_tdim=50, embed_dim=64, depth=2, num_heads=4,
        num_classes=8,
    )
    mcfg = MelConfig(n_mels=32, freqm=4, timem=8)
    tx = make_optimizer(lr=1e-3, steps_per_epoch=2)
    model, state = create_train_state(
        cfg, tx, jax.random.PRNGKey(0), param_dtype="bfloat16_sr"
    )
    step = make_train_step(model, tx, mcfg, donate=False, param_sr=True)
    ev = make_eval_step(model, mcfg)
    batches = [
        {
            "wave": rng_np.standard_normal((4, 16000)).astype(np.float32),
            "target": (rng_np.uniform(size=(4, 8)) < 0.3).astype(np.float32),
            "name": ["x"] * 4,
        }
        for _ in range(2)
    ]
    ckpt = str(tmp_path / "ckpt_swa_bf16")
    res = fit(
        train_step=step,
        eval_step=ev,
        state=state,
        train_loader=_ListLoader(batches),
        max_epochs=2,
        swa_epoch_start=1,
        swa_freq=1,
        base_rng=jax.random.PRNGKey(1),
        checkpoint_dir=ckpt,
        logger=MetricsLogger(quiet=True),
    )
    assert res.swa is not None and res.swa.n_averaged > 0

    _, fresh = create_train_state(
        cfg, tx, jax.random.PRNGKey(99), param_dtype="bfloat16_sr"
    )
    assert any(
        p.dtype == jnp.bfloat16 for p in jax.tree.leaves(fresh.params)
    )  # the template params really are bf16 — the hazard is live
    restored, swa_restore, _ = restore_checkpoint(ckpt, fresh)
    assert swa_restore is not None
    avg_leaves = jax.tree.leaves(swa_restore[0])
    assert all(l.dtype == jnp.float32 for l in avg_leaves)
    for a, b in zip(jax.tree.leaves(res.swa.avg_params), avg_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_restore_best_monitor_prefix_tolerant(tmp_path, rng_np, monkeypatch):
    """Eval-set prefixes on the monitor key depend on how many eval sets
    the SAVING run had (multi-val prefixes 'valid_'/'eval_', single-val
    doesn't). restore_checkpoint's best-metric lookup accepts the exact,
    stripped, and prefixed key so evaluate_only (which builds ONE loader
    and resolves the monitor to the unprefixed form) can restore a
    checkpoint trained dual-val — the FSD50K flagship recipe."""
    import passt_tpu.train.loop as loop_mod

    cfg, tx, model, state, step, ev, batches = _setup(rng_np)
    # evaluate() runs once per val set per epoch, in dict order
    # (valid, eval): valid_allap sees 0.3 / 0.9 / 0.5
    rigged = iter([0.3, 0.0, 0.9, 0.0, 0.5, 0.0])

    def fake_evaluate(*a, **k):
        return {"val_loss": 1.0, "allap": next(rigged), "n_eval": 4}

    monkeypatch.setattr(loop_mod, "evaluate", fake_evaluate)
    ckpt = str(tmp_path / "ckpt_prefix")
    fit(
        train_step=step,
        eval_step=ev,
        state=state,
        train_loader=_ListLoader(batches),
        val_loaders={"valid": _ListLoader(batches), "eval": _ListLoader(batches)},
        max_epochs=3,
        base_rng=jax.random.PRNGKey(1),
        checkpoint_dir=ckpt,
        keep_last_n=3,
        monitor="valid_allap",
        logger=MetricsLogger(quiet=True),
    )
    _, fresh = create_train_state(cfg, tx, jax.random.PRNGKey(99))
    # the stripped form evaluate_only resolves to against its single loader
    _, _, epoch = restore_checkpoint(ckpt, fresh, monitor="allap")
    assert epoch == 1  # best valid_allap = 0.9
    # the exact saved key still works
    assert restore_checkpoint(ckpt, fresh, monitor="valid_allap")[2] == 1
    # and a monitor that matches nothing fails loudly, naming the keys
    with pytest.raises(Exception, match="not among checkpoint metrics"):
        restore_checkpoint(ckpt, fresh, monitor="nonexistent_metric")


def test_eval_feed_knobs(rng_np):
    """evaluate()'s device_prefetch / transfer_dtype mirror fit()'s feed
    knobs (round-5 plumb-through): prefetch depth only changes WHERE the
    transfer happens, so metrics must be bitwise identical; int16 transfer
    round-trips exactly for int16-grid waves; bad dtype raises."""
    from passt_tpu.train.loop import evaluate

    cfg, tx, model, state, step, ev, batches = _setup(rng_np)
    # int16-grid waves: the quantize->dequantize path is exact for these,
    # so even the int16 run must reproduce the float32 metrics bitwise
    grid = [
        dict(
            b,
            wave=(
                np.clip(np.rint(b["wave"] * 0.01 * 32768.0), -32768, 32767)
                .astype(np.float32)
                / 32768.0
            ),
        )
        for b in batches
    ]
    m_inline = evaluate(ev, state.params, _ListLoader(grid), device_prefetch=0)
    m_feed = evaluate(ev, state.params, _ListLoader(grid), device_prefetch=2)
    m_int16 = evaluate(
        ev, state.params, _ListLoader(grid), transfer_dtype="int16"
    )
    assert m_inline == m_feed == m_int16
    with pytest.raises(ValueError, match="transfer_dtype"):
        evaluate(ev, state.params, _ListLoader(grid), transfer_dtype="int8")


def test_monitor_metric_ambiguity_raises():
    """_resolve_monitor_metric: exact > single prefix match > loud failure;
    a stripped monitor matching BOTH valid_ and eval_ variants refuses to
    guess (ADVICE r4 #2)."""
    from passt_tpu.train.loop import _resolve_monitor_metric as res

    assert res({"allap": 0.4}, "allap") == 0.4
    assert res({"valid_allap": 0.5}, "allap") == 0.5       # prefix added
    assert res({"allap": 0.6}, "valid_allap") == 0.6       # prefix stripped
    # exact key wins even when the ambiguous pair exists
    assert res({"valid_allap": 0.1, "eval_allap": 0.2}, "eval_allap") == 0.2
    with pytest.raises(KeyError, match="ambiguous"):
        res({"valid_allap": 0.1, "eval_allap": 0.2}, "allap")
    with pytest.raises(KeyError, match="not among"):
        res({"valid_allap": 0.1}, "loss")


def test_fit_forwards_eval_feed_knobs(rng_np, monkeypatch):
    """fit() must pass its device_prefetch/transfer_dtype feed knobs to the
    per-epoch evaluate() calls — otherwise trainer.transfer_dtype=int16
    silently ships float32 on the eval path (round-5 review finding)."""
    import passt_tpu.train.loop as loop_mod

    cfg, tx, model, state, step, ev, batches = _setup(rng_np)
    seen = []
    real_evaluate = loop_mod.evaluate

    def spy(*a, **k):
        seen.append((k.get("device_prefetch"), k.get("transfer_dtype")))
        return real_evaluate(*a, **k)

    monkeypatch.setattr(loop_mod, "evaluate", spy)
    fit(
        train_step=step,
        eval_step=ev,
        state=state,
        train_loader=_ListLoader(batches),
        val_loader=_ListLoader(batches),
        max_epochs=1,
        base_rng=jax.random.PRNGKey(1),
        logger=MetricsLogger(quiet=True),
        device_prefetch=0,
        transfer_dtype="int16",
    )
    assert seen and all(s == (0, "int16") for s in seen)


def test_fit_monitor_never_matching_raises(rng_np):
    """A monitor that can never appear in the epoch record (bare 'allap'
    against dual-set 'valid_'/'eval_' prefixed records) must raise at the
    first eval epoch instead of silently finishing with zero checkpoints
    (round-5 review finding)."""
    cfg, tx, model, state, step, ev, batches = _setup(rng_np)
    with pytest.raises(ValueError, match="available metric keys"):
        fit(
            train_step=step,
            eval_step=ev,
            state=state,
            train_loader=_ListLoader(batches),
            val_loaders={"valid": _ListLoader(batches), "eval": _ListLoader(batches)},
            max_epochs=1,
            base_rng=jax.random.PRNGKey(1),
            checkpoint_dir="/tmp/never_used_ckpt_dir",
            monitor="allap",
            logger=MetricsLogger(quiet=True),
        )


def test_evaluate_prefetch0_stops_underlying_prefetcher(rng_np):
    """device_prefetch=0 wraps the loader iterator in a plain generator;
    early exit must still stop() the UNDERLYING prefetching iterator or
    its worker thread leaks (round-5 review finding)."""
    from passt_tpu.train.loop import evaluate

    cfg, tx, model, state, step, ev, batches = _setup(rng_np)
    stopped = []

    class _StoppableIter:
        def __init__(self, items):
            self._it = iter(items)

        def __iter__(self):
            return self

        def __next__(self):
            return next(self._it)

        def stop(self):
            stopped.append(True)

    class _Loader:
        def __iter__(self):
            return _StoppableIter(batches)

        def __len__(self):
            return len(batches)

    evaluate(ev, state.params, _Loader(), limit_batches=1, device_prefetch=0)
    assert stopped  # the wrapped iterator's stop() was reached
