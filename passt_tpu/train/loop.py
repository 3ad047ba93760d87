"""The training/eval orchestration loop — the reference's PL Trainer + `M`
LightningModule + callbacks collapsed into one explicit loop.

Covers (reference file:line):
- epoch loop with per-epoch sampler reseed (trainer
  ``reload_dataloaders_every_epoch=True``, ex_audioset.py:75),
- train steps fully on device; scalar loss fetched only every
  ``log_every_steps`` (the axon tunnel makes per-step sync expensive),
- validation with per-class AP / ROC-AUC and the 'allap' all-ranks metric
  (ex_audioset.py:245-291) — under jit+GSPMD the gather is implicit,
- SWA running average on epoch boundaries + separate eval of the averaged
  weights (helpers/swa_callback.py; validation_step eval of net_swa,
  ex_audioset.py:231-243),
- checkpointing (orbax) with keep-last-N (ModelCheckpoint at
  ex_audioset.py:315-319) and resume,
- JSONL metrics logging (replaces wandb/sacred observers; a wandb hook can
  be layered on where available).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from passt_tpu.data.pipeline import DeviceFeed
from passt_tpu.train.metrics import mean_average_precision, roc_auc
from passt_tpu.train.steps import TrainState
from passt_tpu.train.swa import SWAState, swa_init, swa_should_update, swa_update


class MetricsLogger:
    """JSONL + stdout metrics sink, with an optional wandb forwarder
    (the reference's primary logger is WandbLogger, ex_audioset.py:38,72;
    here wandb is optional — pass ``wandb_project`` and it activates when
    the package is importable)."""

    def __init__(
        self,
        path: Optional[str] = None,
        quiet: bool = False,
        wandb_project: Optional[str] = None,
        wandb_config: Optional[dict] = None,
    ):
        self.path = path
        self.quiet = quiet
        self._wandb = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None
        if wandb_project:
            try:
                import wandb

                self._wandb = wandb.init(project=wandb_project, config=wandb_config or {})
            except ImportError:
                print("wandb not installed; logging to JSONL/stdout only")

    def log(self, record: Dict[str, Any]) -> None:
        record = {k: (float(v) if hasattr(v, "item") else v) for k, v in record.items()}
        if self._f:
            self._f.write(json.dumps(record) + "\n")
            self._f.flush()
        if self._wandb is not None:
            self._wandb.log(record)
        if not self.quiet:
            parts = " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}" for k, v in record.items()
            )
            print(parts, flush=True)

    def close(self):
        if self._f:
            self._f.close()
        if self._wandb is not None:
            self._wandb.finish()


def _gather_across_processes(out, target, loss):
    """Concatenate per-host eval outputs across all JAX processes — the
    reference's DDP ``all_gather`` before computing 'allap'
    (ex_audioset.py:274-285). Hosts may hold different example counts
    (rank-sliced loaders), so locals are padded to the max count, gathered,
    and trimmed by a gathered validity count. Identity on one process."""
    if jax.process_count() == 1:
        return out, target, loss
    from jax.experimental import multihost_utils

    counts = np.asarray(
        multihost_utils.process_allgather(np.array([len(out)], np.int64))
    ).reshape(-1)
    m = int(counts.max())
    if m == 0:
        raise ValueError("no eval batches on any process")

    # A rank may hold ZERO eval examples (tiny eval set round-robined over
    # more hosts than batches). It cannot know the trailing shapes locally,
    # yet it MUST still enter every collective or the other ranks deadlock —
    # so gather the trailing shapes and fabricate zero-row locals. All
    # arrays ride the gather as float32 (labels/ids are small integers, the
    # cast is exact).
    def shape_desc(a):
        return (list(a.shape[1:]) + [-1, -1])[:2] if len(a) else [-2, -2]

    descs = np.asarray(
        multihost_utils.process_allgather(
            np.array(shape_desc(out) + shape_desc(target) + shape_desc(loss), np.int64)
        )
    ).reshape(len(counts), 3, 2)
    ref = descs[int(np.argmax(counts > 0))]

    def norm(a, r):
        if len(a):
            return np.asarray(a, np.float32)
        return np.zeros((0,) + tuple(int(x) for x in r if x >= 0), np.float32)

    out, target, loss = (norm(a, r) for a, r in zip((out, target, loss), ref))

    def pad(a):
        return np.pad(a, ((0, m - len(a)),) + ((0, 0),) * (a.ndim - 1))

    g = multihost_utils.process_allgather(
        {"out": pad(out), "target": pad(target), "loss": pad(loss)}
    )
    trim = lambda k, shp: np.concatenate(
        [np.asarray(g[k]).reshape((len(counts), m) + shp)[p, : int(counts[p])] for p in range(len(counts))]
    )
    return (
        trim("out", out.shape[1:]),
        trim("target", target.shape[1:]),
        trim("loss", ()),
    )


_DEQUANT_INT16 = jax.jit(lambda q: q.astype(jnp.float32) * (1.0 / 32768.0))


def _check_transfer_dtype(transfer_dtype: str):
    """Shared train/eval validation of the feed transfer dtype."""
    if transfer_dtype not in ("float32", "int16"):
        raise ValueError(
            f"transfer_dtype must be 'float32' or 'int16', got {transfer_dtype!r}"
        )


def _quantize_wave_int16(wave) -> np.ndarray:
    """Host-side symmetric-clip int16 quantization of a waveform batch —
    THE single implementation shared by fit() and evaluate() so train and
    eval transfer numerics cannot drift (scale 32768: int16-container
    values round-trip exactly; post-augment values re-quantize with error
    <= 2^-16 full scale). The jitted dequant twin is _DEQUANT_INT16,
    dispatched from the MAIN thread only (multi-controller dispatch-order
    discipline)."""
    q = np.multiply(np.asarray(wave, np.float32), 32768.0)
    np.rint(q, out=q)
    np.clip(q, -32768.0, 32767.0, out=q)
    return q.astype(np.int16)


def evaluate(
    eval_step: Callable,
    params,
    loader,
    limit_batches: Optional[int] = None,
    single_label: bool = False,
    masked: bool = False,
    runtime=None,
    device_prefetch: int = 2,
    transfer_dtype: str = "float32",
) -> Dict[str, float]:
    """Run the eval loader, compute loss + AP/ROC (multilabel) or accuracy
    (single-label) on host — reference validation_epoch_end
    (ex_audioset.py:245-291; esc50 accuracy variant ex_esc50.py).

    ``runtime`` (a :class:`passt_tpu.parallel.runtime.MeshRuntime`) shards
    each batch over the mesh's data axis, padding ragged tails and trimming
    the padded rows back off the outputs. val_loss is the mean of
    per-example losses, so tail batches are weighted correctly.

    ``device_prefetch`` / ``transfer_dtype`` mirror fit()'s feed knobs on
    the eval path (eval wave batches are the largest transfers in the
    system — B=20 x 10 s = 25.6 MB): prefetch depth 0 disables the
    DeviceFeed thread (inline conversion), and ``transfer_dtype="int16"``
    halves the host->device bytes with the same symmetric-clip
    quantization as fit() (exact round-trip for int16-container waves)."""
    _check_transfer_dtype(transfer_dtype)
    _dequant = _DEQUANT_INT16 if transfer_dtype == "int16" else None
    if runtime is not None and runtime.spans_processes:
        # Multi-process: lockstep mesh eval would require identical per-rank
        # batch counts, which rank-sliced eval sets don't have (7 vs 5
        # examples). Pure-DP params are replicated, so each rank evals its
        # OWN loader shard on its local devices; _gather_across_processes
        # below merges — the reference's DDP eval shape
        # (ex_audioset.py:274-285).
        params = runtime.local_replica(params)
        runtime = None
    outs: List[np.ndarray] = []
    targets: List[np.ndarray] = []
    losses: List[np.ndarray] = []

    def _to_device(batch):
        # Runs on the DeviceFeed thread: dtype conversion + device_put of
        # batch k+1 overlaps eval_step k (eval wave batches are the largest
        # transfers in the system — B=20 x 10 s = 25.6 MB — and used to
        # serialize with eval compute; same motivation as the fit() feed).
        wave = np.asarray(batch["wave"])
        if _dequant is not None:
            # host-side quantize (feed thread); the jitted dequant is
            # dispatched from the MAIN loop below — same multi-controller
            # dispatch-order discipline as fit()'s _to_device
            wave = _quantize_wave_int16(wave)
        arrays = {
            "wave": wave,
            "target": batch["target"].astype(np.int32 if single_label else np.float32),
        }
        if runtime is not None:
            dev_batch, n = runtime.pad_eval_batch(arrays)
        else:
            dev_batch = {k: jnp.asarray(v) for k, v in arrays.items()}
            n = len(arrays["wave"])
        return dev_batch, n, np.asarray(batch["target"])

    base_it = iter(loader)
    if device_prefetch > 0:
        it = DeviceFeed(base_it, _to_device, depth=device_prefetch)
    else:
        it = iter((_to_device(b) for b in base_it))
    try:
        for i, (dev_batch, n, host_target) in enumerate(it):
            if limit_batches is not None and i >= limit_batches:
                break
            if _dequant is not None:
                dev_batch = dict(dev_batch, wave=_dequant(dev_batch["wave"]))
            res = eval_step(params, dev_batch)
            outs.append(np.asarray(res["out"])[:n])
            targets.append(host_target)
            losses.append(np.asarray(res["loss_per_example"])[:n])
    finally:
        if hasattr(it, "stop"):  # release the feed thread + wrapped
            it.stop()            # prefetcher on every path (prefetch > 0)
        elif hasattr(base_it, "stop"):
            # device_prefetch=0 hides the loader's Prefetcher behind a
            # plain generator; stop the UNDERLYING iterator or its worker
            # thread leaks on early exit (round-5 review finding)
            base_it.stop()
    # This rank may have gotten zero batches (rank-sliced tiny eval set);
    # zero-row placeholders keep it alive into the gather, which recovers
    # the real trailing shapes from the non-empty ranks.
    cat = lambda parts: np.concatenate(parts) if parts else np.zeros((0,), np.float32)
    out = cat(outs)
    target = cat(targets)
    loss = cat(losses)
    if len(out) == 0 and jax.process_count() == 1:
        # single process, nothing to recover shapes from — fail clearly
        # (the multi-host gather raises its own error when ALL ranks are
        # empty, and fills this rank from the others when some are not)
        raise ValueError("no eval batches (empty eval loader)")
    out, target, loss = _gather_across_processes(out, target, loss)
    metrics: Dict[str, float] = {
        "val_loss": float(np.mean(loss)),
        "n_eval": len(out),
    }
    if single_label:
        metrics["accuracy"] = float((out.argmax(axis=1) == target.reshape(-1)).mean())
    elif masked:
        # OpenMIC protocol: targets are [labels || observed-mask]; every
        # metric counts only observed labels per class (the reference
        # weights sklearn metrics by y_mask per class).
        from passt_tpu.train.metrics import (
            masked_mean_average_precision,
            masked_roc_auc,
        )

        k = target.shape[1] // 2
        labels, mask = (target[:, :k] > 0.5).astype(np.float64), target[:, k:]
        metrics["ap"] = masked_mean_average_precision(labels, out, mask)
        # Mirror the unmasked branch: when no class has both label signs
        # under the mask, masked_roc_auc is NaN — omit rather than write a
        # non-RFC NaN token into the epoch JSONL record.
        roc = masked_roc_auc(labels, out, mask)
        if np.isnan(roc):
            print("masked roc_auc undefined on this eval set; omitting 'roc'")
        else:
            metrics["roc"] = float(roc)
        metrics["allap"] = metrics["ap"]
    else:
        metrics["ap"] = mean_average_precision(target, out)
        # roc_auc marks single-sign classes NaN (it never raises); when
        # EVERY class is undefined (tiny smoke evals), omit the metric with
        # a log line instead of recording NaN into the epoch record
        per_class = roc_auc(target, out)
        if np.isnan(per_class).all():
            print("roc_auc undefined on this eval set (no two-class labels); omitting 'roc'")
        else:
            metrics["roc"] = float(np.nanmean(per_class))
        metrics["allap"] = metrics["ap"]  # single-controller: ap == allap
    return metrics


@dataclasses.dataclass
class FitResult:
    state: TrainState
    swa: Optional[SWAState]
    history: List[Dict[str, float]]
    interrupted: bool = False  # Ctrl-C / SIGTERM clean exit (resume from
    # the last epoch checkpoint)


def fit(
    *,
    train_step: Callable,
    eval_step: Callable,
    state: TrainState,
    train_loader,
    val_loader=None,
    val_loaders: Optional[Dict[str, Any]] = None,
    max_epochs: int,
    base_rng: jax.Array,
    swa_epoch_start: Optional[int] = None,
    swa_freq: int = 5,
    limit_train_batches: Optional[int] = None,
    limit_eval_batches: Optional[int] = None,
    eval_every: int = 1,
    log_every_steps: int = 50,
    logger: Optional[MetricsLogger] = None,
    checkpoint_dir: Optional[str] = None,
    keep_last_n: int = 1,
    monitor: Optional[str] = None,
    monitor_mode: str = "max",
    single_label: bool = False,
    masked: bool = False,
    swa_restore=None,  # (avg_params, n_averaged) from restore_checkpoint
    start_epoch: int = 0,
    device_put: Callable = jnp.asarray,
    lr_schedule: Optional[Callable] = None,
    dump_spectrograms: int = 0,
    mel_cfg=None,
    runtime=None,
    handle_sigterm: bool = True,
    profile_dir: Optional[str] = None,
    profile_start_step: int = 10,
    profile_num_steps: int = 5,
    device_prefetch: int = 2,
    transfer_dtype: str = "float32",
) -> FitResult:
    logger = logger or MetricsLogger()
    if runtime is not None and device_put is jnp.asarray:
        device_put = runtime.device_put

    # Host batch -> device batch. Runs on the DeviceFeed thread when
    # device_prefetch > 0 so the wave transfer overlaps the previous step's
    # compute (the reference's pin_memory + async CUDA H2D, made explicit).
    _check_transfer_dtype(transfer_dtype)
    _dequant = _DEQUANT_INT16 if transfer_dtype == "int16" else None

    def _to_device(batch) -> Dict[str, Any]:
        # Runs on the DeviceFeed thread when device_prefetch > 0: host-side
        # quantize + device_put only. The jitted dequant is DISPATCHED FROM
        # THE MAIN THREAD (batch-loop below): in multi-controller runs every
        # process must enqueue computations on global arrays in the same
        # order, and a feed-thread dispatch would race the main thread's
        # train_step/collective dispatches nondeterministically across ranks.
        wave = batch["wave"]
        if _dequant is not None:
            dev_wave = device_put(_quantize_wave_int16(wave))
        else:
            dev_wave = device_put(wave)
        return {
            "wave": dev_wave,
            "target": device_put(
                batch["target"].astype(np.int32 if single_label else np.float32)
            ),
        }
    # One loader -> unprefixed metrics (reference ex_audioset); several ->
    # every set's metrics carry a "{name}_" prefix, exactly like the
    # reference's FSD50K dual validation (ex_fsd50k.py:220-260 logs
    # valid_ap / eval_ap / valid_swa_ap / ...).
    if val_loaders is None:
        val_loaders = {"": val_loader} if val_loader is not None else {}
    elif val_loader is not None:
        raise ValueError("pass either val_loader or val_loaders, not both")
    multi_val = len(val_loaders) > 1
    swa_state = None
    if swa_restore is not None and swa_epoch_start is not None:
        avg_params, n_avg = swa_restore
        swa_state = swa_init(avg_params, swa_epoch_start, swa_freq).replace(
            n_averaged=n_avg
        )
    history: List[Dict[str, float]] = []

    ckpt_mgr = None
    if checkpoint_dir:
        import orbax.checkpoint as ocp

        # monitor=None: keep the most-recent N epoch checkpoints (reference
        # AudioSet ModelCheckpoint monitor="step", ex_audioset.py:315-319).
        # monitor="allap" etc.: keep the N checkpoints with the BEST value of
        # that eval metric (reference FSD50K ModelCheckpoint(monitor="allap",
        # save_top_k, mode="max"), ex_fsd50k.py:292-294) — a 50-epoch run
        # whose best epoch lands mid-schedule retains the published-protocol
        # artifact instead of losing it to keep-last-N.
        opts = dict(max_to_keep=keep_last_n)
        if monitor is not None:
            if monitor_mode not in ("max", "min"):
                raise ValueError(f"monitor_mode must be 'max' or 'min', got {monitor_mode!r}")
            opts.update(
                best_fn=lambda metrics: metrics[monitor],
                best_mode=monitor_mode,
                # an epoch without the metric (eval_every skip) must not be
                # silently immortal nor crash best_fn — it is simply not saved
                # (see the save-time gate below), so this flag is moot but set
                # defensively for checkpoints written by other tools.
                keep_checkpoints_without_metrics=False,
            )
        ckpt_mgr = ocp.CheckpointManager(
            os.path.abspath(checkpoint_dir),
            options=ocp.CheckpointManagerOptions(**opts),
        )

    interrupted = False
    # SIGTERM -> clean preemption exit (beyond reference: TPU pods are
    # routinely preempted with a grace period; the reference's DDP parent
    # just dies, ex_audioset.py:522-524). The handler only sets a flag —
    # the batch loop converts it into the same clean-exit path as Ctrl-C
    # (per-batch responsiveness ~one step; during eval/checkpoint the exit
    # lands at the next epoch boundary — orbax saves are atomic either way).
    _stop = {"sig": None}
    _prev_sigterm = None
    if handle_sigterm:
        import signal

        def _on_sigterm(signum, frame):
            # flag-only: print() can raise "reentrant call inside
            # BufferedWriter" if the signal lands mid-write (likely with the
            # per-batch TTY progress line). os.write(2, ...) is
            # async-signal-safe; the human-readable notice is printed by the
            # batch-loop flag check instead.
            _stop["sig"] = signum
            os.write(2, b"SIGTERM: finishing current phase, then exiting "
                        b"cleanly (resumable)\n")

        try:
            _prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:  # not the main thread (e.g. fit under a runner)
            _prev_sigterm = None
    # jax.profiler trace capture of a step window (beyond reference — the
    # reference has no profiler integration, SURVEY.md §5). Trace starts at
    # global step `profile_start_step` and stops `profile_num_steps` later;
    # view with tensorboard/xprof. Process 0 only.
    _prof_active = False
    _prof_done = False  # one-shot: fire at the FIRST step >= start (a
    # resumed run whose restored step already exceeds profile_start_step
    # still gets its trace window instead of silently never profiling)
    _prof_start = profile_start_step
    # In-place progress line for interactive runs (the reference's tweaked
    # tqdm bar, ba3l/plutils progress_bar.py) — TTY only, loss/rate come
    # from the last logged window so no extra per-step device sync occurs.
    import sys

    show_progress = sys.stdout.isatty() and jax.process_index() == 0
    # host-side global step mirror (avoids a per-batch device sync)
    host_step = int(state.step)

    n_proc = jax.process_count()

    def _stop_agreed(collective_point: bool) -> bool:
        """Consistent stop decision across processes.

        Single process: the local flag, checked every batch. Multi-process:
        SIGTERM can be observed by different ranks at different batch
        indices — a rank that exits mid-epoch leaves the others blocked in
        the next step's gradient all-reduce — so the flag is ALL-GATHERED at
        deterministic points only (the log cadence and the epoch boundary)
        and honored iff ANY rank saw it, at the same index on every rank
        (SCALING.md preemption semantics: signal all ranks)."""
        if n_proc == 1:
            return _stop["sig"] is not None
        if not collective_point:
            return False
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.array([1 if _stop["sig"] is not None else 0], np.int32)
        )
        if int(np.asarray(flags).sum()) > 0:
            _stop["sig"] = _stop["sig"] or -1  # propagate the agreement
            return True
        return False
    # Everything that must run no matter how the loop exits — the
    # SIGTERM-handler restore, an open profiler trace, and pending
    # async orbax saves — lives in the finally block: an exception
    # escaping the epoch loop (prefetcher error, eval/orbax failure,
    # real Ctrl-C during eval) must not leave the flag-only handler
    # installed process-wide (SIGTERMs would be swallowed forever)
    # nor leak a running trace.
    train_it = None  # visible to the finally block: a real Ctrl-C or an
    # exception escaping eval/checkpointing must not leave the DeviceFeed /
    # prefetch threads running (blocked on their bounded queues holding
    # device buffers + h5py handles) in a process that keeps living
    try:
        for epoch in range(start_epoch, max_epochs):
            t_epoch = time.time()
            t_window = t_epoch  # for the it/s rate in step logs (the
            # reference's tqdm progress bar shows the same live rate)
            n_batches = 0
            pending_loss = None
            progress_tail = ""
            try:
                train_loader.set_epoch(epoch)
                train_it = iter(train_loader)
                if device_prefetch > 0:
                    train_it = DeviceFeed(train_it, _to_device, depth=device_prefetch)
                for i, batch in enumerate(train_it):
                    if _stop_agreed(i % log_every_steps == 0):
                        if hasattr(train_it, "stop"):
                            train_it.stop()
                        raise KeyboardInterrupt  # same clean-exit path as Ctrl-C
                    if limit_train_batches is not None and i >= limit_train_batches:
                        if hasattr(train_it, "stop"):
                            train_it.stop()
                        break
                    if (
                        profile_dir
                        and not _prof_active
                        and not _prof_done
                        and host_step >= profile_start_step
                        and jax.process_index() == 0
                    ):
                        jax.profiler.start_trace(profile_dir)
                        _prof_active = True
                        _prof_start = host_step
                    # batches from a DeviceFeed arrive already on device;
                    # inline conversion is the device_prefetch=0 fallback
                    dev_batch = batch if device_prefetch > 0 else _to_device(batch)
                    if _dequant is not None:
                        # main-thread dispatch (see _to_device): async, so it
                        # still overlaps — the device queue orders it before
                        # the step either way
                        dev_batch = dict(
                            dev_batch, wave=_dequant(dev_batch["wave"])
                        )
                    # Visual sanity dump of the *augmented* training input
                    # (reference wandb spectrogram images, ex_audioset.py:161-167,
                    # gated on the global step like the reference so resume does
                    # not overwrite the true first-steps snapshots). host_step
                    # mirrors state.step without a per-batch device sync.
                    if (
                        dump_spectrograms
                        and host_step < dump_spectrograms
                        and mel_cfg is not None
                        and jax.process_index() == 0
                        # multi-process: dev_batch holds GLOBAL jax.Arrays
                        # (runtime.device_put) — a rank-0-only dispatch on
                        # them would desync dispatch order across ranks and
                        # np.asarray would span non-addressable devices
                        and not (runtime is not None and runtime.spans_processes)
                    ):
                        from passt_tpu.ops.frontend import log_mel_spectrogram

                        out_dir = checkpoint_dir or "."
                        # THE train step's own key derivation (steps.step_keys —
                        # shared function, not a re-derivation) so the dump shows
                        # the actual training augmentation even if the step's
                        # split order is ever refactored
                        from passt_tpu.train.steps import step_keys

                        k_mel = step_keys(base_rng, host_step)[0]
                        mel_img = np.asarray(
                            log_mel_spectrogram(
                                dev_batch["wave"], mel_cfg, rng=k_mel, train=True
                            )
                        )
                        os.makedirs(out_dir, exist_ok=True)
                        np.save(
                            os.path.join(out_dir, f"spectrograms_step{host_step}.npy"),
                            mel_img,
                        )
                    state, metrics = train_step(state, dev_batch, base_rng)
                    host_step += 1
                    n_batches += 1
                    pending_loss = metrics["loss"]
                    if _prof_active and host_step >= _prof_start + profile_num_steps:
                        # sync once so the traced window's device activity is
                        # fully captured before the trace closes. A scalar
                        # FETCH, not block_until_ready: on the axon tunnel
                        # block_until_ready returns in ~20 us without actually
                        # waiting for the device (verify-skill gotcha), which
                        # would close the trace before the window's work runs.
                        float(pending_loss)
                        jax.profiler.stop_trace()
                        _prof_active = False
                        _prof_done = True
                    if (i + 1) % log_every_steps == 0:
                        now = time.time()
                        row = {"epoch": epoch, "step": int(state.step), "loss": float(pending_loss)}
                        row["it_per_s"] = round(log_every_steps / max(now - t_window, 1e-9), 3)
                        t_window = now
                        for k, v in metrics.items():  # extra step metrics
                            if k != "loss":           # (e.g. grad_norm)
                                row[k] = float(v)
                        if show_progress:
                            print("\r\x1b[K", end="")  # clear the progress line
                        logger.log(row)
                        progress_tail = f"loss {row['loss']:.4f} {row['it_per_s']:.2f} it/s"
                    elif show_progress:
                        total = len(train_loader) if hasattr(train_loader, "__len__") else "?"
                        print(
                            f"\repoch {epoch} [{i + 1}/{total}] "
                            + (progress_tail if n_batches > log_every_steps else "warmup"),
                            end="",
                            flush=True,
                        )
            except KeyboardInterrupt:
                # Mid-epoch state is NOT checkpointed: epoch checkpoints are the
                # resume points (the per-epoch sampler reseed makes mid-epoch
                # resume ill-defined, and orbax silently refuses saves at an id
                # <= the latest anyway). The last completed epoch's checkpoint is
                # already on disk.
                interrupted = True
                kept = None if ckpt_mgr is None else ckpt_mgr.latest_step()
                print(
                    "interrupted: exiting cleanly "
                    + (f"(resume from epoch checkpoint {kept})" if kept is not None
                       else "(no checkpoint_dir / no completed epoch)")
                )
                break

            if show_progress:
                print("\r\x1b[K", end="")
            epoch_time = time.time() - t_epoch

            record: Dict[str, float] = {
                "epoch": epoch,
                "step": int(state.step),
                "epoch_time_s": round(epoch_time, 2),
            }
            if n_batches:
                record["it_per_s"] = round(n_batches / max(epoch_time, 1e-9), 3)
            if pending_loss is not None:
                record["train_loss"] = float(pending_loss)
            if lr_schedule is not None:
                # the reference logs lr per epoch (LearningRateMonitor,
                # ex_audioset.py:305; trainer/lr at :195)
                record["lr"] = float(lr_schedule(int(state.step)))

            # SWA (helpers/swa_callback.py semantics: the reference fires on
            # train-epoch START with swa_start = swa_epoch_start - 1; end of
            # epoch e here == start of epoch e+1 there, so cadence is exact).
            if swa_epoch_start is not None:
                # cadence probe without materializing the average: eager
                # swa_init held a redundant fp32 copy of all params
                # (~344 MB at PaSST-S) on device for the ~50 pre-SWA
                # epochs (round-5 review finding) — the first real update
                # overwrites it wholesale anyway (swa_update n==0 branch)
                cadence = SWAState(
                    avg_params=None, n_averaged=0,
                    swa_epoch_start=swa_epoch_start, swa_freq=swa_freq,
                )
                if swa_should_update(
                    swa_state if swa_state is not None else cadence,
                    epoch, max_epochs,
                ):
                    if swa_state is None:
                        swa_state = swa_init(state.params, swa_epoch_start, swa_freq)
                    swa_state = swa_update(swa_state, state.params)
                    record["swa_n"] = swa_state.n_averaged

            if val_loaders and (epoch + 1) % eval_every == 0:
                for set_name, loader in val_loaders.items():
                    pre = f"{set_name}_" if (multi_val and set_name) else ""
                    em = evaluate(
                        eval_step, state.params, loader, limit_eval_batches,
                        single_label, masked, runtime=runtime,
                        device_prefetch=device_prefetch,
                        transfer_dtype=transfer_dtype,
                    )
                    record.update({f"{pre}{k}": v for k, v in em.items()})
                    if swa_state is not None and swa_state.n_averaged > 0:
                        sm = evaluate(
                            eval_step, swa_state.avg_params, loader, limit_eval_batches,
                            single_label, masked, runtime=runtime,
                            device_prefetch=device_prefetch,
                            transfer_dtype=transfer_dtype,
                        )
                        record.update({f"{pre}swa_{k}": v for k, v in sm.items()})

            logger.log(record)
            history.append(record)

            if ckpt_mgr is not None:
                if monitor is not None and monitor not in record:
                    did_eval = bool(val_loaders) and (epoch + 1) % eval_every == 0
                    if did_eval:
                        # eval RAN and still no such key: the monitor name can
                        # never match (e.g. bare "allap" against dual-set
                        # "valid_allap"/"eval_allap" records) — raising here
                        # beats a full run that silently writes ZERO
                        # checkpoints (round-5 review finding)
                        raise ValueError(
                            f"trainer.monitor={monitor!r} not found in the "
                            f"epoch record although eval ran; available "
                            f"metric keys: {sorted(record)}"
                        )
                    # best-metric retention requires the metric: epochs that ran
                    # no eval (eval_every gaps, empty val_loaders) are not
                    # checkpointed — same cadence as the reference's
                    # ModelCheckpoint, which saves on validation end.
                    print(
                        f"checkpoint skipped at epoch {epoch}: monitored metric "
                        f"{monitor!r} not in this epoch's record (no eval ran)"
                    )
                else:
                    payload = {"params": state.params, "opt_state": state.opt_state,
                               "step": state.step}
                    if swa_state is not None:
                        payload["swa_params"] = swa_state.avg_params
                        payload["swa_n"] = jnp.int32(swa_state.n_averaged)
                    if runtime is not None and runtime.spans_processes:
                        # collective orbax saves reject host-local leaves
                        # (the swa_n scalar above); replicate them globally
                        payload = jax.tree.map(runtime.ensure_global, payload)
                    import orbax.checkpoint as ocp

                    metrics_arg = None
                    if monitor is not None:
                        metrics_arg = {monitor: float(record[monitor])}
                    ckpt_mgr.save(
                        epoch, args=ocp.args.StandardSave(payload), metrics=metrics_arg
                    )

            if _stop_agreed(True):
                # SIGTERM landed during eval/checkpoint: this epoch is complete
                # and checkpointed — exit cleanly now. (Multi-process: the
                # epoch boundary is a collective point, so the agreement
                # all-gather is safe here and keeps every rank's decision
                # identical even when SIGTERM delivery straddled the boundary.)
                interrupted = True
                print(f"preempted: exiting cleanly after completed epoch {epoch}")
                break

    finally:
        if train_it is not None and hasattr(train_it, "stop"):
            try:  # no-op on an exhausted feed (thread already gone)
                train_it.stop()
            except Exception:
                pass
        if _prof_active:  # run ended inside the profile window
            jax.profiler.stop_trace()
        if profile_dir and not _prof_done and not _prof_active and jax.process_index() == 0:
            print(
                f"trainer.profile_dir was set but the profile window never "
                f"fired (run ended before step {profile_start_step})"
            )
        if _prev_sigterm is not None:
            import signal

            signal.signal(signal.SIGTERM, _prev_sigterm)
        if ckpt_mgr is not None:
            ckpt_mgr.wait_until_finished()
    return FitResult(
        state=state, swa=swa_state, history=history, interrupted=interrupted
    )


def _resolve_monitor_metric(metrics, key):
    """Tolerant monitor lookup for best-checkpoint restore.

    Eval-set prefixes ("valid_"/"eval_") depend on how many eval sets the
    SAVING run had configured (multi-val prefixes, single-val doesn't —
    _resolve_monitor semantics). A restore-side caller can't know that, so
    accept the exact key, the stripped key, and the prefixed keys before
    failing loudly (e.g. FSD50K trains dual-val saving "valid_allap" but
    evaluate_only builds one loader and resolves the monitor to "allap").

    fit() saves exactly one metric key per checkpoint today
    ({monitor: value}); if the save side ever records several prefixed
    metrics, a stripped monitor like "allap" must not silently pick
    valid_allap over eval_allap — all prefix matches are collected and
    ambiguity raises."""
    if key in metrics:
        return metrics[key]
    hits = {}
    for p in ("valid_", "eval_"):
        if key.startswith(p) and key[len(p):] in metrics:
            hits[key[len(p):]] = metrics[key[len(p):]]
        if p + key in metrics:
            hits[p + key] = metrics[p + key]
    if len(hits) == 1:
        return next(iter(hits.values()))
    if len(hits) > 1:
        raise KeyError(
            f"monitor {key!r} is ambiguous among checkpoint metrics "
            f"{sorted(hits)}; pass the fully-prefixed monitor name"
        )
    raise KeyError(
        f"monitor {key!r} not among checkpoint metrics {sorted(metrics)}"
    )


def restore_checkpoint(
    checkpoint_dir: str,
    state: TrainState,
    step: Optional[int] = None,
    monitor: Optional[str] = None,
    monitor_mode: str = "max",
):
    """Restore the latest (or given) epoch checkpoint into a TrainState
    template. Returns (state, swa_or_None, epoch) where swa is
    (avg_params, n_averaged). Checkpoints written by fit() after SWA starts
    contain swa_params/swa_n; the template adapts (an exact-match template
    is required by orbax StandardRestore).

    With ``monitor`` set (and no explicit ``step``), restores the BEST
    checkpoint by that recorded metric instead of the latest — the partner
    of fit(monitor=...) best-retention (reference FSD50K
    ModelCheckpoint(monitor="allap"), ex_fsd50k.py:292-294)."""
    import orbax.checkpoint as ocp

    def _monitor_value(metrics, key=monitor):
        return _resolve_monitor_metric(metrics, key)

    opts = None
    if monitor is not None:
        opts = ocp.CheckpointManagerOptions(
            best_fn=_monitor_value, best_mode=monitor_mode,
            read_only=True,
        )
    mgr = ocp.CheckpointManager(os.path.abspath(checkpoint_dir), options=opts)
    if step is not None:
        epoch = step
    elif monitor is not None:
        epoch = mgr.best_step()
    else:
        epoch = mgr.latest_step()
    if epoch is None:
        raise FileNotFoundError(f"no checkpoints in {checkpoint_dir}")
    base = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
    with_swa = dict(base)
    # The SWA running average is saved in fp32 regardless of the params'
    # storage dtype (swa_init pins fp32 — a bf16 average stalls); the
    # template must be fp32 too, or orbax silently downcasts the restored
    # average to the bf16 param storage under param_dtype="bfloat16_sr".
    with_swa["swa_params"] = jax.tree.map(
        lambda x: x.astype(jnp.float32), state.params
    )
    swa_n_tmpl = jnp.int32(0)
    if jax.process_count() > 1:
        # collective restore: template leaves must be GLOBAL like the saved
        # arrays (fit() replicated swa_n across processes on save)
        leaves = [
            l for l in jax.tree.leaves(state.params)
            if isinstance(l, jax.Array) and not l.sharding.is_fully_addressable
        ]
        if leaves:
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(leaves[0].sharding.mesh, PartitionSpec())
            swa_n_tmpl = jax.make_array_from_process_local_data(
                rep, np.asarray(0, np.int32)
            )
    with_swa["swa_n"] = swa_n_tmpl
    try:
        restored = mgr.restore(epoch, args=ocp.args.StandardRestore(with_swa))
    except (ValueError, KeyError):
        try:
            restored = mgr.restore(epoch, args=ocp.args.StandardRestore(base))
        except (ValueError, KeyError) as e:
            # The most common structural mismatch: the checkpoint was written
            # under a different trainer.opt_moments_dtype (the optimizer state
            # pytree differs between fp32 optax.adamw and the fused bf16+SR
            # transform), e.g. a pre-default-flip checkpoint resumed under the
            # bfloat16_sr default.
            raise RuntimeError(
                f"checkpoint {checkpoint_dir}@{epoch} does not match the "
                "current TrainState template. If it was written with a "
                "different trainer.opt_moments_dtype (fp32 optax vs fused "
                "bf16+SR moments have different opt_state structures), set "
                "trainer.opt_moments_dtype to the value the run was started "
                "with (null for pre-bf16_sr checkpoints)."
            ) from e
    new_state = TrainState(
        params=restored["params"], opt_state=restored["opt_state"], step=restored["step"]
    )
    swa = None
    if restored.get("swa_params") is not None:
        swa = (restored["swa_params"], int(restored.get("swa_n", 0)))
    return new_state, swa, epoch
