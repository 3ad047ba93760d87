"""The experiment runner: config -> datasets -> loaders -> model -> commands.

Mirrors the reference's L5 experiment surface (reference: ex_audioset.py and
siblings): each experiment exposes the commands ``main`` (train),
``evaluate_only``, ``model_speed_test``, ``test_loaders`` and
``print_config`` (ex_audioset.py:336, 430, 365, 445; README.md:162) on top
of a typed :class:`passt_tpu.config.ExperimentConfig`.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from passt_tpu.config import ExperimentConfig, parse_cli
from passt_tpu.data.pipeline import default_collate
from passt_tpu.data import (
    ConcatDataset,
    DataLoader,
    HDF5AudioDataset,
    SequentialSampler,
    ShuffleSampler,
    WavMixDataset,
    WeightedEpochSampler,
)
from passt_tpu.models.passt import init_passt
from passt_tpu.ops.frontend import log_mel_spectrogram
from passt_tpu.train.loop import MetricsLogger, evaluate, fit
from passt_tpu.train.steps import (
    TrainState,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


def build_base_train_dataset(cfg: ExperimentConfig, path: str, seed: int):
    """The un-augmented HDF5 base for one training container — the single
    construction point shared by the numpy chain (build_train_dataset) and
    the native C++ batch plane (data.native_loader), so their kwargs cannot
    drift apart."""
    d = cfg.data
    bank = None
    if d.ir_augment and d.ir_path:
        import h5py

        from passt_tpu.data.datasets import load_ir_bank

        # IR convolution runs BEFORE the stride resample, i.e. at the
        # container's SOURCE rate — so the bank must be loaded at that rate,
        # not d.sample_rate (the reference's librosa.load(sr=32000) == its
        # containers' rate, audioset/dataset.py:100,202-216). Loading at the
        # target rate would time-stretch every IR on 16/8 kHz presets.
        with h5py.File(path, "r") as f:
            source_rate = int(f.attrs.get("sample_rate", 32000))
        bank = load_ir_bank(d.ir_path, source_rate, d.cut_irs_offset)
    return HDF5AudioDataset(
        path,
        sample_rate=d.sample_rate,
        classes_num=d.num_classes,
        clip_length=d.clip_length,
        packed_targets=d.packed_targets,
        gain_augment_db=d.gain_augment_db,
        crop=d.crop,
        seed=seed,
        impulse_responses=bank,
        ir_augment_rate=d.ir_augment if bank else 0.0,
    )


def build_train_dataset(cfg: ExperimentConfig):
    d = cfg.data
    if d.train_hdf5 is None:
        raise FileNotFoundError(
            "data.train_hdf5 is not set — point it at a packed HDF5 "
            "(see passt_tpu.data.prepare)"
        )
    sets = [build_base_train_dataset(cfg, d.train_hdf5, d.seed)]
    if d.train_hdf5_extra:
        sets.append(build_base_train_dataset(cfg, d.train_hdf5_extra, d.seed + 1))
    ds = sets[0] if len(sets) == 1 else ConcatDataset(sets)
    if d.roll:
        from passt_tpu.data.datasets import RollDataset

        ds = RollDataset(ds, d.roll_shift_range, seed=d.seed + 17)
    if d.wavmix:
        ds = WavMixDataset(ds, merge_masks=d.merge_mask_wavmix, seed=d.seed + 31)
    return ds


def build_eval_dataset(cfg: ExperimentConfig, which: str = "eval"):
    d = cfg.data
    path = d.eval_hdf5 if which == "eval" else d.valid_hdf5
    if path is None:
        raise FileNotFoundError(f"data.{which}_hdf5 is not set")
    return HDF5AudioDataset(
        path,
        sample_rate=d.sample_rate,
        classes_num=d.num_classes,
        clip_length=d.clip_length,
        packed_targets=d.packed_targets,
        crop="head",
    )


def _resolve_rank(d):
    """num_replicas=0 -> auto-wire from the JAX process topology (the
    reference reads DDP/NODE_RANK env vars, audioset/dataset.py:296-300)."""
    import jax

    if d.num_replicas == 0:
        return jax.process_count(), jax.process_index()
    return d.num_replicas, d.rank


def build_train_loader(cfg: ExperimentConfig, dataset=None, batch_scale: int = 1):
    """``batch_scale`` multiplies the per-replica ``data.batch_size`` into a
    global batch when training on a mesh (reference batch_size is per-GPU
    under DDP, ex_audioset.py:42 + :499-524; here one loader feeds all
    devices of this process)."""
    d = cfg.data
    ds = dataset if dataset is not None else build_train_dataset(cfg)
    if d.weighted_sampler:
        import h5py

        from passt_tpu.data.sampler import class_balanced_sample_weights_streamed

        # streamed in row chunks: unpacking AudioSet-2M's full multi-hot
        # matrix (2M x 527) peaked at ~20 GB host RAM to derive 2M scalars
        def target_chunks(chunk_rows: int = 131072):
            for path in filter(None, [d.train_hdf5, d.train_hdf5_extra]):
                with h5py.File(path, "r") as f:
                    col = f["target"]
                    for lo in range(0, len(col), chunk_rows):
                        t = col[lo : lo + chunk_rows]
                        if d.packed_targets:
                            t = np.unpackbits(t, axis=-1, count=d.num_classes)
                        yield t

        weights = class_balanced_sample_weights_streamed(
            target_chunks, d.num_classes
        )
        num_replicas, rank = _resolve_rank(d)
        sampler = WeightedEpochSampler(
            weights,
            epoch_len=d.epoch_len,
            replacement=d.sampler_replace,
            num_replicas=num_replicas,
            rank=rank,
            seed=d.seed,
        )
    else:
        num_replicas, rank = _resolve_rank(d)
        sampler = ShuffleSampler(len(ds), num_replicas, rank, seed=d.seed)
    builder = None
    if dataset is None:
        from passt_tpu.data.native_loader import maybe_native_builder

        builder = maybe_native_builder(cfg)
    return DataLoader(
        ds,
        d.batch_size * batch_scale,
        sampler,
        drop_last=True,
        prefetch=d.prefetch,
        num_workers=d.num_workers,
        batch_builder=builder,
    )


def build_eval_loader(
    cfg: ExperimentConfig,
    which: Optional[str] = None,
    batch_size=None,
    sharded: bool = True,
):
    """``sharded=False`` forces the full (unsharded) eval set: commands with
    no cross-process gather (evaluate_ensemble, predict) must not consume a
    1/P rank slice under multi-process JAX — only ``evaluate`` reassembles
    shards via ``_gather_across_processes``."""
    which = which or cfg.data.eval_set
    d = cfg.data
    ds = build_eval_dataset(cfg, which)
    bs = batch_size or d.eval_batch_size
    num_replicas, rank = _resolve_rank(d) if sharded else (1, 0)
    if d.clip_length is None and not d.eval_pad_multiple_s and bs > 1:
        # EXACT variable-length eval, batched: group clips by exact length
        # so no clip is ever padded (bitwise the reference's batch_size=1
        # protocol) and each distinct length compiles once instead of the
        # per-clip recompiles the naive exact protocol pays.
        try:
            lengths = ds.item_lengths()
        except ValueError as e:
            print(f"[eval] exact eval falls back to batch_size=1 ({e})")
            bs = 1
        else:
            from passt_tpu.data.sampler import LengthGroupedBatchSampler

            bsampler = LengthGroupedBatchSampler(lengths, bs, num_replicas, rank)
            print(
                f"[eval] length-grouped exact eval: {len(lengths)} clips, "
                f"{bsampler.num_distinct_lengths} distinct lengths, "
                f"{len(bsampler)} batches"
            )
            return DataLoader(
                ds,
                batch_sampler=bsampler,
                collate=default_collate,
                prefetch=d.prefetch,
                num_workers=d.num_workers,
            )
    collate = default_collate
    if d.eval_pad_multiple_s:
        import functools

        collate = functools.partial(
            default_collate,
            pad_to_multiple=int(d.eval_pad_multiple_s * d.sample_rate),
        )
    return DataLoader(
        ds,
        bs,
        SequentialSampler(len(ds), num_replicas, rank),
        collate=collate,
        prefetch=d.prefetch,
        num_workers=d.num_workers,
    )


@dataclasses.dataclass
class Experiment:
    """A named recipe: default config + command dispatch."""

    name: str
    default_config: ExperimentConfig
    single_label: bool = False
    # model_speed_test default batch — the reference uses B=12 for AudioSet
    # (ex_audioset.py:365) but B=100 for the fine-tune recipes
    # (ex_esc50.py:281, ex_fsd50k.py); recipes override this field.
    speed_test_batch_size: int = 12
    # train-set length cache keyed by hdf5 paths (steps_per_epoch feeds the
    # LR schedule; re-opening the files per call was a review finding)
    _len_cache: Dict = dataclasses.field(default_factory=dict, repr=False)

    # ------------------------------------------------------------------
    def _steps_per_epoch(self, cfg: ExperimentConfig, train_loader=None) -> int:
        """Steps per epoch for the epoch-indexed LR schedule. Must reflect
        the REAL loader length: deriving it from data.epoch_len when the
        recipe uses a shuffle sampler (esc50/fsd50k/openmic) freezes the
        schedule at epoch 0 forever (review finding)."""
        if cfg.trainer.limit_train_batches:
            return max(1, cfg.trainer.limit_train_batches)
        if train_loader is not None:
            return max(1, len(train_loader))
        if cfg.data.weighted_sampler:
            n = cfg.data.epoch_len
        else:
            # shuffle sampler: dataset length (readable without decoding).
            # Cached per (hdf5 paths): a wrong value here silently distorts
            # the LR schedule, so the fallback is logged loudly too.
            key = (cfg.data.train_hdf5, cfg.data.train_hdf5_extra)
            n = self._len_cache.get(key)
            if n is None:
                try:
                    import h5py

                    n = 0
                    for path in filter(
                        None, [cfg.data.train_hdf5, cfg.data.train_hdf5_extra]
                    ):
                        with h5py.File(path, "r") as f:
                            n += len(f["audio_name"])
                except Exception as e:
                    n = cfg.data.epoch_len
                    print(
                        f"WARNING: could not read train HDF5 length ({e!r}); "
                        f"steps_per_epoch falls back to epoch_len={n} — the "
                        "LR schedule may be off"
                    )
                if n == 0 and not (cfg.data.train_hdf5 or cfg.data.train_hdf5_extra):
                    # no train paths configured at all (eval-only build):
                    # a cached 0 would silently pin steps_per_epoch to 1
                    # for the process lifetime (round-5 review finding)
                    n = cfg.data.epoch_len
                    print(
                        "WARNING: no train HDF5 configured; steps_per_epoch "
                        f"falls back to epoch_len={n}"
                    )
                self._len_cache[key] = n
        # the same auto-wiring rule _resolve_rank applies (one source)
        num_replicas = _resolve_rank(cfg.data)[0]
        steps = max(1, n // max(1, num_replicas) // cfg.data.batch_size)
        return steps

    def build(
        self,
        cfg: ExperimentConfig,
        rng: Optional[jax.Array] = None,
        steps_per_epoch: Optional[int] = None,
        runtime=None,
        make_steps: bool = True,
    ):
        """(model, state, train_step, eval_step, tx) from a config.
        ``make_steps=False`` skips step construction (harnesses that build
        their own raw step, e.g. model_speed_test, get (model, state, None,
        None, tx) without a discarded jitted step).

        When ``runtime`` (a MeshRuntime from ``trainer.n_data``/``n_model``)
        is given, the state is sharded over the mesh and the train step is
        the GSPMD-parallel one — the TPU-native equivalent of the
        reference's one-env-var DDP activation (ex_audioset.py:499-524)."""
        pcfg = cfg.passt_config()
        if steps_per_epoch is None:
            steps_per_epoch = self._steps_per_epoch(cfg)
        tx = make_optimizer(
            lr=cfg.trainer.lr,
            weight_decay=cfg.trainer.weight_decay,
            steps_per_epoch=steps_per_epoch,
            schedule_mode=cfg.trainer.schedule_mode,
            warm_up_len=cfg.trainer.warm_up_len,
            ramp_down_start=cfg.trainer.ramp_down_start,
            ramp_down_len=cfg.trainer.ramp_down_len,
            last_lr_value=cfg.trainer.last_lr_value,
            moments_dtype=cfg.trainer.opt_moments_dtype,
            grad_accum=cfg.trainer.grad_accum,
        )
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.trainer.seed)
        model, params = init_passt(pcfg, rng)
        if cfg.model.pretrained:
            from passt_tpu.models.pretrained import load_pretrained_params

            if cfg.model.checkpoint_path is None:
                raise FileNotFoundError(
                    "model.pretrained=true requires model.checkpoint_path "
                    "(no network in this environment)"
                )
            params = load_pretrained_params(cfg.model.checkpoint_path, pcfg, params)
            print(f"loaded pretrained checkpoint: {cfg.model.checkpoint_path}")
        param_dtype = cfg.resolved_param_dtype()
        param_sr = param_dtype == "bfloat16_sr"
        # The optimizer is initialized on the PRE-cast fp32 params: optax
        # moments inherit the init template's dtype, so initializing on
        # bf16-cast params would silently give bf16 nearest-rounded moments
        # even under trainer.opt_moments_dtype=null (the documented strict
        # fp32-moment parity setting). The fused bf16+SR transform pins its
        # own moment dtypes and is unaffected either way.
        opt_state = tx.init(params)
        if param_sr:
            from passt_tpu.train.optim import cast_params_storage

            params = cast_params_storage(params, param_dtype)
        state = TrainState(params=params, opt_state=opt_state, step=jnp.int32(0))
        if not make_steps:
            if runtime is not None:
                state = runtime.shard_state(state)
            return model, state, None, None, tx
        train_step = make_train_step(
            model,
            tx,
            cfg.mel,
            loss_type=cfg.trainer.loss_type,
            use_mixup=cfg.trainer.use_mixup,
            mixup_alpha=cfg.trainer.mixup_alpha,
            jit=runtime is None,
            log_grad_norm=cfg.trainer.log_grad_norm,
            log_grad_norm_per_block=cfg.trainer.log_grad_norm_per_block,
            param_sr=param_sr,
        )
        if runtime is not None:
            state = runtime.shard_state(state)
            train_step = runtime.wrap_train_step(train_step)
        eval_step = make_eval_step(model, cfg.mel, loss_type=cfg.trainer.loss_type)
        return model, state, train_step, eval_step, tx

    # ------------------------------------------------------------------
    # commands
    # ------------------------------------------------------------------
    def _schedule(self, cfg: ExperimentConfig, steps_per_epoch: Optional[int] = None):
        from passt_tpu.train.steps import make_schedule

        if steps_per_epoch is None:
            steps_per_epoch = self._steps_per_epoch(cfg)
        return make_schedule(
            cfg.trainer.lr,
            steps_per_epoch,
            cfg.trainer.schedule_mode,
            cfg.trainer.warm_up_len,
            cfg.trainer.ramp_down_start,
            cfg.trainer.ramp_down_len,
            cfg.trainer.last_lr_value,
        )

    @staticmethod
    def _resolve_monitor(monitor, val_loaders) -> "Optional[str]":
        """Normalize trainer.monitor against the actual eval-set naming:
        with ONE eval set the epoch record's keys are unprefixed ("allap"),
        with several they carry the set prefix ("valid_allap"/"eval_allap")
        — mirroring the reference's set_name+"allap" logging
        (ex_fsd50k.py:222,254). A prefixed monitor against a single set (the
        FSD50K recipe default run with only eval_hdf5 configured) resolves
        to the unprefixed key instead of silently never matching."""
        if monitor and len(val_loaders) <= 1:
            for p in ("valid_", "eval_"):
                if monitor.startswith(p):
                    return monitor[len(p):]
        return monitor

    def main(self, cfg: ExperimentConfig) -> Dict:
        """Train (the reference ``main`` command, ex_audioset.py:336-361).
        ``trainer.n_data=N`` trains on an N-device mesh (the reference's
        ``DDP=N``); ``trainer.n_model=M`` adds tensor parallelism."""
        from passt_tpu.parallel.runtime import maybe_mesh_runtime

        runtime = maybe_mesh_runtime(cfg.trainer)
        if runtime is not None:
            print(
                f"mesh: data={runtime.n_data} model={runtime.n_model} "
                f"(global batch {cfg.data.batch_size * runtime.n_data})"
            )
        train_loader = build_train_loader(
            cfg, batch_scale=runtime.local_batch_scale if runtime else 1
        )
        steps_per_epoch = self._steps_per_epoch(cfg, train_loader)
        model, state, train_step, eval_step, _ = self.build(
            cfg, steps_per_epoch=steps_per_epoch, runtime=runtime
        )
        from passt_tpu.utils import count_non_zero_params

        desc, total, non_zero = count_non_zero_params(state.params)
        print(f"model: {desc}")  # (reference logs these, ex_audioset.py:121-123)
        # Every configured eval set is validated every epoch: FSD50K trains
        # against BOTH [valid, eval] (reference ex_fsd50k.py:318-322); the
        # other recipes configure only eval_hdf5 and keep a single set.
        val_loaders = {}
        for which in ("valid", "eval"):
            try:
                val_loaders[which] = build_eval_loader(cfg, which=which)
            except FileNotFoundError:
                pass
        # JSONL only on rank 0: multi-host runs share checkpoint_dir (orbax
        # saves are collective) and every rank logs identical records — P
        # concurrent appenders would interleave/duplicate lines (round-5
        # review finding). stdout stays per-rank (rank-prefixed debugging).
        logger = MetricsLogger(
            path=cfg.trainer.checkpoint_dir + f"/{self.name}_metrics.jsonl"
            if cfg.trainer.checkpoint_dir and jax.process_index() == 0
            else None
        )
        start_epoch = 0
        swa_restore = None
        if cfg.trainer.resume and cfg.trainer.checkpoint_dir:
            from passt_tpu.train.loop import restore_checkpoint

            try:
                state, swa_restore, last_epoch = restore_checkpoint(
                    cfg.trainer.checkpoint_dir, state
                )
                start_epoch = last_epoch + 1
                print(f"resumed from epoch {last_epoch} (step {int(state.step)})")
            except FileNotFoundError:
                print("resume requested but no checkpoint found; starting fresh")
        result = fit(
            train_step=train_step,
            eval_step=eval_step,
            state=state,
            train_loader=train_loader,
            val_loaders=val_loaders,
            max_epochs=cfg.trainer.max_epochs,
            base_rng=jax.random.PRNGKey(cfg.trainer.seed + 1),
            swa_epoch_start=cfg.trainer.swa_epoch_start if cfg.trainer.swa else None,
            swa_freq=cfg.trainer.swa_freq,
            limit_train_batches=cfg.trainer.limit_train_batches,
            limit_eval_batches=cfg.trainer.limit_eval_batches,
            eval_every=cfg.trainer.eval_every,
            log_every_steps=cfg.trainer.log_every_steps,
            logger=logger,
            checkpoint_dir=cfg.trainer.checkpoint_dir,
            keep_last_n=cfg.trainer.keep_last_n,
            monitor=self._resolve_monitor(cfg.trainer.monitor, val_loaders),
            monitor_mode=cfg.trainer.monitor_mode,
            handle_sigterm=cfg.trainer.handle_sigterm,
            profile_dir=cfg.trainer.profile_dir,
            profile_start_step=cfg.trainer.profile_start_step,
            profile_num_steps=cfg.trainer.profile_num_steps,
            device_prefetch=cfg.trainer.device_prefetch,
            transfer_dtype=cfg.trainer.transfer_dtype,
            single_label=self.single_label,
            masked=cfg.trainer.loss_type == "masked",
            swa_restore=swa_restore,
            lr_schedule=self._schedule(cfg, steps_per_epoch),
            start_epoch=start_epoch,
            dump_spectrograms=cfg.trainer.dump_spectrograms,
            mel_cfg=cfg.mel,
            runtime=runtime,
        )
        return {
            "done": True,
            "interrupted": result.interrupted,
            "history": result.history,
        }

    def evaluate_only(self, cfg: ExperimentConfig) -> Dict:
        """Evaluate a (pretrained) model (ex_audioset.py:430-441) — the
        de-facto mAP-parity regression harness. Honors trainer.n_data /
        n_model (eval batches sharded over the mesh).

        With ``trainer.checkpoint_dir`` set and populated, restores the
        TRAINED checkpoint first — best-by-``trainer.monitor`` when set,
        else latest — so the command closes the train→evaluate loop the
        reference closes by pointing evaluate_only at a trained .ckpt.
        When the restored checkpoint carries SWA weights, the averaged
        model is evaluated too (``swa_``-prefixed metrics — the model the
        ESC-50/FSD50K protocols actually report)."""
        from passt_tpu.parallel.runtime import maybe_mesh_runtime

        runtime = maybe_mesh_runtime(cfg.trainer)
        model, state, _, eval_step, _ = self.build(cfg, runtime=runtime)
        val_loader = build_eval_loader(cfg)
        swa_params = None
        if cfg.trainer.checkpoint_dir:
            from passt_tpu.train.loop import restore_checkpoint

            monitor = self._resolve_monitor(
                cfg.trainer.monitor, {"eval": val_loader}
            )
            try:
                state, swa_restore, epoch = restore_checkpoint(
                    cfg.trainer.checkpoint_dir,
                    state,
                    monitor=monitor,
                    monitor_mode=cfg.trainer.monitor_mode,
                )
                which = (
                    f"best by {monitor!r}" if monitor is not None else "latest"
                )
                print(
                    f"evaluate_only: restored {which} checkpoint "
                    f"(epoch {epoch}) from {cfg.trainer.checkpoint_dir}"
                )
                if swa_restore is not None and swa_restore[1] > 0:
                    swa_params = swa_restore[0]
            except FileNotFoundError:
                print(
                    f"evaluate_only: no checkpoint in "
                    f"{cfg.trainer.checkpoint_dir}; evaluating the built model"
                )
        metrics = evaluate(
            eval_step,
            state.params,
            val_loader,
            cfg.trainer.limit_eval_batches,
            self.single_label,
            cfg.trainer.loss_type == "masked",
            runtime=runtime,
            device_prefetch=cfg.trainer.device_prefetch,
            transfer_dtype=cfg.trainer.transfer_dtype,
        )
        if swa_params is not None:
            sm = evaluate(
                eval_step,
                swa_params,
                val_loader,
                cfg.trainer.limit_eval_batches,
                self.single_label,
                cfg.trainer.loss_type == "masked",
                runtime=runtime,
                device_prefetch=cfg.trainer.device_prefetch,
                transfer_dtype=cfg.trainer.transfer_dtype,
            )
            metrics.update({f"swa_{k}": v for k, v in sm.items()})
        print({"validation": metrics})
        return metrics

    def evaluate_ensemble(self, cfg: ExperimentConfig) -> Dict:
        """Evaluate a logit-averaged checkpoint ensemble (reference
        ensemble named configs, config_updates.py:136-222; EnsembelerModel
        passt.py:1021-1036). Requires ``model.ensemble=<name>`` and
        ``model.ensemble_checkpoint_dir`` with ``<arch>.npz`` files."""
        import os

        from passt_tpu.models.registry import ENSEMBLES, ensemble_apply, get_ensemble_model
        from passt_tpu.ops.frontend import log_mel_spectrogram
        from passt_tpu.train.metrics import mean_average_precision

        if cfg.model.ensemble not in ENSEMBLES:
            raise SystemExit(
                f"model.ensemble must be one of {list(ENSEMBLES)}"
            )
        arch_list, published_map = ENSEMBLES[cfg.model.ensemble]
        if not cfg.model.ensemble_checkpoint_dir:
            # evaluating randomly initialized members would run a full eval
            # pass and print ap~0.002 next to the published mAP — fail fast
            raise SystemExit(
                "model.ensemble_checkpoint_dir is required for "
                "evaluate_ensemble (a directory of ported <arch>.npz "
                "checkpoints; see scripts/port_checkpoint.py)"
            )
        paths = [
            os.path.join(cfg.model.ensemble_checkpoint_dir, f"{arch}.npz")
            for arch, _, _ in arch_list
        ]
        pairs = get_ensemble_model(
            arch_list,
            checkpoint_paths=paths,
            n_classes=cfg.model.n_classes,
            input_fdim=cfg.model.input_fdim,
            input_tdim=cfg.model.input_tdim,
            dtype=cfg.model.dtype,
        )
        mel_cfg = cfg.mel
        tdim = cfg.model.input_tdim
        members = [m for m, _ in pairs]
        params_list = [p for _, p in pairs]

        # params ride as jit ARGUMENTS: arrays captured as graph constants
        # run ~29x slower on this platform (see model_speed_test note)
        @jax.jit
        def ens_step(params_list, wave):
            mel = log_mel_spectrogram(wave, mel_cfg, train=False)
            out, _ = ensemble_apply(
                list(zip(members, params_list)), mel[:, None, :, :tdim]
            )
            return jax.nn.sigmoid(out)

        loader = build_eval_loader(cfg, sharded=False)  # no gather here
        outs, targets = [], []
        it = iter(loader)
        for i, batch in enumerate(it):
            if cfg.trainer.limit_eval_batches is not None and i >= cfg.trainer.limit_eval_batches:
                if hasattr(it, "stop"):
                    it.stop()  # release the prefetch thread + queued batches
                break
            outs.append(np.asarray(ens_step(params_list, jnp.asarray(batch["wave"]))))
            targets.append(batch["target"])
        ap = mean_average_precision(np.concatenate(targets), np.concatenate(outs))
        print(
            {"ensemble": cfg.model.ensemble, "ap": ap, "published_map": published_map}
        )
        return {"ap": ap, "published_map": published_map}

    def model_speed_test(
        self, cfg: ExperimentConfig, speed_test_batch_size: Optional[int] = None,
        test_length: int = 100,
    ) -> Dict:
        """Training-throughput harness (ex_audioset.py:365-426): timed
        fwd+loss+bwd+opt iterations on synthetic data, printed as
        specs/second. Iterates inside one compiled loop (axon-tunnel-safe).
        With trainer.n_data/n_model set, runs on the mesh and reports
        aggregate specs/s (batch = speed_test_batch_size x n_data).
        Default batch is per-recipe (self.speed_test_batch_size): 12 for
        AudioSet/OpenMIC, 100 for the ESC-50/FSD50K fine-tune recipes —
        matching the reference's harness defaults (ex_esc50.py:281)."""
        if speed_test_batch_size is None:
            speed_test_batch_size = self.speed_test_batch_size
        from passt_tpu.parallel.runtime import maybe_mesh_runtime

        runtime = maybe_mesh_runtime(cfg.trainer)
        model, state, _, _, tx = self.build(cfg, runtime=runtime, make_steps=False)
        raw_step = make_train_step(
            model, tx, cfg.mel, loss_type=cfg.trainer.loss_type,
            use_mixup=cfg.trainer.use_mixup, mixup_alpha=cfg.trainer.mixup_alpha,
            jit=False, param_sr=cfg.resolved_param_dtype() == "bfloat16_sr",
        )
        if runtime is not None:
            # measure the SAME graph production training runs: the wrapper
            # pins batch + output param/opt shardings (mesh.py) — without
            # it the fused AdamW moments come back replicated, regathering
            # the TP shards every step
            raw_step = runtime.wrap_train_step(raw_step, jit=False)
        b = speed_test_batch_size * (runtime.local_batch_scale if runtime else 1)
        x = jnp.ones((b, 1, cfg.model.input_fdim, cfg.model.input_tdim), jnp.float32)
        n_out = cfg.model.n_classes * (2 if cfg.trainer.loss_type == "masked" else 1)
        if self.single_label:
            y = jnp.zeros((b,), jnp.int32)
        else:
            y = jnp.ones((b, n_out), jnp.float32)
        if runtime is not None:
            x, y = runtime.device_put(x), runtime.device_put(y)
        rng = jax.random.PRNGKey(0)

        # x/y MUST be jit arguments: arrays captured as graph constants run
        # ~29x slower on this platform (see .claude/skills/verify/SKILL.md).
        def run_n(state, x, y, n):
            def body(_, carry):
                st, acc = carry
                st, m = raw_step(st, {"mel": x, "target": y}, rng)
                return st, acc + m["loss"]

            return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))

        fn = jax.jit(run_n, static_argnums=(3,), donate_argnums=(0,))
        # Warm up with the SAME static length: a different n is a different
        # compiled graph, and the compile would dominate the timing.
        state, loss = fn(state, x, y, test_length)
        float(loss)
        t0 = time.perf_counter()
        state, loss = fn(state, x, y, test_length)
        float(loss)
        dt = time.perf_counter() - t0
        speed = test_length * b / dt
        print("average speed: ", speed, " specs/second")
        return {"specs_per_second": speed}

    def test_loaders_train_speed(self, cfg: ExperimentConfig) -> Dict:
        """Loader-only throughput: two timed full passes over the training
        loader, no TPU step (reference test_loaders_train_speed,
        config_updates.py:233-251 — pass 1 is cold cache, pass 2 warm).
        Prints clips/second so the host plane can be compared directly
        against the TPU consumption rate from model_speed_test."""
        loader = build_train_loader(cfg)
        native = loader.batch_builder is not None
        out: Dict[str, float] = {"native": native, "num_workers": loader.num_workers}
        for pass_i in (1, 2):
            loader.set_epoch(pass_i)
            n_clips = 0
            limit = cfg.trainer.limit_train_batches
            t0 = time.perf_counter()
            it = iter(loader)
            for i, batch in enumerate(it):
                if limit is not None and i >= limit:
                    if hasattr(it, "stop"):
                        it.stop()
                    break
                n_clips += len(batch["wave"])
            dt = time.perf_counter() - t0
            rate = n_clips / dt if dt > 0 else float("inf")
            print(
                f"pass {pass_i}: {n_clips} clips in {dt:.2f}s = {rate:.1f} clips/s "
                f"(native={native}, workers={loader.num_workers})"
            )
            out[f"pass{pass_i}_clips_per_s"] = rate
        return out

    def test_loaders(self, cfg: ExperimentConfig) -> Dict:
        """Pull one batch from each loader (ex_audioset.py:444-456)."""
        out = {}
        for name, builder in [
            ("training", lambda: build_train_loader(cfg)),
            ("test", lambda: build_eval_loader(cfg)),
        ]:
            try:
                loader = builder()
                it = iter(loader)
                batch = next(it)
                if hasattr(it, "stop"):
                    it.stop()  # single-batch peek must not leak the worker
                print(name, batch["wave"].shape, batch["target"].shape, batch["name"][:3])
                out[name] = tuple(batch["wave"].shape)
            except FileNotFoundError as e:
                print(name, "skipped:", e)
        return out

    def print_config(self, cfg: ExperimentConfig) -> Dict:
        print(cfg.pretty())
        return {}

    def predict(self, cfg: ExperimentConfig, out_path: Optional[str] = None) -> Dict:
        """Run inference over the eval set and dump (names, logits/probs)
        (the reference ``M.predict`` hook, ex_audioset.py:208-214, made a
        first-class command). Writes ``<checkpoint_dir or .>/predictions.npz``
        with arrays ``names``, ``out``, ``target``."""
        import os

        model, state, _, eval_step, _ = self.build(cfg)
        loader = build_eval_loader(cfg, sharded=False)  # no gather here
        names, outs, targets = [], [], []
        it = iter(loader)
        for i, batch in enumerate(it):
            if cfg.trainer.limit_eval_batches is not None and i >= cfg.trainer.limit_eval_batches:
                if hasattr(it, "stop"):
                    it.stop()  # release the prefetch thread + queued batches
                break
            res = eval_step(
                state.params,
                {
                    "wave": jnp.asarray(batch["wave"]),
                    "target": jnp.asarray(
                        batch["target"].astype(
                            np.int32 if self.single_label else np.float32
                        )
                    ),
                },
            )
            names.extend(batch["name"])
            outs.append(np.asarray(res["out"]))
            targets.append(batch["target"])
        out = np.concatenate(outs)
        target = np.concatenate(targets)
        path = out_path or os.path.join(
            cfg.trainer.checkpoint_dir or ".", "predictions.npz"
        )
        np.savez(path, names=np.asarray(names), out=out, target=target)
        print(f"wrote {len(names)} predictions to {path}")
        return {"n": len(names), "path": path}

    def print_named_configs(self, cfg: ExperimentConfig) -> Dict:
        """List available presets (reference print_named_configs,
        README.md:253-256)."""
        from passt_tpu.config import PRESETS

        for name, overrides in PRESETS.items():
            print(f"{name}: {overrides}")
        return {"presets": list(PRESETS)}

    def preload(self, cfg: ExperimentConfig) -> Dict:
        """Sequentially read every training item — NFS cache warm +
        container integrity check (reference preload_mp3,
        ex_audioset.py:465-472, audioset/dataset.py:246-254)."""
        import h5py

        total = 0
        for path in filter(None, [cfg.data.train_hdf5, cfg.data.train_hdf5_extra]):
            with h5py.File(path, "r") as f:
                col = next(c for c in ("waveform", "raw_f32", "raw_i16", "wav", "mp3") if c in f)
                n = len(f[col])
                for i in range(n):
                    _ = f[col][i]
                total += n
                print(f"preloaded {n} items from {path}")
        return {"preloaded": total}

    COMMANDS = (
        "main",
        "evaluate_only",
        "evaluate_ensemble",
        "predict",
        "model_speed_test",
        "test_loaders",
        "test_loaders_train_speed",
        "print_config",
        "print_named_configs",
        "preload",
    )


def enable_compilation_cache(cache_dir: Optional[str]) -> None:
    """Point JAX's persistent compilation cache at ``cache_dir`` (no-op when
    None). Safe to call repeatedly; min-compile-time is zeroed so even the
    small eval/mel executables are cached across process starts."""
    if not cache_dir:
        return
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def run_command(experiment: Experiment, argv) -> Dict:
    command, cfg = parse_cli(list(argv), experiment.default_config)
    if command not in experiment.COMMANDS:
        raise SystemExit(
            f"unknown command {command!r}; available: {experiment.COMMANDS}"
        )
    enable_compilation_cache(cfg.trainer.compilation_cache_dir)
    return getattr(experiment, command)(cfg)
