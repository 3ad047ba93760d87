"""Typed experiment configuration with dotted CLI overrides and named presets.

Replaces the reference's sacred/ba3l dependency-injection stack
(reference: ba3l/experiment.py, ba3l/ingredients/*, config_updates.py) with
plain dataclasses: the *override surface* is kept — ``model.*``, ``mel.*``,
``data.*``, ``trainer.*`` dotted keys and named presets applied by name,
like sacred's ``with arg=value named_config`` CLI (README.md:160-258) — but
resolution is eager, typed and printable, with none of the command-magic.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Callable, Dict, List, Optional, Tuple

from passt_tpu.models.passt import PaSSTConfig
from passt_tpu.ops.frontend import MelConfig


@dataclasses.dataclass(frozen=True)
class ModelSelect:
    """get_model arguments (reference models/passt.py:957-961)."""

    arch: str = "passt_s_swa_p16_128_ap476"
    pretrained: bool = False
    checkpoint_path: Optional[str] = None
    n_classes: int = 527
    in_channels: int = 1
    fstride: int = 10
    tstride: int = 10
    input_fdim: int = 128
    input_tdim: int = 998
    u_patchout: int = 0
    s_patchout_t: int = 40  # AudioSet recipe default (ex_audioset.py:62)
    s_patchout_f: int = 4
    dtype: str = "bfloat16"
    gelu: str = "auto"  # "erf" (reference torch nn.GELU) | "tanh" | "auto"
    # (erf under fp32, tanh under bf16 — within bf16 rounding noise and
    # 22% faster fwd+bwd; see PaSSTConfig.gelu)
    plus1_attn: bool = False  # "+1 trick" quiet attention (reference
    # PLUS1_TRICK, passt.py:295 — a module global hardcoded False there)
    attn_impl: str = "auto"  # attention kernel: "fused" (Pallas) | "xla" |
    # "auto" (fused on TPU; see PaSSTConfig.attn_impl)
    ln_impl: str = "auto"  # block LayerNorms: "xla" | "fused" (Pallas
    # one-pass backward — measured SLOWER in-graph, explicit opt-in
    # only) | "auto" (= xla; see PaSSTConfig.ln_impl)
    patch_embed_impl: str = "unfold"  # "unfold" (frame-decomposed: free
    # stride-granular reshape + per-tap-block dot_generals on the MXU)
    # | "conv" (XLA conv; ~3% MXU efficiency for the overlapping
    # stride-10 16x16 kernel — see PaSSTConfig.patch_embed_impl)
    fuse_ln_qkv: bool = False  # absorb norm1 into the attention custom
    # boundary (one Pallas pass for LN+qkv GEMM fwd / dqkv@W^T+LN bwd;
    # geometry-gated, checkpoint-identical — see PaSSTConfig.fuse_ln_qkv)
    blocks_impl: str = "loop"  # transformer depth: "loop" (unrolled,
    # per-block params — the checkpoint/at-rest layout and the measured
    # fastest to execute) | "scan" (one scanned Block over stacked
    # [depth, ...] params — ~3x faster compiles, slower execution) |
    # "stacked" (unrolled over stacked params with the hand-written
    # deferred-batched-dW backward — a measured perf dead end kept with
    # its ledger; see PaSSTConfig.blocks_impl). Checkpoints interconvert
    # automatically between layouts.
    # ensemble evaluation (reference ensemble named configs,
    # config_updates.py:136-222): name into registry.ENSEMBLES plus a
    # directory of ported checkpoints named <arch>.npz
    ensemble: Optional[str] = None
    ensemble_checkpoint_dir: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class DataConfig:
    train_hdf5: Optional[str] = None
    train_hdf5_extra: Optional[str] = None  # AudioSet unbalanced split
    valid_hdf5: Optional[str] = None
    eval_hdf5: Optional[str] = None
    num_classes: int = 527
    clip_length: Optional[float] = 10.0
    sample_rate: int = 32000
    batch_size: int = 12  # reference train loader (ex_audioset.py:42)
    eval_batch_size: int = 20  # reference validate loader (ex_audioset.py:47)
    wavmix: bool = True  # ex_audioset.py:71
    roll: bool = True
    roll_shift_range: int = 50
    gain_augment_db: int = 7
    weighted_sampler: bool = True  # AudioSet class-balanced sampler
    epoch_len: int = 100000
    sampler_replace: bool = False
    packed_targets: bool = True
    merge_mask_wavmix: bool = False  # OpenMIC
    crop: str = "head"  # "random" for FSD50K training
    eval_set: str = "eval"  # "valid" for FSD50K's second eval loader
    eval_pad_multiple_s: float = 0.0  # variable-length eval: pad batches to
    # a multiple of this many seconds (bounds jit recompiles)
    num_replicas: int = 1
    rank: int = 0
    seed: int = 42
    prefetch: int = 2
    num_workers: int = 8  # parallel per-item read threads (the reference
    # runs 16 decode worker processes per GPU, ex_audioset.py:42-48)
    native_loader: bool = True  # fused C++ batch assembly when
    # libhostplane.so is built and the container/augmentation chain is
    # eligible (int16 PCM, fixed clip length); falls back to numpy
    ir_augment: float = 0.0  # impulse-response convolution probability
    # (reference pydub_augment ir branch, audioset/dataset.py:104-107;
    # default off in every recipe)
    ir_path: Optional[str] = None  # .wav IR bank directory (rglob, sorted;
    # audioset/dataset.py:84-100)
    cut_irs_offset: Optional[int] = None  # keep the reference's 10-IR
    # window starting at this offset


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    max_epochs: int = 130  # ex_audioset.py:74
    lr: float = 0.00002
    weight_decay: float = 0.0001
    schedule_mode: str = "exp_lin"
    warm_up_len: int = 5
    ramp_down_start: int = 50
    ramp_down_len: int = 50
    last_lr_value: float = 0.01
    use_mixup: bool = True
    mixup_alpha: float = 0.3
    loss_type: str = "multilabel"
    swa: bool = True
    swa_epoch_start: int = 50
    swa_freq: int = 5
    eval_every: int = 1
    limit_train_batches: Optional[int] = None  # mini_train (config_updates.py:24-26)
    limit_eval_batches: Optional[int] = None
    checkpoint_dir: Optional[str] = None
    keep_last_n: int = 1
    monitor: Optional[str] = None  # retain checkpoints by BEST value of this
    # eval metric (epoch-record key, e.g. "allap") instead of most-recent —
    # the reference's FSD50K ModelCheckpoint(monitor="allap", save_top_k,
    # mode="max") (ex_fsd50k.py:292-294). keep_last_n becomes "keep best N".
    monitor_mode: str = "max"  # "max" or "min"
    resume: bool = False  # resume from the latest checkpoint in checkpoint_dir
    dump_spectrograms: int = 0  # save the first N training batches' mels as
    # .npy under checkpoint_dir (the reference logs the first 5 steps'
    # spectrogram images to wandb, ex_audioset.py:161-167)
    log_every_steps: int = 50
    opt_moments_dtype: Optional[str] = "bfloat16_sr"  # AdamW moment
    # storage. Default: BOTH moments bf16 with a stochastic-rounded second
    # moment (train/optim.py) — 0.9 ms/step and 688 MB HBM cheaper than
    # fp32 at PaSST-S scale, quality-neutral at full size (50-tone demo
    # mAP 0.893 vs 0.894 fp32, scripts/fullsize_train_demo.py). Set null
    # for strict fp32-moment parity with the reference torch AdamW, or
    # "bfloat16" for optax's mu-only bf16.
    param_dtype: Optional[str] = "auto"  # parameter STORAGE dtype.
    # "bfloat16_sr": matrix/embedding params stored bf16, updates applied
    # with fp32 add + stochastic-rounded store (train/optim.py
    # apply_updates_sr) — halves param HBM traffic on every touch (fwd
    # read, bwd read, dW write, optimizer read/write; −172 MB residency,
    # measured 0.981x step time, scripts/ab_param_dtype.py; quality-
    # neutral at full size across 3 seeds, PARITY.md). "auto" (default):
    # bfloat16_sr when model.dtype=bfloat16 — the forward already
    # computes on per-use bf16 casts, so storage-then-use is bit-identical
    # — and fp32 under model.dtype=float32 (exact reference parity).
    # null: fp32 master weights always, matching the reference torch
    # AdamW regardless of compute dtype.
    grad_accum: int = 1  # average K micro-batch grads per optimizer update
    # (optax.MultiSteps; LR schedule advances once per update)
    log_grad_norm: bool = False  # per-step global gradient norm in the
    # step metrics (the reference's wandb.watch gradient logging,
    # ex_audioset.py:344-346, reduced to a scalar)
    log_grad_norm_per_block: bool = False  # additionally one norm per
    # top-level param group (grad_norm/blocks_0, grad_norm/head_linear, …)
    # — the scalar-cost analogue of wandb.watch's per-parameter histograms
    handle_sigterm: bool = True  # SIGTERM -> clean resumable exit (finish
    # the current step/phase, keep the last epoch checkpoint; TPU-pod
    # preemption grace handling — beyond reference, whose DDP parent just
    # dies, ex_audioset.py:522-524)
    profile_dir: Optional[str] = None  # capture a jax.profiler trace of
    # training steps [profile_start_step, +profile_num_steps) to this dir
    # (view with tensorboard/xprof; beyond reference — SURVEY.md §5 notes
    # the reference has no profiler integration)
    profile_start_step: int = 10
    profile_num_steps: int = 5
    n_data: Optional[int] = None  # mesh axes; default all devices on data
    n_model: int = 1
    seed: int = 0
    device_prefetch: int = 2  # host->device transfer pipelining depth: a
    # feed thread device_puts batch k+1 while step k computes, so the step
    # time is max(transfer, compute, load) instead of the sum (measured:
    # the 15.36 MB wave batch serialized 355 ms of transfer into every
    # 28.4 ms step through the dev tunnel; see scripts/ab_fit_gap.py).
    # 0 = inline synchronous device_put. Numerics are identical.
    transfer_dtype: str = "float32"  # "int16" ships the augmented wave as
    # int16 PCM and dequantizes on device (x.astype(f32)/32768): HALVES
    # host->device bytes per step on any link. Quantization error is
    # <= 2^-16 full scale (~ -90 dB, far below the mp3 container's own
    # noise floor) — measurably quality-neutral but not bitwise; the
    # float32 default keeps exact reference parity.
    compilation_cache_dir: Optional[str] = None  # persistent XLA compile
    # cache (jax_compilation_cache_dir): first compile of the unrolled
    # 12-block train step costs tens of seconds on TPU; with a cache dir
    # set, every later process start reuses the compiled executable


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str = "audioset"
    model: ModelSelect = ModelSelect()
    mel: MelConfig = MelConfig(fmin_aug_range=10, fmax_aug_range=2000)
    data: DataConfig = DataConfig()
    trainer: TrainerConfig = TrainerConfig()

    def resolved_param_dtype(self) -> Optional[str]:
        """``trainer.param_dtype`` with ``"auto"`` resolved: bf16+SR
        parameter storage when the model computes in bf16 (storage-then-use
        produces bit-identical forward weights to the per-use cast, so
        eval/parity numerics are unchanged), fp32 master weights when the
        model computes in fp32 (where bf16 storage WOULD change the
        forward — e.g. the exact-parity test posture)."""
        pd = self.trainer.param_dtype
        if pd == "auto":
            return "bfloat16_sr" if self.model.dtype == "bfloat16" else None
        return pd

    def passt_config(self) -> PaSSTConfig:
        from passt_tpu.models.registry import get_model_config

        m = self.model
        return get_model_config(
            arch=m.arch,
            n_classes=m.n_classes,
            in_channels=m.in_channels,
            fstride=m.fstride,
            tstride=m.tstride,
            input_fdim=m.input_fdim,
            input_tdim=m.input_tdim,
            u_patchout=m.u_patchout,
            s_patchout_t=m.s_patchout_t,
            s_patchout_f=m.s_patchout_f,
            dtype=m.dtype,
            gelu=m.gelu,
            plus1_attn=m.plus1_attn,
            attn_impl=m.attn_impl,
            ln_impl=m.ln_impl,
            patch_embed_impl=m.patch_embed_impl,
            blocks_impl=m.blocks_impl,
            fuse_ln_qkv=m.fuse_ln_qkv,
        )

    def pretty(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)


# ---------------------------------------------------------------------------
# dotted overrides
# ---------------------------------------------------------------------------
def _coerce(old: Any, raw: str) -> Any:
    if raw.lower() in ("none", "null"):
        return None
    if old is None or isinstance(old, str):
        try:
            return json.loads(raw)  # allow numbers/bools/quoted strings
        except (json.JSONDecodeError, ValueError):
            return raw
    if isinstance(old, bool):
        low = raw.lower()
        if low in ("1", "true", "yes", "on"):
            return True
        if low in ("0", "false", "no", "off"):
            return False
        # silent False on a typo ("ture") disabled features for whole
        # runs (round-5 review finding) — numeric fields already fail
        # loudly on bad input; bools must too
        raise ValueError(
            f"cannot interpret {raw!r} as a boolean "
            "(use true/false/1/0/yes/no/on/off)"
        )
    if isinstance(old, int):
        return int(raw)
    if isinstance(old, float):
        return float(raw)
    if isinstance(old, tuple):
        return tuple(json.loads(raw))
    return json.loads(raw)


def apply_overrides(cfg, overrides: Dict[str, str]):
    """Apply ``{"trainer.lr": "1e-4", ...}`` to a (frozen) dataclass tree,
    returning a new tree — the sacred ``with key=value`` surface."""
    for key, raw in overrides.items():
        parts = key.split(".")
        cfg = _apply_one(cfg, parts, raw)
    return cfg


def _apply_one(node, parts: List[str], raw: str):
    field = parts[0]
    if not dataclasses.is_dataclass(node):
        raise KeyError(f"cannot descend into {type(node).__name__} at {field}")
    names = {f.name for f in dataclasses.fields(node)}
    if field not in names:
        raise KeyError(
            f"unknown config key {field!r} on {type(node).__name__}; known: {sorted(names)}"
        )
    old = getattr(node, field)
    if len(parts) == 1:
        new = _coerce(old, raw) if isinstance(raw, str) else raw
    else:
        new = _apply_one(old, parts[1:], raw)
    return dataclasses.replace(node, **{field: new})


# ---------------------------------------------------------------------------
# named presets (the reference named configs, config_updates.py:24-229)
# ---------------------------------------------------------------------------
Preset = Callable[[ExperimentConfig], ExperimentConfig]
PRESETS: Dict[str, Dict[str, str]] = {
    # debugging
    "mini_train": {"trainer.limit_train_batches": "5", "trainer.limit_eval_batches": "5"},
    "nomixup": {"trainer.use_mixup": "false"},
    # the reference named config is "mixup" (config_updates.py:18);
    # "mixupx" kept as a back-compat alias for earlier rounds' scripts
    "mixup": {"trainer.use_mixup": "true", "trainer.mixup_alpha": "0.3"},
    "mixupx": {"trainer.use_mixup": "true", "trainer.mixup_alpha": "0.3"},
    "no_wavmix": {"data.wavmix": "false"},
    "dynamic_roll": {"data.roll": "true", "data.roll_shift_range": "10000"},
    # (reference dynamic_roll sets shift_range=10000, config_updates.py:224-229)
    # high-temporal-resolution STFT variants (reference hop100/hop160
    # checkpoints, passt.py:219-226: 10 s -> tdim 3200 / 2000)
    # (pretrained=true like every published-checkpoint preset: the
    # reference's model_ing defaults pretrained=True, so its named
    # configs all evaluate the published weights — a preset that left
    # pretrained=false would silently evaluate a random init)
    "stfthop100": {
        "mel.hopsize": "100",
        "model.arch": "passt_s_swa_f128_stfthop100_p16_s10_ap473",
        "model.input_tdim": "3200",
        "model.pretrained": "true",
    },
    "stfthop160": {
        "mel.hopsize": "160",
        "model.arch": "passt_s_swa_f128_stfthop160_p16_s10_ap473",
        "model.input_tdim": "2000",
        "model.pretrained": "true",
    },
    # FSD50K variable-length eval (reference ex_fsd50k.py variable_eval
    # named config: clip_length=None, batch_size=1)
    "variable_eval": {
        "data.clip_length": "null",
        "data.eval_batch_size": "4",
        "data.eval_pad_multiple_s": "5",
    },
    # reference-exact variable-length eval: every clip at its true length,
    # no padding (fsd50k/dataset.py:70-79; the reference's variable_eval
    # named config runs it at batch_size=1). With a length-metadata
    # container the loader groups clips by EXACT length (length-pure
    # batches of up to eval_batch_size — still bitwise the published
    # protocol) so each distinct length compiles once; containers without
    # metadata fall back to batch_size=1.
    "exact_eval": {
        "data.clip_length": "null",
        "data.eval_batch_size": "20",
        "data.eval_pad_multiple_s": "0",
    },
    # pretrained archs (config_updates.py:55-134). The non-overlap /
    # wide-stride archs additionally set the stride the checkpoint was
    # trained at — the reference named configs pass fstride/tstride
    # explicitly (config_updates.py:87-134); without them the model
    # builds a stride-10 patch grid and the s16/s14/s12 checkpoints land
    # in the wrong geometry (round-5 review finding).
    **{
        name: {"model.arch": name, "model.pretrained": "true"}
        for name in [
            "passt_s_swa_p16_128_ap476",
            "passt_s_swa_p16_128_ap4761",
            "passt_s_p16_128_ap472",
            "passt_s_kd_p16_128_ap486",
            "passt_l_kd_p16_128_ap47",
        ]
    },
    **{
        name: {
            "model.arch": name,
            "model.pretrained": "true",
            "model.fstride": str(stride),
            "model.tstride": str(stride),
        }
        for name, stride in [
            ("passt_s_p16_s16_128_ap468", 16),
            ("passt_s_swa_p16_s16_128_ap473", 16),
            ("passt_s_swa_p16_s14_128_ap471", 14),
            ("passt_s_p16_s14_128_ap469", 14),
            ("passt_s_swa_p16_s12_128_ap473", 12),
            ("passt_s_p16_s12_128_ap470", 12),
        ]
    },
    # long-audio variants (config_updates.py:36-53). NOTE: the reference
    # sets clip_length=20 for BOTH — the 30-sec arch's published protocol
    # feeds 20 s clips into the 3000-frame time encoding (the crop path);
    # clip_length=30 here was a silent parity deviation (round-5 review
    # finding). Override data.clip_length=30 explicitly to use the full
    # window. Both load the published weights like the reference's
    # pretrained-by-default model_ing.
    "passt_20sec": {
        "model.arch": "passt_s_f128_20sec_p16_s10_ap474",
        "model.input_tdim": "2000",
        "model.pretrained": "true",
        "data.clip_length": "20",
    },
    "passt_30sec": {
        "model.arch": "passt_s_f128_30sec_p16_s10_ap473",
        "model.input_tdim": "3000",
        "model.pretrained": "true",
        "data.clip_length": "20",
    },
}


def parse_cli(argv: List[str], base: ExperimentConfig) -> Tuple[str, ExperimentConfig]:
    """``[command] [preset|key=value ...]`` -> (command, config).

    Mirrors the reference CLI shape
    ``python ex_audioset.py command with key=value named_config``
    (README.md:154-175); the literal token "with" is accepted and skipped.
    """
    command = "main"
    cfg = base
    rest = list(argv)
    if rest and "=" not in rest[0] and rest[0] not in PRESETS and rest[0] != "with":
        command = rest.pop(0)
    overrides: Dict[str, str] = {}
    for tok in rest:
        if tok == "with":
            continue
        if "=" in tok:
            k, _, v = tok.partition("=")
            overrides[k] = v
        elif tok in PRESETS:
            cfg = apply_overrides(cfg, PRESETS[tok])
        else:
            raise SystemExit(f"unknown preset or override: {tok!r}")
    cfg = apply_overrides(cfg, overrides)
    return command, cfg
