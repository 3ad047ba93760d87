"""The jitted train/eval steps: waveform -> mel -> mixup -> PaSST -> loss ->
AdamW update, as one compiled graph.

This is the hot loop of the reference ``M.training_step``
(reference: ex_audioset.py:155-198: mel_forward -> my_mixup -> forward ->
BCE -> AdamW+LambdaLR via PL), collapsed into a single pure function: all
augmentation randomness (SpecAugment, mel-range jitter, mixup, patchout,
dropout) derives from one per-step PRNG key, and the whole step — including
the optimizer update — runs on device with no host synchronization.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from passt_tpu.models.passt import PaSST, PaSSTConfig, init_passt
from passt_tpu.ops.frontend import MelConfig, log_mel_spectrogram
from passt_tpu.train import losses as L
from passt_tpu.train.mixup import apply_mixup, sample_mixup
from passt_tpu.train.schedules import get_scheduler_lambda, make_lr_schedule


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def make_schedule(
    lr: float = 0.00002,
    steps_per_epoch: int = 1000,
    schedule_mode: str = "exp_lin",
    warm_up_len: int = 5,
    ramp_down_start: int = 50,
    ramp_down_len: int = 50,
    last_lr_value: float = 0.01,
):
    """The step->lr schedule used by :func:`make_optimizer` (exposed so the
    training loop can log the current lr, reference LearningRateMonitor,
    ex_audioset.py:305)."""
    epoch_fn = get_scheduler_lambda(
        warm_up_len, ramp_down_start, ramp_down_len, last_lr_value, schedule_mode
    )
    return make_lr_schedule(lr, epoch_fn, steps_per_epoch)


def make_optimizer(
    lr: float = 0.00002,
    weight_decay: float = 0.0001,
    steps_per_epoch: int = 1000,
    schedule_mode: str = "exp_lin",
    warm_up_len: int = 5,
    ramp_down_start: int = 50,
    ramp_down_len: int = 50,
    last_lr_value: float = 0.01,
    adamw: bool = True,
    moments_dtype: Optional[str] = None,
    grad_accum: int = 1,
) -> optax.GradientTransformation:
    """AdamW(lr=2e-5, wd=1e-4) with the warmup+linear-down epoch schedule —
    reference get_optimizer/get_lr_scheduler (ex_audioset.py:97-109).
    Weight decay applies to ALL parameters including positional embeddings
    and norms: the reference defines no_weight_decay() but never uses it
    (SURVEY §7 quirk list; ex_audioset.py:297).

    Beyond-reference production knobs: ``moments_dtype="bfloat16"`` stores
    the AdamW first moment in bf16 (optax's ``mu_dtype``; −172 MB of
    optimizer HBM for PaSST-S — the second moment stays fp32, where low
    precision would actually hurt); ``grad_accum=K`` wraps the
    optimizer in ``optax.MultiSteps`` so K micro-batch gradients average
    into one update — the schedule still advances once per *update*, so
    the LR trajectory matches a K-times-larger per-step batch."""
    schedule = make_schedule(
        lr, steps_per_epoch, schedule_mode, warm_up_len, ramp_down_start,
        ramp_down_len, last_lr_value,
    )
    if grad_accum > 1:
        # Under MultiSteps the inner optimizer's schedule is indexed by
        # UPDATE count (one per K micro-steps). Scaling the index back to
        # micro-steps (update u happens after exactly u*K micro-batches)
        # keeps the LR-vs-epoch trajectory identical to an unaccumulated
        # run for ANY K — including steps_per_epoch not divisible by K,
        # where dividing steps_per_epoch instead would run the schedule
        # ahead — and equal to the host-side logged schedule evaluated at
        # the micro-step index.
        base_schedule = schedule
        schedule = lambda u: base_schedule(u * grad_accum)  # noqa: E731
    if moments_dtype == "bfloat16_sr":
        # BOTH moments in bf16, nu stochastic-rounded (train/optim.py) —
        # 28 -> 20 B/param of update traffic and -688 MB optimizer HBM
        # for PaSST-S; pure-jnp so XLA fuses it (a per-leaf Pallas kernel
        # was measured 3 ms SLOWER end-to-end — see optim.py docstring)
        from passt_tpu.train.optim import adamw_bf16sr

        tx = adamw_bf16sr(
            schedule, weight_decay=weight_decay if adamw else 0.0
        )
    else:
        mu_dtype = None if moments_dtype is None else jnp.dtype(moments_dtype)
        if adamw:
            tx = optax.adamw(schedule, weight_decay=weight_decay, mu_dtype=mu_dtype)
        else:
            tx = optax.adam(schedule, mu_dtype=mu_dtype)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def create_train_state(
    cfg: PaSSTConfig,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    param_dtype: Optional[str] = None,
):
    """``param_dtype="bfloat16_sr"`` stores matrix params in bf16 (halving
    param HBM traffic on every touch); pair with
    ``make_train_step(param_sr=True)`` so updates apply with stochastic
    rounding instead of vanishing under nearest rounding (train/optim.py)."""
    model, params = init_passt(cfg, rng)
    from passt_tpu.train.optim import cast_params_storage

    # init the optimizer on the fp32 params BEFORE the storage cast: optax
    # moments inherit the init template's dtype, and bf16 nearest-rounded
    # moments are numerically wrong (nu stops updating — optim.py docstring)
    opt_state = tx.init(params)
    params = cast_params_storage(params, param_dtype)
    state = TrainState(params=params, opt_state=opt_state, step=jnp.int32(0))
    return model, state


def step_keys(rng: jax.Array, step) -> tuple:
    """The per-step PRNG key derivation used by the train step:
    ``(k_mel, k_mix, k_patch, k_drop, k_dpath) = split(fold_in(rng, step), 5)``.

    This is THE single source of truth — the training loop's spectrogram
    dump (loop.py dump_spectrograms) consumes the same function so a
    refactor of the split order can never silently desynchronize the
    dumped mel images from the actual training augmentation
    (reference wandb spectrogram logging, ex_audioset.py:161-167)."""
    return tuple(jax.random.split(jax.random.fold_in(rng, step), 5))


LOSS_FNS: Dict[str, Callable] = {
    "multilabel": L.multilabel_loss,  # AudioSet / FSD50K
    "single_label": L.single_label_mixup_loss,  # ESC-50
    "masked": L.masked_bce_loss,  # OpenMIC
}


def make_train_step(
    model: PaSST,
    tx: optax.GradientTransformation,
    mel_cfg: Optional[MelConfig] = MelConfig(),
    loss_type: str = "multilabel",
    use_mixup: bool = True,
    mixup_alpha: float = 0.3,
    input_tdim: Optional[int] = None,
    donate: bool = True,
    jit: bool = True,
    log_grad_norm: bool = False,
    log_grad_norm_per_block: bool = False,
    param_sr: bool = False,
):
    """Build the jitted train step.

    step(state, batch, rng) -> (state, metrics); ``batch`` is a dict with
    ``wave`` [B, T] float32 (or ``mel`` [B, 1, F, T] to skip the frontend)
    and ``target`` ([B, C] multilabel/masked, [B] int for single-label).
    ``rng`` is a *base* key; the per-step key is folded in from state.step,
    so resuming at step k reproduces the schedule exactly.
    """
    loss_fn_inner = LOSS_FNS[loss_type]
    tdim = input_tdim if input_tdim is not None else model.cfg.input_tdim

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        k_mel, k_mix, k_patch, k_drop, k_dpath = step_keys(rng, state.step)

        if "mel" in batch:
            x = batch["mel"]
        else:
            mel = log_mel_spectrogram(batch["wave"], mel_cfg, rng=k_mel, train=True)
            x = mel[:, None, :, :tdim]
        y = batch["target"]
        b = x.shape[0]

        perm = lam = None
        if use_mixup:
            perm, lam = sample_mixup(k_mix, b, mixup_alpha)
            x = apply_mixup(x, perm, lam)

        def loss_of(params):
            logits, _ = model.apply(
                {"params": params},
                x,
                train=True,
                rngs={"patchout": k_patch, "dropout": k_drop, "droppath": k_dpath},
            )
            return loss_fn_inner(logits, y, perm, lam)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if param_sr:
            # bf16 param storage: fp32 add + stochastic-rounded bf16 store
            # (train/optim.py). Key derivation is deliberately distinct
            # from step_keys (augmentation) and the optimizer's nu SR seed.
            from passt_tpu.train.optim import apply_updates_sr

            params = apply_updates_sr(
                state.params,
                updates,
                jax.random.fold_in(jax.random.PRNGKey(0x5A), state.step),
            )
        else:
            params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        metrics = {"loss": loss}
        if log_grad_norm:
            # gradient observability (the reference's wandb.watch gradient
            # logging, ex_audioset.py:344-346, as a scalar global norm)
            metrics["grad_norm"] = optax.global_norm(grads)
        if log_grad_norm_per_block:
            # per-parameter-group norms — the closest in-graph analogue of
            # wandb.watch's per-parameter histograms (ex_audioset.py:344-346)
            # at scalar cost: one norm per top-level param group
            # (patch_embed, blocks_0..N, head_*, pos embeds). Keys land in
            # the step JSONL/wandb records via the loop's metric forwarding.
            for group, sub in grads.items():
                metrics[f"grad_norm/{group}"] = optax.global_norm(sub)
        return new_state, metrics

    if not jit:
        return step_fn
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(
    model: PaSST,
    mel_cfg: Optional[MelConfig] = MelConfig(),
    loss_type: str = "multilabel",
    input_tdim: Optional[int] = None,
):
    """Jitted eval step: (params, batch) -> dict(out, loss, features) — the
    reference ``validation_step`` compute (ex_audioset.py:216-243, minus
    host-side metric collection). ``out`` is sigmoid probabilities for
    multilabel/masked and **log-softmax** for single-label (argmax-safe;
    not probabilities)."""
    if loss_type not in LOSS_FNS:
        raise KeyError(f"unknown loss_type {loss_type!r}; known: {sorted(LOSS_FNS)}")
    tdim = input_tdim if input_tdim is not None else model.cfg.input_tdim

    def step_fn(params, batch):
        if "mel" in batch:
            x = batch["mel"]
        else:
            mel = log_mel_spectrogram(batch["wave"], mel_cfg, train=False)
            x = mel[:, None, :, :tdim]
        logits, features = model.apply({"params": params}, x, train=False)
        y = batch["target"]
        # per-example loss [B]: lets callers trim mesh-padding rows and
        # weight ragged tail batches correctly; its mean equals the
        # reference's batch loss for every loss type.
        if loss_type == "single_label":
            loss_pe = L.softmax_ce(logits, y)
            out = jax.nn.log_softmax(logits, axis=-1)
        elif loss_type == "masked":
            k = y.shape[1] // 2
            mask = y[:, k:]
            yb = (y[:, :k] > 0.5).astype(logits.dtype)
            loss_pe = (mask * L.bce_with_logits(logits, yb)).mean(axis=1)
            out = jax.nn.sigmoid(logits)
        else:
            loss_pe = L.bce_with_logits(logits, y).mean(axis=1)
            out = jax.nn.sigmoid(logits)
        return {
            "out": out,
            "loss": loss_pe.mean(),
            "loss_per_example": loss_pe,
            "features": features,
        }

    return jax.jit(step_fn)
