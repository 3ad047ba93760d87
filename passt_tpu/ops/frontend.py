"""The augmented log-mel frontend: waveform -> normalized log-mel spectrogram.

Behavioral twin of the reference ``AugmentMelSTFT``
(reference: models/preprocess.py:18-92), redesigned to run entirely on-device
as one jit-compiled fp32 graph (and, on TPU, as a fused Pallas kernel — see
``passt_tpu.ops.pallas``):

waveform [B, T]
  -> pre-emphasis ``y[t] = x[t+1] - 0.97 * x[t]``      (preprocess.py:46,59)
  -> power STFT, n_fft=1024 / hop=320 / win=800 Hann   (preprocess.py:60-62)
  -> random mel-range augmentation of (fmin, fmax)     (preprocess.py:63-68)
  -> Kaldi triangular mel bank matmul (fp32)           (preprocess.py:71-76)
  -> ``log(mel + 1e-5)``                               (preprocess.py:78)
  -> SpecAugment frequency + time masking (train only) (preprocess.py:47-54,80-82)
  -> fixed affine normalization ``(x + 4.5) / 5``      (preprocess.py:84)

Differences by design (TPU-first, not quirk-for-quirk):

- All randomness (mel-range jitter, mask sizes/positions) comes from an
  explicit ``jax.random`` key; train/eval asymmetry is an explicit ``train``
  argument resolved at trace time, so there are exactly two compiled graphs.
- The mel bank is built *in-graph* from traced (fmin, fmax) scalars — the
  reference rebuilds a torch tensor on the host every step.
- SpecAugment masks are shared per batch by default (``iid_masks=False``):
  the reference feeds 3-D batches through torchaudio's masking transforms,
  which applies one mask to the whole batch despite requesting
  ``iid_masks=True`` (preprocess.py:50-54 — iid needs 4-D input). The
  default is parity-faithful to that observed behavior; set
  ``iid_masks=True`` for per-sample masks (the documented intent, strictly
  stronger augmentation).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from passt_tpu.ops.mel import kaldi_mel_banks
from passt_tpu.ops.stft import stft_power

LOG_OFFSET = 1e-5  # preprocess.py:78
NORM_SHIFT = 4.5  # preprocess.py:84
NORM_SCALE = 5.0


@dataclasses.dataclass(frozen=True)
class MelConfig:
    """Frontend hyperparameters (defaults = reference AugmentMelSTFT defaults,
    preprocess.py:20-21; the AudioSet recipe overrides fmin_aug_range=10,
    fmax_aug_range=2000, ex_audioset.py:64-69)."""

    n_mels: int = 128
    sr: int = 32000
    win_length: int = 800
    hopsize: int = 320
    n_fft: int = 1024
    freqm: int = 48
    timem: int = 192
    fmin: float = 0.0
    fmax: Optional[float] = None  # None -> sr//2 - fmax_aug_range//2 (preprocess.py:32-34)
    fmin_aug_range: int = 1
    fmax_aug_range: int = 1000
    iid_masks: bool = False
    stft_method: str = "auto"  # "auto" (pallas on TPU, matmul elsewhere),
    # "pallas", "matmul", "conv", or "fft"

    def __post_init__(self):
        assert self.fmin_aug_range >= 1, "fmin_aug_range >= 1 (1 = no augmentation)"
        assert self.fmax_aug_range >= 1, "fmax_aug_range >= 1 (1 = no augmentation)"

    @property
    def effective_fmax(self) -> float:
        if self.fmax is None:
            return self.sr // 2 - self.fmax_aug_range // 2
        return self.fmax

    def frames(self, num_samples: int) -> int:
        """Output frame count for a waveform of ``num_samples`` samples
        (pre-emphasis shortens the signal by one sample)."""
        from passt_tpu.ops.stft import num_stft_frames

        return num_stft_frames(num_samples - 1, self.n_fft, self.hopsize)


def _axis_mask(key, batch: int, size: int, mask_param: int, iid: bool) -> jnp.ndarray:
    """SpecAugment mask along one axis -> boolean [batch, size] (True = masked).

    Matches torchaudio's sampling: width ~ U[0, mask_param), start ~
    U[0, size - width). The default shared mode mirrors the reference's
    actually-exercised path — a 3-D [B, F, T] mel makes
    ``FrequencyMasking(iid_masks=True)`` fall back to
    ``functional.mask_along_axis``, which truncates start AND width with
    ``.long()`` (mask = [int(start), int(start)+int(width)); a full-width
    ``mask_param`` mask is unreachable). ``iid=True`` keeps
    ``mask_along_axis_iid``'s float-interval semantics.
    """
    n = batch if iid else 1
    k1, k2 = jax.random.split(key)
    width = jax.random.uniform(k1, (n, 1)) * mask_param
    start = jax.random.uniform(k2, (n, 1)) * (size - width)
    if not iid:
        width = jnp.floor(width)
        start = jnp.floor(start)
    idx = jnp.arange(size, dtype=jnp.float32)[None, :]
    mask = (idx >= start) & (idx < start + width)
    if not iid:
        mask = jnp.broadcast_to(mask, (batch, size))
    return mask


def log_mel_spectrogram(
    wave: jnp.ndarray,
    cfg: MelConfig = MelConfig(),
    *,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    """[B, T] float waveform -> [B, n_mels, frames] normalized log-mel.

    ``train=True`` requires ``rng`` and enables mel-range jitter + SpecAugment.
    """
    assert wave.ndim == 2, f"expected [B, T], got {wave.shape}"
    if train and rng is None:
        raise ValueError("train=True requires an rng key")

    fmin = jnp.float32(cfg.fmin)
    fmax = jnp.float32(cfg.effective_fmax)
    if train:
        rng, k1, k2 = jax.random.split(rng, 3)
        fmin = fmin + jax.random.randint(k1, (), 0, cfg.fmin_aug_range).astype(jnp.float32)
        fmax = (
            fmax
            + cfg.fmax_aug_range // 2
            - jax.random.randint(k2, (), 0, cfg.fmax_aug_range).astype(jnp.float32)
        )

    mel_bank = kaldi_mel_banks(cfg.n_mels, cfg.n_fft, cfg.sr, fmin, fmax)  # (n_mels, n_fft//2)

    method = cfg.stft_method
    if method == "auto":
        # Fused kernel needs lane-aligned geometry (holds for the default
        # hop 320 / n_fft 1024 but not e.g. the hop100/160 variants).
        from passt_tpu.ops.pallas.mel_kernel import kernel_supports

        kernel_ok = kernel_supports(cfg.hopsize, cfg.n_fft)
        method = "pallas" if (jax.default_backend() == "tpu" and kernel_ok) else "matmul"

    if method == "pallas":
        from passt_tpu.ops.pallas import fused_log_mel

        mel = fused_log_mel(
            wave.astype(jnp.float32), mel_bank,
            n_fft=cfg.n_fft, hop=cfg.hopsize, win_length=cfg.win_length,
            log_offset=LOG_OFFSET, norm_shift=0.0, norm_scale=1.0,
        )  # un-normalized log-mel; masks+normalization applied below
    else:
        from passt_tpu.ops.stft import preemphasis

        x = preemphasis(wave)
        power = stft_power(
            x, cfg.n_fft, cfg.hopsize, cfg.win_length, center=True, method=method
        )  # [B, n_fft//2+1, frames]

        # The reference zero-pads the bank by one FFT column
        # (preprocess.py:73); multiplying against the first n_fft//2 power
        # bins is identical.
        mel = jnp.einsum(
            "mf,bft->bmt", mel_bank, power[:, : cfg.n_fft // 2, :],
            precision=jax.lax.Precision.HIGHEST,
        )
        mel = jnp.log(mel + LOG_OFFSET)

    if train:
        b, n_mels, frames = mel.shape
        if cfg.freqm > 0:
            rng, k = jax.random.split(rng)
            fm = _axis_mask(k, b, n_mels, cfg.freqm, cfg.iid_masks)
            mel = jnp.where(fm[:, :, None], 0.0, mel)
        if cfg.timem > 0:
            rng, k = jax.random.split(rng)
            tm = _axis_mask(k, b, frames, cfg.timem, cfg.iid_masks)
            mel = jnp.where(tm[:, None, :], 0.0, mel)

    return (mel + NORM_SHIFT) / NORM_SCALE


def mel_frontend(
    wave: jnp.ndarray,
    cfg: MelConfig = MelConfig(),
    *,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    """[B, C, T] -> [B, C, n_mels, frames]; the model-facing wrapper
    (reference ``M.mel_forward``, ex_audioset.py:142-153)."""
    b, c, t = wave.shape
    mel = log_mel_spectrogram(wave.reshape(b * c, t), cfg, rng=rng, train=train)
    return mel.reshape(b, c, *mel.shape[1:])
