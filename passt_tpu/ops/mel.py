"""Kaldi-compatible triangular mel filterbanks, in JAX and NumPy.

The reference frontend builds its mel filterbank with
``torchaudio.compliance.kaldi.get_mel_banks(n_mels, n_fft, sr, fmin, fmax,
vtln_low=100.0, vtln_high=-500.0, vtln_warp_factor=1.0)`` on *every forward
pass*, because ``fmin``/``fmax`` are randomly perturbed per training step
(reference: models/preprocess.py:63-74). A vtln warp factor of exactly 1.0
makes the VTLN branch a no-op, so the bank reduces to plain triangular
filters on the Kaldi mel scale ``m(f) = 1127 * ln(1 + f/700)``.

TPU-native design: instead of rebuilding a host-side tensor per step (which
would force a transfer or a recompile), :func:`kaldi_mel_banks` is a pure
traced JAX function of two *scalar array* inputs (fmin, fmax). The random
draws happen on device and the (n_mels, n_fft//2) bank is materialised
in-graph — a trivial 128x512 broadcast/elementwise computation that XLA fuses
into the surrounding frontend. No recompilation, no host round trip.

Output convention matches the reference: the bank covers FFT bins
``0 .. n_fft//2 - 1`` (the Nyquist bin is excluded); the reference then
zero-pads one column to width ``n_fft//2 + 1`` (preprocess.py:73) — callers
here instead simply matmul against the first ``n_fft//2`` power bins, which
is numerically identical and avoids the dead column.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def hz_to_mel(freq):
    """Kaldi mel scale (natural log, 1127 factor) — works on jnp/np arrays."""
    if isinstance(freq, jnp.ndarray):
        return 1127.0 * jnp.log1p(freq / 700.0)
    return 1127.0 * np.log(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


def mel_to_hz(mel):
    if isinstance(mel, jnp.ndarray):
        return 700.0 * (jnp.exp(mel / 1127.0) - 1.0)
    return 700.0 * (np.exp(np.asarray(mel, dtype=np.float64) / 1127.0) - 1.0)


def kaldi_mel_banks(
    n_mels: int,
    n_fft: int,
    sample_rate: float,
    fmin,
    fmax,
    *,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Triangular Kaldi mel bank of shape ``(n_mels, n_fft // 2)``.

    ``fmin`` / ``fmax`` may be Python floats or traced scalar arrays; the
    result is a traced function of them (so the per-step random mel-range
    augmentation of the reference costs zero recompiles).

    ``fmax <= 0`` is interpreted as an offset from Nyquist, mirroring Kaldi
    (high_freq += nyquist when high_freq <= 0).
    """
    num_fft_bins = n_fft // 2
    nyquist = 0.5 * sample_rate

    fmin = jnp.asarray(fmin, dtype=jnp.float32)
    fmax = jnp.asarray(fmax, dtype=jnp.float32)
    fmax = jnp.where(fmax <= 0.0, fmax + nyquist, fmax)

    mel_low = hz_to_mel(fmin)
    mel_high = hz_to_mel(fmax)
    mel_delta = (mel_high - mel_low) / (n_mels + 1)

    bins = jnp.arange(n_mels, dtype=jnp.float32)[:, None]  # (n_mels, 1)
    left_mel = mel_low + bins * mel_delta
    center_mel = mel_low + (bins + 1.0) * mel_delta
    right_mel = mel_low + (bins + 2.0) * mel_delta

    # The FFT-bin frequencies are static, so their mel values are baked in as
    # float64-accurate constants — only fmin/fmax flow through traced (and on
    # TPU slightly less accurate) transcendentals.
    fft_bin_width = sample_rate / n_fft
    freqs = fft_bin_width * np.arange(num_fft_bins, dtype=np.float64)
    mel = jnp.asarray(hz_to_mel(freqs).astype(np.float32))[None, :]  # (1, num_fft_bins)

    up_slope = (mel - left_mel) / (center_mel - left_mel)
    down_slope = (right_mel - mel) / (right_mel - center_mel)
    weights = jnp.maximum(0.0, jnp.minimum(up_slope, down_slope))
    return weights.astype(dtype)


def kaldi_mel_banks_np(
    n_mels: int,
    n_fft: int,
    sample_rate: float,
    fmin: float,
    fmax: float,
) -> np.ndarray:
    """NumPy float64 twin of :func:`kaldi_mel_banks` for host precomputation
    and as an independent cross-check in tests."""
    num_fft_bins = n_fft // 2
    nyquist = 0.5 * sample_rate
    if fmax <= 0.0:
        fmax = fmax + nyquist

    mel_low = hz_to_mel(float(fmin))
    mel_high = hz_to_mel(float(fmax))
    mel_delta = (mel_high - mel_low) / (n_mels + 1)

    bins = np.arange(n_mels, dtype=np.float64)[:, None]
    left_mel = mel_low + bins * mel_delta
    center_mel = mel_low + (bins + 1.0) * mel_delta
    right_mel = mel_low + (bins + 2.0) * mel_delta

    fft_bin_width = sample_rate / n_fft
    freqs = fft_bin_width * np.arange(num_fft_bins, dtype=np.float64)
    mel = hz_to_mel(freqs)[None, :]

    up_slope = (mel - left_mel) / (center_mel - left_mel)
    down_slope = (right_mel - mel) / (right_mel - center_mel)
    return np.maximum(0.0, np.minimum(up_slope, down_slope))
