"""Power-spectrogram STFT as MXU-friendly XLA ops.

Semantics match ``torch.stft(x, n_fft, hop_length, win_length, center=True,
normalized=False, window=hann(win_length, periodic=False))`` followed by
``(re^2 + im^2)`` as used by the reference frontend
(reference: models/preprocess.py:60-62):

- reflect-pad the signal by ``n_fft // 2`` on both sides,
- the ``win_length`` Hann window (symmetric, ``periodic=False``) is
  zero-padded *centered* inside the ``n_fft`` frame
  (left pad = ``(n_fft - win_length) // 2``),
- frame count = ``1 + (T_padded - n_fft) // hop``.

TPU-native design: the hot path (:func:`stft_power_conv`) folds framing,
windowing and the real DFT into a **single strided convolution** with
``2 * (n_fft//2 + 1)`` output channels whose filters are the windowed DFT
basis — one big matmul that XLA tiles straight onto the MXU, instead of a
gather-based framing plus an FFT. An ``jnp.fft.rfft`` path
(:func:`stft_power_fft`) is kept as a numerical cross-check and CPU
fallback. Everything runs in float32: the reference keeps the spectrogram in
an fp32 autocast island (preprocess.py:75) and bit-comparable mel features
are a stated target.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def hann_window(win_length: int, dtype=np.float64) -> np.ndarray:
    """Symmetric (``periodic=False``) Hann window, as ``torch.hann_window``."""
    n = np.arange(win_length, dtype=dtype)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * n / (win_length - 1)))


def num_stft_frames(num_samples: int, n_fft: int, hop: int, center: bool = True) -> int:
    """Frame count produced for a signal of ``num_samples`` samples."""
    if center:
        num_samples = num_samples + 2 * (n_fft // 2)
    return 1 + (num_samples - n_fft) // hop


@functools.lru_cache(maxsize=8)
def make_stft_filters(n_fft: int, win_length: int) -> np.ndarray:
    """Windowed real-DFT basis as conv filters, shape ``(2*(n_fft//2+1), n_fft)``.

    Row ``f`` is ``w[t] * cos(2*pi*f*t/n_fft)`` and row ``n_bins + f`` is
    ``-w[t] * sin(2*pi*f*t/n_fft)`` (the torch.stft sign convention,
    irrelevant for the power spectrum), where ``w`` is the Hann window
    zero-padded centered into the ``n_fft`` frame.
    """
    n_bins = n_fft // 2 + 1
    window = np.zeros(n_fft, dtype=np.float64)
    left = (n_fft - win_length) // 2
    window[left : left + win_length] = hann_window(win_length)

    t = np.arange(n_fft, dtype=np.float64)
    f = np.arange(n_bins, dtype=np.float64)[:, None]
    phase = 2.0 * np.pi * f * t[None, :] / n_fft
    cos_f = np.cos(phase) * window[None, :]
    sin_f = -np.sin(phase) * window[None, :]
    return np.concatenate([cos_f, sin_f], axis=0).astype(np.float32)


PREEMPHASIS_COEFF = 0.97  # reference preprocess.py:46


def preemphasis(x: jnp.ndarray, coeff: float = PREEMPHASIS_COEFF) -> jnp.ndarray:
    """Pre-emphasis ``y[t] = x[t+1] - coeff*x[t]`` (valid conv with kernel
    [-coeff, 1], reference preprocess.py:46,59); output is one sample
    shorter. Shared by the XLA and Pallas frontend paths."""
    x = x.astype(jnp.float32)
    return x[:, 1:] - coeff * x[:, :-1]


def reflect_pad_center(x: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """torch.stft center=True reflect padding (n_fft//2 both sides)."""
    pad = n_fft // 2
    return jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")


_center_pad = reflect_pad_center


def stft_power_conv(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 320,
    win_length: int = 800,
    center: bool = True,
) -> jnp.ndarray:
    """Power spectrogram ``[B, n_fft//2 + 1, frames]`` via one strided conv."""
    assert x.ndim == 2, f"expected [B, T] waveform, got {x.shape}"
    x = x.astype(jnp.float32)
    if center:
        x = _center_pad(x, n_fft)
    filters = jnp.asarray(make_stft_filters(n_fft, win_length))  # (2*bins, n_fft)
    n_bins = n_fft // 2 + 1
    out = jax.lax.conv_general_dilated(
        x[:, None, :],  # [B, 1, T]
        filters[:, None, :],  # [O=2*bins, I=1, K=n_fft]
        window_strides=(hop,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, 2*bins, frames]
    re, im = out[:, :n_bins, :], out[:, n_bins:, :]
    return re * re + im * im


def stft_power_fft(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 320,
    win_length: int = 800,
    center: bool = True,
) -> jnp.ndarray:
    """Power spectrogram via explicit framing + rFFT (reference path / CPU)."""
    assert x.ndim == 2
    x = x.astype(jnp.float32)
    if center:
        x = _center_pad(x, n_fft)
    frames = num_stft_frames(x.shape[1], n_fft, hop, center=False)
    # Static gather-free framing: frame indices are compile-time constants.
    idx = (np.arange(frames)[:, None] * hop + np.arange(n_fft)[None, :]).astype(np.int32)
    framed = x[:, idx]  # [B, frames, n_fft]
    window = np.zeros(n_fft, dtype=np.float32)
    left = (n_fft - win_length) // 2
    window[left : left + win_length] = hann_window(win_length).astype(np.float32)
    framed = framed * jnp.asarray(window)[None, None, :]
    spec = jnp.fft.rfft(framed, axis=-1)  # [B, frames, bins]
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return jnp.transpose(power, (0, 2, 1))  # [B, bins, frames]


def stft_power_matmul(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 320,
    win_length: int = 800,
    center: bool = True,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Power spectrogram via contiguous-view framing + one MXU matmul.

    The fastest TPU formulation found: the framed signal [B, frames, n_fft]
    is assembled from ``n_fft // hop`` *contiguous shifted views* of the
    hop-blocked signal plus one strided-patch tail for the ``n_fft % hop``
    remainder — no gathers, no strided slices — then multiplied by the
    windowed-DFT basis in a single [B*frames, n_fft] x [n_fft, 2*bins]
    matmul. Measured vs the conv formulation on TPU v5e this removes ~28 ms
    of real compute per batch-12x10s call (the conv lowers to an oversized
    im2col); numerics match the FFT path to ~3e-7 relative.
    """
    assert x.ndim == 2
    x = x.astype(jnp.float32)
    if center:
        x = _center_pad(x, n_fft)
    b, t_padded = x.shape
    frames = 1 + (t_padded - n_fft) // hop
    k = n_fft // hop
    rem = n_fft - k * hop
    nblk = t_padded // hop
    xb = x[:, : nblk * hop].reshape(b, nblk, hop)
    views = [xb[:, i : i + frames] for i in range(k)]  # contiguous slices
    if rem:
        tail_src = x[:, k * hop : k * hop + (frames - 1) * hop + rem]
        tail = jax.lax.conv_general_dilated_patches(
            tail_src[:, None, :], (rem,), (hop,), "VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        ).reshape(b, rem, frames).transpose(0, 2, 1)
        views.append(tail)
    framed = jnp.concatenate(views, axis=2)  # [B, frames, n_fft]

    filt = jnp.asarray(make_stft_filters(n_fft, win_length)).T  # [n_fft, 2*bins]
    out = jnp.einsum(
        "bfn,nc->bcf",
        framed.astype(compute_dtype),
        filt.astype(compute_dtype),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.float32)
    n_bins = n_fft // 2 + 1
    re, im = out[:, :n_bins, :], out[:, n_bins:, :]
    return re * re + im * im


def stft_power(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 320,
    win_length: int = 800,
    center: bool = True,
    method: str = "matmul",
) -> jnp.ndarray:
    if method == "matmul":
        return stft_power_matmul(x, n_fft, hop, win_length, center)
    if method == "conv":
        return stft_power_conv(x, n_fft, hop, win_length, center)
    if method == "fft":
        return stft_power_fft(x, n_fft, hop, win_length, center)
    raise ValueError(f"unknown stft method {method!r}")
