"""Fused Pallas TPU kernel: waveform -> normalized log-mel spectrogram.

One kernel covers the whole deterministic frontend pipeline of the
reference ``AugmentMelSTFT`` (reference: models/preprocess.py:57-86):

    pre-emphasis -> framing (reflect-padded, hop 320 / frame 1024)
    -> windowed real-DFT (as an MXU matmul against the Hann-DFT basis)
    -> power -> mel filterbank matmul -> log -> (x + 4.5) / 5

per (clip, 128-frame block) grid cell, entirely in VMEM. The random
mel-range jitter stays outside (the mel bank is a kernel *input* built
in-graph from traced fmin/fmax — see passt_tpu.ops.mel) and SpecAugment
masks are applied to the output (XLA fuses them into the copy-out).

Framing without gathers, in lane-tiled space
--------------------------------------------
Mosaic vectors are (sublane, lane=128)-tiled, and hop=320 is not a lane
multiple — but ``2*hop = 640 = 5 rows`` of 128 is. So the host passes TWO
lane-tiled copies of the (pre-emphasized, reflect-padded) wave: the
original, and one shifted by 320-256=64... precisely: even-indexed frames
start at sample ``j*640`` (row ``5j``, lane offset 0) in the original; odd
frames start at ``j*640 + 320``, which in a copy shifted by 64 samples is
``j*640 + 256`` — row ``5j + 2``, lane offset 0 again. Each half-block of
64 frames is then assembled from two static group-of-5-rows views and one
concat — every reshape stays tile-aligned. The kernel emits the two
parities separately ([..., block, parity, 64] order) and a single cheap XLA
transpose interleaves them back to frame order.

The XLA composition in ``passt_tpu.ops.frontend`` remains the behavioral
reference; this kernel is selected with ``MelConfig(stft_method="pallas")``.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from passt_tpu.ops.stft import make_stft_filters

FRAME_BLOCK = 128  # frames per grid cell (64 even + 64 odd)
_LANE = 128


def _mel_kernel(
    w0_ref,  # [1, R, 128] f32 wave, lane-tiled
    w64_ref,  # [1, R, 128] f32 wave shifted by 64 samples
    basis_ref,  # [n_fft, 2 * n_bins] f32 windowed DFT basis
    bank_ref,  # [n_freq, n_mels] f32 mel bank (transposed)
    out_ref,  # [1, n_mels, 2, 64] per (b, fb): parity-major frame halves
    *,
    hop: int,
    n_fft: int,
    log_offset: float,
    norm_shift: float,
    norm_scale: float,
):
    fb = pl.program_id(1)
    n_bins = basis_ref.shape[1] // 2
    n_freq = bank_ref.shape[0]
    half = FRAME_BLOCK // 2  # 64 frames per parity
    rows_per_2hop = 2 * hop // _LANE  # 5
    frame_rows = n_fft // _LANE  # 8

    # Rows covering this block: half*5 + 8 rows, padded to a multiple of 8
    # for aligned sublane slicing; row start fb*(FRAME_BLOCK*hop/128) is a
    # multiple of 8 (320 per block).
    need_rows = half * rows_per_2hop + frame_rows  # 328
    row0 = fb * (FRAME_BLOCK * hop // _LANE)

    def frames_of(parity_ref, row_shift: int):
        w = parity_ref[0, pl.ds(row0, need_rows), :]  # [328, 128]
        g = w[: (half + 1) * rows_per_2hop].reshape(half + 1, rows_per_2hop, _LANE)
        lead = frame_rows - (rows_per_2hop - row_shift)  # rows taken from group j+1
        a = g[:half, row_shift:]  # [64, 5-row_shift, 128]
        b = g[1 : half + 1, :lead]  # [64, lead, 128]
        return jnp.concatenate([a, b], axis=1).reshape(half, n_fft)

    # Even frames: row offset 0 in w0. Odd frames: row offset 2 in w64
    # (start sample j*640 + 320 = (j*640 + 256) + 64).
    framed = jnp.concatenate(
        [frames_of(w0_ref, 0), frames_of(w64_ref, 2)], axis=0
    )  # [128, n_fft] — first 64 rows even frames, last 64 odd

    # HIGHEST precision is load-bearing: a plain f32 dot lowers to a
    # single-pass bf16 MXU matmul inside Mosaic, whose rounding at spectral
    # nulls explodes after the log (observed max-err ~1.2 on normalized
    # log-mels); HIGHEST forces the multi-pass f32 path.
    dot_f32 = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    spec = dot_f32(framed, basis_ref[...])
    re, im = spec[:, :n_bins], spec[:, n_bins:]
    power = re * re + im * im  # [128, n_bins]

    mel = dot_f32(power[:, :n_freq], bank_ref[...])
    mel = jnp.log(mel + log_offset)
    mel = (mel + norm_shift) / norm_scale  # [128, n_mels]
    # Lanes hold [even 64 | odd 64] frames — de-interleaved by the caller.
    out_ref[0] = mel.T


def _tile(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    b = x.shape[0]
    x = jnp.pad(x, ((0, 0), (0, rows * _LANE - x.shape[1])))
    return x.reshape(b, rows, _LANE)


def fused_log_mel(
    wave: jnp.ndarray,
    mel_bank: jnp.ndarray,
    *,
    n_fft: int = 1024,
    hop: int = 320,
    win_length: int = 800,
    log_offset: float = 1e-5,
    norm_shift: float = 4.5,
    norm_scale: float = 5.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, T] waveform + [n_mels, n_freq] mel bank -> [B, n_mels, frames].

    Pre-emphasis and reflect padding happen in XLA (they fuse into the DMA);
    framing, DFT, power, mel, log and normalization run in the kernel.
    """
    assert wave.ndim == 2
    b, t = wave.shape
    n_mels, n_freq = mel_bank.shape
    assert (2 * hop) % _LANE == 0 and n_fft % _LANE == 0, (
        "kernel requires 2*hop and n_fft to be lane multiples"
    )
    assert (FRAME_BLOCK * hop) % (8 * _LANE) == 0

    x = wave.astype(jnp.float32)
    x = x[:, 1:] - 0.97 * x[:, :-1]  # pre-emphasis (preprocess.py:59)
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")

    frames = 1 + (x.shape[1] - n_fft) // hop
    n_blocks = -(-frames // FRAME_BLOCK)
    rows = (FRAME_BLOCK // 2) * (2 * hop) // _LANE * n_blocks + n_fft // _LANE
    rows = -(-rows // 8) * 8
    x0 = _tile(x, rows)
    x64 = _tile(x[:, 64:], rows)

    basis = jnp.asarray(make_stft_filters(n_fft, win_length)).T  # [n_fft, 2*bins]

    kernel = functools.partial(
        _mel_kernel,
        hop=hop,
        n_fft=n_fft,
        log_offset=log_offset,
        norm_shift=norm_shift,
        norm_scale=norm_scale,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((1, rows, _LANE), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, _LANE), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, 2 * (n_fft // 2 + 1)), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freq, n_mels), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n_mels, FRAME_BLOCK), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_mels, n_blocks * FRAME_BLOCK), jnp.float32),
        interpret=interpret,
    )(x0, x64, basis, mel_bank.T.astype(jnp.float32))

    # De-interleave parities: lanes are [even 64 | odd 64] per block; frame
    # index = 2q + p for lane p*64 + q.
    out = out.reshape(b, n_mels, n_blocks, 2, FRAME_BLOCK // 2)
    out = jnp.transpose(out, (0, 1, 2, 4, 3)).reshape(b, n_mels, n_blocks * FRAME_BLOCK)
    return out[:, :, :frames]
