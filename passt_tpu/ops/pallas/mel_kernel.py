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
Mosaic vectors are (sublane, lane=128)-tiled and ``hop`` need not be a lane
multiple, but ``2*hop`` must be (the kernel validates this): even-indexed
frames then start lane-aligned in the wave, and odd-indexed frames start
lane-aligned in a copy shifted by ``hop % 128`` samples. Each parity half
(64 frames) is assembled **one frame-row at a time**: frame j's r-th
128-sample row lives at a fixed (group-offset, row-in-group) in the
group-of-``2*hop/128``-rows view, so ``n_fft/128`` static strided views +
one concat produce the [64, n_fft] framed matrix — every reshape is
tile-aligned, for any conforming hop (320, 448, 256, ...). The kernel
emits the two parities separately ([..., block, parity, 64] lane order)
and a single cheap XLA transpose interleaves them back to frame order.

Both matmuls run at ``Precision.HIGHEST`` — a plain f32 dot lowers to a
single-pass bf16 MXU matmul inside Mosaic, whose rounding at spectral nulls
explodes after the log (observed max-err ~1.2 on normalized log-mels).

The XLA composition in ``passt_tpu.ops.frontend`` remains the behavioral
reference; this kernel is selected with ``MelConfig(stft_method="pallas")``
(or ``"auto"`` on TPU).
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


def kernel_supports(hop: int, n_fft: int) -> bool:
    """True iff the fused kernel's framing scheme handles this geometry."""
    return (
        (2 * hop) % _LANE == 0
        and n_fft % _LANE == 0
        and (FRAME_BLOCK * hop) % (8 * _LANE) == 0
        and (hop % _LANE) in (0, 64)
    )


def _mel_kernel(
    w0_ref,  # [1, R, 128] f32 wave, lane-tiled
    wsh_ref,  # [1, R, 128] f32 wave shifted by hop % 128 samples
    basis_ref,  # [n_fft, 2 * n_bins] f32 windowed DFT basis
    bank_ref,  # [n_freq, n_mels] f32 mel bank (transposed)
    out_ref,  # [1, n_mels, FRAME_BLOCK]: lanes = [even 64 | odd 64]
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
    half = FRAME_BLOCK // 2
    rpt = 2 * hop // _LANE  # rows per 2-hop group
    frame_rows = n_fft // _LANE

    # Rows covering this block (aligned start: FRAME_BLOCK*hop/128 is a
    # multiple of 8 by kernel_supports).
    odd_row_shift = (hop - (hop % _LANE)) // _LANE
    max_shift = max(0, odd_row_shift)
    need_groups = half + (max_shift + frame_rows + rpt - 1) // rpt
    need_rows = need_groups * rpt
    row0 = fb * (FRAME_BLOCK * hop // _LANE)

    def frames_of(parity_ref, row_shift: int):
        w = parity_ref[0, pl.ds(row0, need_rows), :]  # [need_rows, 128]
        g = w.reshape(need_groups, rpt, _LANE)
        # Frame j's row r sits at group j + (row_shift+r)//rpt,
        # row-in-group (row_shift+r) % rpt — one static view per frame row.
        rows = []
        for r in range(frame_rows):
            gi, ri = divmod(row_shift + r, rpt)
            rows.append(g[gi : gi + half, ri])  # [half, 128]
        return jnp.concatenate(rows, axis=1)  # [half, n_fft]

    shift_samples = hop % _LANE
    odd_ref = wsh_ref if shift_samples else w0_ref
    framed = jnp.concatenate(
        [frames_of(w0_ref, 0), frames_of(odd_ref, odd_row_shift)], axis=0
    )  # [128, n_fft] — first 64 rows even frames, last 64 odd

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
    interpret=None,
) -> jnp.ndarray:
    """[B, T] waveform + [n_mels, n_freq] mel bank -> [B, n_mels, frames].

    Pre-emphasis and reflect padding happen in XLA (they fuse into the DMA);
    framing, DFT, power, mel, log and normalization run in the kernel.
    ``interpret`` defaults to Pallas interpreter mode off-TPU (same policy
    as the attention/layernorm kernels), so an explicit
    ``stft_method="pallas"`` on a CPU/GPU host runs instead of failing
    Mosaic lowering.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert wave.ndim == 2
    b, t = wave.shape
    n_mels, n_freq = mel_bank.shape
    if not kernel_supports(hop, n_fft):
        raise ValueError(
            f"fused mel kernel does not support hop={hop}, n_fft={n_fft} "
            "(needs 2*hop and n_fft lane-aligned and hop % 128 in {0, 64}); "
            "use stft_method='matmul'"
        )

    from passt_tpu.ops.stft import preemphasis, reflect_pad_center

    x = reflect_pad_center(preemphasis(wave), n_fft)

    frames = 1 + (x.shape[1] - n_fft) // hop
    n_blocks = -(-frames // FRAME_BLOCK)
    rpt = 2 * hop // _LANE
    half = FRAME_BLOCK // 2
    odd_row_shift = (hop - (hop % _LANE)) // _LANE
    need_groups = half + (odd_row_shift + n_fft // _LANE + rpt - 1) // rpt
    rows = (n_blocks - 1) * (FRAME_BLOCK * hop // _LANE) + need_groups * rpt
    rows = -(-rows // 8) * 8
    x0 = _tile(x, rows)
    shift = hop % _LANE
    # shift == 0 (e.g. hop 256): the kernel statically never reads the
    # shifted operand (odd_ref = w0_ref), so ship a minimal dummy block
    # instead of DMAing the whole clip into VMEM twice (round-5 review
    # finding: ~1.3 MB VMEM + a redundant DMA per clip for 10 s audio)
    sh_rows = rows if shift else 8
    xsh = _tile(x[:, shift:], rows) if shift else jnp.zeros(
        (b, 8, _LANE), x.dtype
    )

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
            pl.BlockSpec((1, sh_rows, _LANE), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, 2 * (n_fft // 2 + 1)), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freq, n_mels), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n_mels, FRAME_BLOCK), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_mels, n_blocks * FRAME_BLOCK), jnp.float32),
        interpret=interpret,
    )(x0, xsh, basis, mel_bank.T.astype(jnp.float32))

    # De-interleave parities: lanes are [even 64 | odd 64] per block; frame
    # index = 2q + p for lane p*64 + q.
    out = out.reshape(b, n_mels, n_blocks, 2, FRAME_BLOCK // 2)
    out = jnp.transpose(out, (0, 1, 2, 4, 3)).reshape(b, n_mels, n_blocks * FRAME_BLOCK)
    return out[:, :, :frames]
