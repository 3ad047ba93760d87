"""A faithful NumPy transcription of ``torchaudio.compliance.kaldi``'s
``get_mel_banks`` (plus its VTLN warp helpers) — the independent oracle for
passt_tpu's mel filterbank.

torchaudio is not installed in this environment, and ``passt_tpu.ops.mel``
must not be verified against a twin written by its own author from the same
mental formula. This file is a *transcription of the torchaudio
implementation's structure* (function by function: ``mel_scale_scalar``,
``inverse_mel_scale``, ``vtln_warp_freq``, ``vtln_warp_mel_freq``,
``get_mel_banks``), which itself transcribes Kaldi's ``MelBanks``
constructor. The reference frontend calls it with
``vtln_low=100.0, vtln_high=-500.0, vtln_warp_factor=1.0``
(reference models/preprocess.py:71-74), making the VTLN branch a no-op —
it is transcribed anyway so the oracle covers the full surface.

Used only by tests; never shipped in the package.
"""

import math

import numpy as np


def mel_scale_scalar(freq: float) -> float:
    return 1127.0 * math.log(1.0 + freq / 700.0)


def mel_scale(freq: np.ndarray) -> np.ndarray:
    return 1127.0 * np.log(1.0 + freq / 700.0)


def inverse_mel_scale_scalar(mel_freq: float) -> float:
    return 700.0 * (math.exp(mel_freq / 1127.0) - 1.0)


def inverse_mel_scale(mel_freq: np.ndarray) -> np.ndarray:
    return 700.0 * (np.exp(mel_freq / 1127.0) - 1.0)


def vtln_warp_freq(
    vtln_low_cutoff: float,
    vtln_high_cutoff: float,
    low_freq: float,
    high_freq: float,
    vtln_warp_factor: float,
    freq: np.ndarray,
) -> np.ndarray:
    """Piecewise-linear VTLN frequency warp (Kaldi ``VtlnWarpFreq``)."""
    assert vtln_low_cutoff > low_freq, "be sure to set the vtln_low option higher than low_freq"
    assert vtln_high_cutoff < high_freq, (
        "be sure to set the vtln_high option lower than high_freq [or negative]"
    )
    l = vtln_low_cutoff * max(1.0, vtln_warp_factor)
    h = vtln_high_cutoff * min(1.0, vtln_warp_factor)
    scale = 1.0 / vtln_warp_factor
    Fl = scale * l  # F(l)
    Fh = scale * h  # F(h)
    assert l > low_freq and h < high_freq
    # slopes of the left/right extension segments
    scale_left = (Fl - low_freq) / (l - low_freq)
    scale_right = (high_freq - Fh) / (high_freq - h)
    res = np.empty_like(freq)

    outside_low_high_freq = np.less(freq, low_freq) | np.greater(freq, high_freq)
    before_l = np.less(freq, l)
    before_h = np.less(freq, h)
    after_h = np.greater_equal(freq, h)

    # order of assignment matters (later masks overwrite earlier ones),
    # mirroring the torchaudio implementation exactly
    res[after_h] = high_freq + scale_right * (freq[after_h] - high_freq)
    res[before_h] = scale * freq[before_h]
    res[before_l] = low_freq + scale_left * (freq[before_l] - low_freq)
    res[outside_low_high_freq] = freq[outside_low_high_freq]
    return res


def vtln_warp_mel_freq(
    vtln_low_cutoff: float,
    vtln_high_cutoff: float,
    low_freq: float,
    high_freq: float,
    vtln_warp_factor: float,
    mel_freq: np.ndarray,
) -> np.ndarray:
    return mel_scale(
        vtln_warp_freq(
            vtln_low_cutoff,
            vtln_high_cutoff,
            low_freq,
            high_freq,
            vtln_warp_factor,
            inverse_mel_scale(mel_freq),
        )
    )


def get_mel_banks(
    num_bins: int,
    window_length_padded: int,
    sample_freq: float,
    low_freq: float,
    high_freq: float,
    vtln_low: float,
    vtln_high: float,
    vtln_warp_factor: float,
    dtype=np.float64,
):
    """Returns (bins [num_bins, window_length_padded // 2], center_freqs).

    Note the Kaldi convention: the Nyquist FFT bin is excluded (hence the
    reference zero-pads one column to n_fft//2 + 1, preprocess.py:73)."""
    assert num_bins > 3, "Must have at least 3 mel bins"
    assert window_length_padded % 2 == 0
    num_fft_bins = window_length_padded // 2
    nyquist = 0.5 * sample_freq

    if high_freq <= 0.0:
        high_freq += nyquist

    assert (
        (0.0 <= low_freq < nyquist) and (0.0 < high_freq <= nyquist) and (low_freq < high_freq)
    ), f"Bad values in options: low-freq {low_freq} and high-freq {high_freq} vs. nyquist {nyquist}"

    # fft-bin width [think of it as Nyquist-freq / half-window-length]
    fft_bin_width = sample_freq / window_length_padded
    mel_low_freq = mel_scale_scalar(low_freq)
    mel_high_freq = mel_scale_scalar(high_freq)

    # divide by num_bins+1 in next line because of end-effects where the bins
    # spread out to the sides
    mel_freq_delta = (mel_high_freq - mel_low_freq) / (num_bins + 1)

    if vtln_high < 0.0:
        vtln_high += nyquist

    assert vtln_warp_factor == 1.0 or (
        (low_freq < vtln_low < high_freq)
        and (0.0 < vtln_high < high_freq)
        and (vtln_low < vtln_high)
    ), (
        "Bad values in options: vtln-low {} and vtln-high {}, versus "
        "low-freq {} and high-freq {}".format(vtln_low, vtln_high, low_freq, high_freq)
    )

    bin = np.arange(num_bins, dtype=dtype)[:, None]  # [num_bins, 1]
    left_mel = mel_low_freq + bin * mel_freq_delta  # [num_bins, 1]
    center_mel = mel_low_freq + (bin + 1.0) * mel_freq_delta
    right_mel = mel_low_freq + (bin + 2.0) * mel_freq_delta

    if vtln_warp_factor != 1.0:
        left_mel = vtln_warp_mel_freq(
            vtln_low, vtln_high, low_freq, high_freq, vtln_warp_factor, left_mel
        )
        center_mel = vtln_warp_mel_freq(
            vtln_low, vtln_high, low_freq, high_freq, vtln_warp_factor, center_mel
        )
        right_mel = vtln_warp_mel_freq(
            vtln_low, vtln_high, low_freq, high_freq, vtln_warp_factor, right_mel
        )

    center_freqs = inverse_mel_scale(center_mel).squeeze(1)  # [num_bins]
    # [1, num_fft_bins]
    mel = mel_scale(fft_bin_width * np.arange(num_fft_bins, dtype=dtype))[None, :]

    # [num_bins, num_fft_bins]
    up_slope = (mel - left_mel) / (center_mel - left_mel)
    down_slope = (right_mel - mel) / (right_mel - center_mel)

    if vtln_warp_factor == 1.0:
        # left_mel < center_mel < right_mel so we can min the two slopes
        bins = np.maximum(0.0, np.minimum(up_slope, down_slope))
    else:
        # warping can move the order of left_mel/center_mel/right_mel anywhere
        bins = np.zeros_like(up_slope)
        up_idx = np.greater(mel, left_mel) & np.less_equal(mel, center_mel)
        down_idx = np.greater(mel, center_mel) & np.less(mel, right_mel)
        up_b = np.broadcast_to(up_slope, bins.shape)
        down_b = np.broadcast_to(down_slope, bins.shape)
        bins[up_idx] = up_b[up_idx]
        bins[down_idx] = down_b[down_idx]

    return bins.astype(dtype), center_freqs


def install_torchaudio_stub():
    """Install a fake ``torchaudio`` module (backed by this transcription)
    into sys.modules so the reference's ``models/preprocess.py`` imports and
    runs unmodified. Masking transforms are constructor-compatible no-ops —
    the eval-mode forward under test never invokes them."""
    import sys
    import types

    import torch

    if "torchaudio" in sys.modules:
        return sys.modules["torchaudio"]

    torchaudio = types.ModuleType("torchaudio")
    compliance = types.ModuleType("torchaudio.compliance")
    kaldi = types.ModuleType("torchaudio.compliance.kaldi")
    transforms = types.ModuleType("torchaudio.transforms")

    def get_mel_banks_torch(
        num_bins,
        window_length_padded,
        sample_freq,
        low_freq,
        high_freq,
        vtln_low,
        vtln_high,
        vtln_warp_factor,
    ):
        bins, center = get_mel_banks(
            num_bins,
            window_length_padded,
            sample_freq,
            float(low_freq),
            float(high_freq),
            vtln_low,
            vtln_high,
            vtln_warp_factor,
            dtype=np.float32,  # torchaudio computes in default-dtype float32
        )
        return torch.from_numpy(bins.copy()), torch.from_numpy(np.asarray(center, np.float32))

    kaldi.get_mel_banks = get_mel_banks_torch

    class _MaskStub(torch.nn.Module):
        def __init__(self, param, iid_masks=False):
            super().__init__()

        def forward(self, x):
            raise RuntimeError("masking stub must not be called in eval-mode tests")

    transforms.FrequencyMasking = _MaskStub
    transforms.TimeMasking = _MaskStub

    torchaudio.compliance = compliance
    torchaudio.transforms = transforms
    compliance.kaldi = kaldi
    sys.modules.update(
        {
            "torchaudio": torchaudio,
            "torchaudio.compliance": compliance,
            "torchaudio.compliance.kaldi": kaldi,
            "torchaudio.transforms": transforms,
        }
    )
    return torchaudio
