from passt_tpu.ops.mel import kaldi_mel_banks, kaldi_mel_banks_np, hz_to_mel, mel_to_hz
from passt_tpu.ops.stft import (
    stft_power,
    stft_power_conv,
    stft_power_fft,
    make_stft_filters,
    hann_window,
    num_stft_frames,
)
from passt_tpu.ops.frontend import MelConfig, log_mel_spectrogram, mel_frontend

__all__ = [
    "kaldi_mel_banks",
    "kaldi_mel_banks_np",
    "hz_to_mel",
    "mel_to_hz",
    "stft_power",
    "stft_power_conv",
    "stft_power_fft",
    "make_stft_filters",
    "hann_window",
    "num_stft_frames",
    "MelConfig",
    "log_mel_spectrogram",
    "mel_frontend",
]
