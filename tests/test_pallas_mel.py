"""Fused Pallas mel kernel vs the XLA frontend (interpret mode on CPU;
the real-TPU check lives in the verify workflow)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from passt_tpu.ops.frontend import MelConfig, log_mel_spectrogram
from passt_tpu.ops.mel import kaldi_mel_banks
from passt_tpu.ops.pallas.mel_kernel import fused_log_mel


def _check(got, ref):
    """fp32 summation-order jitter concentrates at near-zero mel bins where
    the log is steep; bound the log-domain error loosely there and tightly
    everywhere the signal is non-negligible."""
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-3)
    mel_linear = np.exp(5.0 * ref - 4.5)
    strong = mel_linear > 1e-2
    np.testing.assert_allclose(got[strong], ref[strong], atol=2e-4)


@pytest.mark.parametrize("num_samples", [32000, 48001])
def test_fused_kernel_matches_xla(num_samples):
    rng = np.random.default_rng(num_samples)  # hermetic per-case stream
    wave = jnp.asarray(rng.standard_normal((2, num_samples)).astype(np.float32))
    cfg = MelConfig()
    ref = np.asarray(log_mel_spectrogram(wave, cfg, train=False))
    bank = kaldi_mel_banks(cfg.n_mels, cfg.n_fft, cfg.sr, cfg.fmin, cfg.effective_fmax)
    got = np.asarray(fused_log_mel(wave, bank, interpret=True))
    _check(got, ref)


def test_fused_kernel_partial_last_block():
    # 1.1 s -> 111 frames: exercises the padded last frame block.
    rng = np.random.default_rng(7)
    wave = jnp.asarray(rng.standard_normal((1, 35200)).astype(np.float32))
    cfg = MelConfig()
    ref = np.asarray(log_mel_spectrogram(wave, cfg))
    bank = kaldi_mel_banks(cfg.n_mels, cfg.n_fft, cfg.sr, cfg.fmin, cfg.effective_fmax)
    got = np.asarray(fused_log_mel(wave, bank, interpret=True))
    _check(got, ref)


@pytest.mark.parametrize("hop", [256, 448, 640])
def test_fused_kernel_generic_hops(hop):
    """The per-row framing must handle any hop with 2*hop lane-aligned and
    hop % 128 in {0, 64} (review finding: the original two-view scheme
    silently corrupted hop=448)."""
    from passt_tpu.ops.pallas.mel_kernel import kernel_supports

    assert kernel_supports(hop, 1024)
    rng = np.random.default_rng(hop)
    wave = jnp.asarray(rng.standard_normal((1, 48000)).astype(np.float32))
    cfg = MelConfig(hopsize=hop, stft_method="matmul")
    ref = np.asarray(log_mel_spectrogram(wave, cfg))
    bank = kaldi_mel_banks(cfg.n_mels, cfg.n_fft, cfg.sr, cfg.fmin, cfg.effective_fmax)
    got = np.asarray(fused_log_mel(wave, bank, hop=hop, interpret=True))
    _check(got, ref)


def test_fused_kernel_rejects_unsupported_hop():
    from passt_tpu.ops.pallas.mel_kernel import kernel_supports

    assert not kernel_supports(100, 1024)
    assert not kernel_supports(160, 1024)
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((1, 32000)).astype(np.float32))
    bank = kaldi_mel_banks(128, 1024, 32000, 0.0, 15000.0)
    with pytest.raises(ValueError, match="does not support hop"):
        fused_log_mel(wave, bank, hop=100, interpret=True)
