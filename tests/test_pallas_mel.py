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
