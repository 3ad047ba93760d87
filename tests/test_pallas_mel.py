"""Fused Pallas mel kernel vs the XLA frontend (interpret mode on CPU;
the real-TPU check lives in the verify workflow)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from passt_tpu.ops.frontend import MelConfig, log_mel_spectrogram
from passt_tpu.ops.mel import kaldi_mel_banks
from passt_tpu.ops.pallas.mel_kernel import fused_log_mel


@pytest.mark.parametrize("num_samples", [32000, 48001])
def test_fused_kernel_matches_xla(rng_np, num_samples):
    wave = jnp.asarray(rng_np.standard_normal((2, num_samples)).astype(np.float32))
    cfg = MelConfig()
    ref = np.asarray(log_mel_spectrogram(wave, cfg, train=False))
    bank = kaldi_mel_banks(cfg.n_mels, cfg.n_fft, cfg.sr, cfg.fmin, cfg.effective_fmax)
    got = np.asarray(
        fused_log_mel(wave, bank, interpret=True)
    )
    # kernel emits normalized output with the same constants
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_fused_kernel_partial_last_block(rng_np):
    # 1.1 s -> 111 frames: exercises the padded last frame block.
    wave = jnp.asarray(rng_np.standard_normal((1, 35200)).astype(np.float32))
    cfg = MelConfig()
    ref = np.asarray(log_mel_spectrogram(wave, cfg))
    bank = kaldi_mel_banks(cfg.n_mels, cfg.n_fft, cfg.sr, cfg.fmin, cfg.effective_fmax)
    got = np.asarray(fused_log_mel(wave, bank, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)
