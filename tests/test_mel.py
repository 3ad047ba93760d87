"""Mel-bank and frontend tests.

The Kaldi bank formula (reference: torchaudio.compliance.kaldi.get_mel_banks
invoked at models/preprocess.py:71-72) is verified against an independent
float64 NumPy twin plus structural properties of Kaldi filterbanks; the full
frontend is checked for shape, train/eval asymmetry, normalization range and
the documented normalization constants.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from passt_tpu.ops.frontend import MelConfig, log_mel_spectrogram, mel_frontend
from passt_tpu.ops.mel import hz_to_mel, kaldi_mel_banks, kaldi_mel_banks_np, mel_to_hz


def test_mel_scale_roundtrip():
    f = np.linspace(0, 16000, 100)
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-9)
    # Kaldi constants: mel(700) = 1127*ln(2)
    np.testing.assert_allclose(hz_to_mel(700.0), 1127.0 * np.log(2.0))


@pytest.mark.parametrize("fmin,fmax", [(0.0, 15000.0), (50.0, 14000.0), (0.0, -500.0)])
def test_jax_bank_matches_numpy(fmin, fmax):
    ref = kaldi_mel_banks_np(128, 1024, 32000, fmin, fmax)
    got = np.asarray(kaldi_mel_banks(128, 1024, 32000, fmin, fmax))
    assert got.shape == (128, 512)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_bank_structure():
    bank = kaldi_mel_banks_np(128, 1024, 32000, 0.0, 15000.0)
    # Triangles: nonnegative, each row has a single contiguous support.
    assert (bank >= 0).all()
    for row in bank:
        nz = np.flatnonzero(row > 0)
        assert nz.size > 0
        assert np.array_equal(nz, np.arange(nz[0], nz[-1] + 1))
    # Centers are monotonically increasing in frequency.
    centers = bank.argmax(axis=1)
    assert (np.diff(centers) >= 0).all()
    # Filter peak frequency matches the analytic mel-grid center.
    mel_low, mel_high = hz_to_mel(0.0), hz_to_mel(15000.0)
    delta = (mel_high - mel_low) / 129
    center_hz = mel_to_hz(mel_low + (np.arange(128) + 1) * delta)
    bin_hz = 32000 / 1024 * centers
    assert np.abs(center_hz - bin_hz).max() < 32000 / 1024  # within one bin


def test_bank_traced_fmin_fmax_no_recompile():
    calls = 0

    @jax.jit
    def f(fmin, fmax):
        nonlocal calls
        calls += 1
        return kaldi_mel_banks(128, 1024, 32000, fmin, fmax)

    a = f(jnp.float32(0.0), jnp.float32(15000.0))
    b = f(jnp.float32(5.0), jnp.float32(14500.0))
    assert calls == 1  # traced once, fmin/fmax are runtime scalars
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_frontend_shapes_and_eval_determinism(rng_np):
    cfg = MelConfig()
    wave = jnp.asarray(rng_np.standard_normal((2, 32000)).astype(np.float32))
    out1 = log_mel_spectrogram(wave, cfg, train=False)
    out2 = log_mel_spectrogram(wave, cfg, train=False)
    assert out1.shape == (2, 128, cfg.frames(32000))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_frontend_10s_audioset_geometry(rng_np):
    cfg = MelConfig()
    wave = jnp.asarray(rng_np.standard_normal((1, 320000)).astype(np.float32) * 0.1)
    out = log_mel_spectrogram(wave, cfg)
    assert out.shape == (1, 128, 1000)


def test_frontend_train_masks_and_jitter(rng_np):
    cfg = MelConfig(fmin_aug_range=10, fmax_aug_range=2000)
    wave = jnp.asarray(rng_np.standard_normal((3, 32000)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    tr1 = log_mel_spectrogram(wave, cfg, rng=key, train=True)
    tr2 = log_mel_spectrogram(wave, cfg, rng=jax.random.PRNGKey(1), train=True)
    ev = log_mel_spectrogram(wave, cfg, train=False)
    # Same key is deterministic; different keys differ; train differs from eval.
    np.testing.assert_array_equal(
        np.asarray(log_mel_spectrogram(wave, cfg, rng=key, train=True)), np.asarray(tr1)
    )
    assert not np.allclose(np.asarray(tr1), np.asarray(tr2))
    assert not np.allclose(np.asarray(tr1), np.asarray(ev))
    # Masked cells carry the normalized zero value (0 + 4.5)/5 = 0.9
    # (compare with tolerance: TPU may compute the affine as x*0.2+0.9).
    masked_frac = np.isclose(np.asarray(tr1), 0.9, atol=1e-6).mean()
    assert masked_frac > 0.01


def test_frontend_normalization_constants():
    # A pure silence input: power=0 -> log(1e-5) -> (log(1e-5)+4.5)/5.
    wave = jnp.zeros((1, 32000), dtype=jnp.float32)
    out = np.asarray(log_mel_spectrogram(wave))
    expected = (np.log(1e-5) + 4.5) / 5.0
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_mel_forward_channel_wrapper(rng_np):
    cfg = MelConfig()
    wave = jnp.asarray(rng_np.standard_normal((2, 1, 32000)).astype(np.float32))
    out = mel_frontend(wave, cfg)
    assert out.shape == (2, 1, 128, cfg.frames(32000))
    flat = log_mel_spectrogram(wave[:, 0, :], cfg)
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(flat))


@pytest.mark.parametrize("hop,expected_frames", [(100, 3200), (160, 2000)])
def test_hop_variant_geometry(rng_np, hop, expected_frames):
    """hop100/160 checkpoint geometries (reference passt.py:219-226:
    10 s at hop 100 -> ~3200 frames, hop 160 -> ~2000)."""
    cfg = MelConfig(hopsize=hop)
    assert cfg.frames(320000) == expected_frames
    wave = jnp.asarray(rng_np.standard_normal((1, 32000)).astype(np.float32))
    out = log_mel_spectrogram(wave, cfg)
    assert out.shape == (1, 128, cfg.frames(32000))
