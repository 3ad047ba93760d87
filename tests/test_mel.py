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


# --------------------------------------------------------------------------
# Independent oracle: vendored torchaudio.compliance.kaldi transcription
# --------------------------------------------------------------------------
def test_banks_match_torchaudio_transcription():
    """ops.mel vs tests/torchaudio_kaldi_vendor.py — two independent author
    paths (re-derivation from the Kaldi formula vs transcription of the
    torchaudio implementation) over the full augmentation range the AudioSet
    recipe draws from (fmin in [0,10), fmax in [14001,16000]),
    preprocess.py:63-74 with fmin_aug_range=10, fmax_aug_range=2000."""
    from torchaudio_kaldi_vendor import get_mel_banks

    cases = [(0.0, 15000.0), (9.0, 14001.0), (3.0, 16000.0), (0.0, -500.0),
             (50.0, 8000.0), (0.0, 15500.0)]
    for fmin, fmax in cases:
        vendor, _ = get_mel_banks(128, 1024, 32000, fmin, fmax, 100.0, -500.0, 1.0)
        ours_np = kaldi_mel_banks_np(128, 1024, 32000, fmin, fmax)
        np.testing.assert_allclose(ours_np, vendor, atol=1e-10, err_msg=f"{fmin},{fmax}")
        ours_jax = np.asarray(kaldi_mel_banks(128, 1024, 32000, fmin, fmax))
        np.testing.assert_allclose(ours_jax, vendor, atol=1e-4, err_msg=f"{fmin},{fmax}")


def test_vendor_vtln_branch_structure():
    """The VTLN branch of the transcription (unused by the reference but part
    of get_mel_banks): warp != 1 produces a valid filterbank that differs
    from the unwarped one."""
    from torchaudio_kaldi_vendor import get_mel_banks

    # valid VTLN config: low_freq < vtln_low and vtln_high (=nyquist-500) < high_freq
    warped, _ = get_mel_banks(40, 1024, 32000, 20.0, 16000.0, 100.0, -500.0, 1.1)
    plain, _ = get_mel_banks(40, 1024, 32000, 20.0, 16000.0, 100.0, -500.0, 1.0)
    assert warped.shape == plain.shape
    assert (warped >= 0).all() and warped.max() <= 1.0 + 1e-9
    assert not np.allclose(warped, plain)


def test_frontend_matches_reference_torch_end_to_end():
    """Run the ACTUAL reference AugmentMelSTFT.forward (eval mode) from
    /root/reference with torchaudio stubbed by the vendored transcription,
    and compare our whole JAX frontend against it — proving every non-bank
    stage (pre-emphasis conv, reflect-pad STFT with the zero-padded Hann,
    power, mel matmul, log, (x+4.5)/5) end-to-end in torch vs JAX
    (reference preprocess.py:57-86)."""
    torch = pytest.importorskip("torch")
    import sys

    from torchaudio_kaldi_vendor import install_torchaudio_stub
    from reference_oracle import REFERENCE_ROOT, _install_stubs, reference_available

    if not reference_available():
        pytest.skip("reference not available")
    install_torchaudio_stub()
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models.preprocess import AugmentMelSTFT  # reference module

    ref_mel = AugmentMelSTFT(
        n_mels=128, sr=32000, win_length=800, hopsize=320, n_fft=1024,
        freqm=48, timem=192, fmin=0.0, fmax=None,
        fmin_aug_range=10, fmax_aug_range=2000,  # ex_audioset.py:64-69
    )
    ref_mel.eval()

    rng = np.random.default_rng(7)
    t = np.arange(32000 * 2) / 32000.0
    wave = (
        0.4 * np.sin(2 * np.pi * 440.0 * t)
        + 0.2 * np.sin(2 * np.pi * 3000.0 * t)
        + 0.05 * rng.standard_normal(t.size)
    ).astype(np.float32)[None, :]  # [1, T]

    with torch.no_grad():
        ref_out = ref_mel(torch.from_numpy(wave)).numpy()

    cfg = MelConfig(fmin_aug_range=10, fmax_aug_range=2000)
    ours = np.asarray(log_mel_spectrogram(jnp.asarray(wave), cfg, train=False))

    assert ref_out.shape == ours.shape
    err = np.abs(ref_out - ours)
    # Two-tier bound: the residual is float32 rounding amplified by the log
    # on near-silent bins (measured: mean 1.3e-6, max 3.1e-5 at mel power
    # ~1e-4; bins at/above median power stay <= ~1.2e-5).
    assert err.max() <= 5e-5, f"frontend parity {err.max()}"
    assert err.mean() <= 5e-6, f"frontend mean parity {err.mean()}"
    power = np.exp(ref_out * 5.0 - 4.5)  # undo (x+4.5)/5 and the log
    assert err[power >= np.median(power)].max() <= 2e-5


def test_shared_mask_truncation_semantics():
    """The default shared SpecAugment mask mirrors torchaudio
    functional.mask_along_axis (the reference's exercised 3-D path):
    start AND width truncated with .long(), so the masked run is exactly
    [int(start), int(start)+int(width)) — never a full mask_param-wide
    mask, unlike the float-interval iid variant."""
    import jax

    from passt_tpu.ops.frontend import _axis_mask

    size, param, batch = 128, 48, 3
    for seed in range(5):
        key = jax.random.PRNGKey(seed)
        m = np.asarray(_axis_mask(key, batch, size, param, iid=False))
        k1, k2 = jax.random.split(key)
        w = float(np.asarray(jax.random.uniform(k1, (1, 1))) * param)
        s = float(np.asarray(jax.random.uniform(k2, (1, 1))) * (size - w))
        lo = int(np.floor(s))
        hi = lo + int(np.floor(w))
        want = np.zeros(size, bool)
        want[lo:hi] = True
        np.testing.assert_array_equal(m, np.broadcast_to(want, (batch, size)))
