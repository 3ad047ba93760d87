"""STFT parity vs torch.stft (the reference's kernel, models/preprocess.py:60-62)."""

import numpy as np
import pytest

import jax.numpy as jnp

from passt_tpu.ops.stft import (
    stft_power,
    hann_window,
    make_stft_filters,
    num_stft_frames,
    stft_power_conv,
    stft_power_fft,
)

torch = pytest.importorskip("torch")


def torch_stft_power(x_np, n_fft=1024, hop=320, win_length=800):
    x = torch.from_numpy(x_np).to(torch.float32)
    window = torch.hann_window(win_length, periodic=False)
    spec = torch.stft(
        x, n_fft, hop_length=hop, win_length=win_length, center=True,
        normalized=False, window=window, return_complex=False,
    )
    return (spec ** 2).sum(dim=-1).numpy()  # [B, bins, frames]


@pytest.mark.parametrize("method", ["matmul", "conv", "fft"])
@pytest.mark.parametrize("num_samples", [32000, 48001, 159999])
def test_stft_power_matches_torch(rng_np, method, num_samples):
    x = rng_np.standard_normal((2, num_samples)).astype(np.float32)
    ref = torch_stft_power(x)
    got = np.asarray(stft_power(jnp.asarray(x), method=method))
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-4 * scale)


def test_hann_window_matches_torch():
    ref = torch.hann_window(800, periodic=False).numpy()
    np.testing.assert_allclose(hann_window(800), ref, atol=1e-6)


def test_num_frames():
    # 10 s at 32 kHz after pre-emphasis (319999 samples) -> 1000 frames.
    assert num_stft_frames(319999, 1024, 320) == 1000
    for n in [1024, 5000, 32001]:
        x = np.zeros((1, n), dtype=np.float32)
        assert torch_stft_power(x).shape[2] == num_stft_frames(n, 1024, 320)


def test_filters_shape_and_dc_bin():
    filt = make_stft_filters(1024, 800)
    assert filt.shape == (1026, 1024)
    # DC cos filter equals the padded window; DC sin filter is zero.
    window = np.zeros(1024)
    window[112:912] = hann_window(800)
    np.testing.assert_allclose(filt[0], window, atol=1e-6)
    np.testing.assert_allclose(filt[513], 0.0, atol=1e-12)
