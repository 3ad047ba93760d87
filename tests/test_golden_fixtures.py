"""Torch-free golden parity: replay checked-in fixtures generated once from
the ACTUAL reference torch code (scripts/gen_parity_fixtures.py).

Unlike the oracle tests (test_mel.py / test_model_parity.py) these do NOT
import torch or /root/reference — the parity suite stays meaningful in a
torch-less environment and catches regressions against a frozen truth.

Scope note: the mel fixture is FULL flagship frontend geometry, but the
model fixture is thin-geometry (depth 3 / embed 128) at the full
1190-token sequence — a flagship-width fixture would be ~344 MB. The
torch-free lane therefore proves converter + architecture mechanics;
full-flagship numerics live in the torch-oracle lane (test_model_parity,
which runs green where torch is installed).
"""

import os

import numpy as np
import pytest

import jax

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _load(name):
    path = os.path.join(FIXDIR, name)
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} not generated")
    return np.load(path)


def test_mel_frontend_matches_golden():
    """Full flagship frontend geometry (n_mels 128, sr 32k, win 800, hop
    320, n_fft 1024), eval mode, vs the stored reference AugmentMelSTFT
    output."""
    from passt_tpu.ops.frontend import MelConfig, log_mel_spectrogram

    fix = _load("mel_flagship.npz")
    cfg = MelConfig(
        n_mels=128, sr=32000, win_length=800, hopsize=320,
        n_fft=1024, fmin=0.0, fmax=None, fmin_aug_range=10, fmax_aug_range=2000,
    )
    out = np.asarray(
        jax.jit(lambda w: log_mel_spectrogram(w, cfg, train=False))(fix["wave"])
    )
    assert out.shape == fix["mel"].shape
    # normalized log-mel scale is ~[-1, 1]; observed max delta 7.5e-5 on
    # this wave (CPU matmul STFT vs torch.stft fp32 accumulation order)
    assert np.abs(out - fix["mel"]).max() < 2e-4


def test_model_and_converter_match_golden():
    """Thin-but-full-geometry PaSST (1190-token sequence): raw reference
    state_dict (numpy) -> convert_torch_state_dict -> flax forward must
    reproduce the stored reference logits AND features."""
    from passt_tpu.models import PaSSTConfig, convert_torch_state_dict
    from passt_tpu.models.passt import PaSST
    from passt_tpu.models.registry import init_passt

    fix = _load("model_fullgeom.npz")
    sd = {k[3:]: fix[k] for k in fix.files if k.startswith("sd.")}
    cfg = PaSSTConfig(
        embed_dim=128, depth=3, num_heads=2, num_classes=527, distilled=True,
    )
    _, init_params = init_passt(cfg, jax.random.PRNGKey(0))
    params = convert_torch_state_dict(sd, cfg, init_params=init_params)
    logits, features = jax.jit(
        lambda p, x: PaSST(cfg).apply({"params": p}, x, train=False)
    )(params, fix["x"])
    np.testing.assert_allclose(
        np.asarray(features), fix["features"], atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(np.asarray(logits), fix["logits"], atol=2e-4, rtol=1e-4)
