"""hear21passt-style inference API tests (reference README.md:48-65)."""

import dataclasses

import numpy as np
import pytest

import jax

import passt_tpu.models.registry as registry
from passt_tpu.hear import Predictor
from passt_tpu.ops.frontend import MelConfig


@pytest.fixture(scope="module")
def tiny_predictor():
    spec = registry.ARCHS["passt_s_swa_p16_128_ap476"]
    tiny = dataclasses.replace(spec, depth=2, embed_dim=64, num_heads=4)
    old = registry.ARCHS["passt_s_swa_p16_128_ap476"]
    registry.ARCHS["passt_s_swa_p16_128_ap476"] = tiny
    try:
        yield Predictor.create(
            arch="passt_s_swa_p16_128_ap476", dtype="float32", input_tdim=98
        )
    finally:
        registry.ARCHS["passt_s_swa_p16_128_ap476"] = old


def test_waveform_to_logits(tiny_predictor, rng_np):
    wave = rng_np.standard_normal((2, 32000)).astype(np.float32)
    logits = tiny_predictor(wave)
    assert logits.shape == (2, 527)
    assert np.isfinite(np.asarray(logits)).all()


def test_scene_embeddings(tiny_predictor, rng_np):
    wave = rng_np.standard_normal((2, 32000)).astype(np.float32)
    logits, feats = tiny_predictor.logits_and_features(wave)
    # default mode="all": logits ‖ features — the hear21passt ecosystem's
    # 1295-d scene-embedding contract (527 + 768 at flagship geometry;
    # 527 + 64 for this tiny net). reference README.md:48-65.
    emb = tiny_predictor.scene_embeddings(wave)
    assert emb.shape == (2, 527 + 64)
    np.testing.assert_array_equal(
        np.asarray(emb), np.concatenate([np.asarray(logits), np.asarray(feats)], -1)
    )
    # explicit modes
    emb_f = tiny_predictor.scene_embeddings(wave, mode="embed_only")
    assert emb_f.shape == (2, 64)
    np.testing.assert_array_equal(np.asarray(emb_f), np.asarray(feats))
    emb_l = tiny_predictor.scene_embeddings(wave, mode="logits")
    np.testing.assert_array_equal(np.asarray(emb_l), np.asarray(logits))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown embedding mode"):
        tiny_predictor.scene_embeddings(wave, mode="nope")


def test_timestamp_embeddings(tiny_predictor, rng_np):
    wave = rng_np.standard_normal((1, 32000)).astype(np.float32)
    emb, ts = tiny_predictor.timestamp_embeddings(wave, window_seconds=0.5, hop_seconds=0.25)
    assert emb.shape[0] == 1 and emb.shape[2] == 527 + 64  # mode="all"
    emb_f, _ = tiny_predictor.timestamp_embeddings(
        wave, window_seconds=0.5, hop_seconds=0.25, mode="embed_only"
    )
    assert emb_f.shape[2] == 64
    # HEAR API shape contract: timestamps are (n_sounds, n_timestamps)
    ts = np.asarray(ts)
    assert ts.shape == (emb.shape[0], emb.shape[1])
    assert (np.diff(ts, axis=1) > 0).all()  # monotonically increasing, ms
    assert ts[0, 0] >= 0 and ts[0, -1] <= 1000.0


def test_hear_module_entry_points(rng_np):
    """hear21passt drop-in surface: load_model / get_scene_embeddings /
    get_timestamp_embeddings (hear-eval-kit API contract)."""
    from passt_tpu import hear

    spec = registry.ARCHS["passt_s_swa_p16_128_ap476"]
    tiny = dataclasses.replace(spec, depth=2, embed_dim=64, num_heads=4)
    old = registry.ARCHS["passt_s_swa_p16_128_ap476"]
    registry.ARCHS["passt_s_swa_p16_128_ap476"] = tiny
    try:
        # load_model(mode=...) mirrors hear21passt get_basic_model(mode=...)
        m = hear.load_model(dtype="float32", input_tdim=98, mode="embed_only")
        wave = rng_np.standard_normal((2, 32000)).astype(np.float32)
        emb = hear.get_scene_embeddings(wave, m)
        assert emb.shape == (2, 64)
        ts_emb, ts = hear.get_timestamp_embeddings(wave, m)
        assert ts_emb.shape[0] == 2 and ts_emb.shape[2] == 64
        assert np.asarray(ts).shape == (2, ts_emb.shape[1])  # (B, N) HEAR shape
        m_all = hear.load_model(dtype="float32", input_tdim=98)
        assert hear.get_scene_embeddings(wave, m_all).shape == (2, 527 + 64)
    finally:
        registry.ARCHS["passt_s_swa_p16_128_ap476"] = old


def test_timestamp_embeddings_short_audio_and_full_span(tiny_predictor, rng_np):
    """The HEAR contract requires arbitrary-length audio: the clip is
    zero-padded by half a window each side, so even sub-window clips give
    >= 1 frame and the timestamp grid starts at 0 ms and spans the clip
    (hear21passt pads the same way; previously t <= window crashed and the
    grid stopped half a window short of both edges)."""
    sr = 32000
    # shorter than one 0.16 s window
    tiny_clip = rng_np.standard_normal((1, int(0.1 * sr))).astype(np.float32)
    emb, ts = tiny_predictor.timestamp_embeddings(tiny_clip)
    assert emb.shape[0] == 1 and emb.shape[1] >= 1
    assert float(ts[0, 0]) == 0.0

    one_sec = rng_np.standard_normal((2, sr)).astype(np.float32)
    emb, ts = tiny_predictor.timestamp_embeddings(one_sec)
    assert np.asarray(ts).shape == (2, emb.shape[1])
    assert float(ts[0, 0]) == 0.0
    assert float(ts[0, -1]) >= 1000.0 - 50.0 - 1e-6  # grid reaches last hop
    hops = np.diff(np.asarray(ts), axis=1)
    np.testing.assert_allclose(hops, 50.0, atol=1e-6)
    # chunked forward (tail padded to the fixed chunk) == one-shot math:
    # the 2x21-window call above crossed no chunk boundary; force one
    tiny_predictor.timestamp_chunk = 8
    emb2, ts2 = tiny_predictor.timestamp_embeddings(one_sec)
    np.testing.assert_allclose(np.asarray(emb2), np.asarray(emb), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ts2), np.asarray(ts))
    tiny_predictor.timestamp_chunk = 256


@pytest.mark.slow  # builds the real depth-12 stfthop100 arch at tdim 3200
# (twice) — ~2 min of init on a 1-core host; the fast tier covers the
# Predictor surface with the tiny_predictor fixture above
def test_predictor_uses_arch_time_grid():
    """Zoo archs trained on longer/denser time grids (20/30-sec, stfthop)
    must build at THEIR input_tdim, not the 998 default — otherwise only a
    prefix of the clip is scored (export.py applies the same override)."""
    from passt_tpu.models.registry import ARCHS
    from passt_tpu.hear import Predictor, default_inference_mel_cfg

    arch = "passt_s_swa_f128_stfthop100_p16_s10_ap473"
    p = Predictor.create(arch=arch, checkpoint_path=None, dtype="float32")
    assert p.model.cfg.input_tdim == ARCHS[arch].input_tdim == 3200
    assert default_inference_mel_cfg(arch).hopsize == 100
    # explicit override still wins
    p2 = Predictor.create(arch=arch, checkpoint_path=None, dtype="float32",
                          input_tdim=500)
    assert p2.model.cfg.input_tdim == 500
