"""Wave-in -> mAP-out eval-protocol parity vs the LIVE reference pipeline.

The flagship oracle (README.md:307-326: ``evaluate_only`` with
``passt_s_swa_p16_128_ap476`` -> mAP 0.476) needs the published checkpoint
and the AudioSet eval container, neither of which exists in this offline
environment. This test executes the SAME protocol end to end on synthetic
artifacts instead: the full ``evaluate_only`` chain (HDF5 int16 decode ->
pad/crop -> eval-mode mel -> ported PaSST forward -> sigmoid -> AP over the
whole set) against the actual reference torch pipeline
(``AugmentMelSTFT.eval()`` -> ``models.passt.PaSST`` -> sigmoid ->
sklearn ``average_precision_score``, ex_audioset.py:216-291) on identical
clips with identical (converter-ported) weights.

Every link was already oracled in isolation (mel: test_mel; model+converter:
test_model_parity; AP==sklearn: test_train) — this is the one test where a
single number, mAP, flows through OUR production command and THEIR torch
code and must come out the same.
"""

import dataclasses

import numpy as np
import pytest

from reference_oracle import (
    REFERENCE_ROOT,
    _install_stubs,
    load_reference_passt_module,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(),
    reason="reference oracle (/root/reference + torch) unavailable",
)

N_CLIPS = 12
N_CLASSES = 6


def _make_clips(n_clips=N_CLIPS, n_classes=N_CLASSES, n_samples=32000, seed=42):
    """Distinct tone+noise clips, int16-quantized exactly as
    pack_waveform_hdf5 stores them (so both pipelines see the SAME wave:
    the loader decodes raw_i16 as int16/32768, datasets.py:171-172).

    Multi-label targets: class c is positive in clip ``c % n_clips``, so
    every class has >=1 positive and per-class AP is defined even when
    n_classes >> n_clips (the flagship 527-class geometry)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples) / 32000.0
    clips = []
    for i in range(n_clips):
        w = (
            0.4 * np.sin(2 * np.pi * (220.0 + 137.0 * i) * t)
            + 0.15 * np.sin(2 * np.pi * (900.0 + 410.0 * i) * t)
            + 0.05 * rng.standard_normal(t.size)
        ).astype(np.float32)
        q = (np.clip(w, -1.0, 1.0) * 32767.0).astype(np.int16)
        target = np.zeros(n_classes, np.float32)
        target[i % n_classes] = 1.0
        target[i::n_clips] = 1.0  # classes c ≡ i (mod n_clips)
        clips.append((f"clip{i:02d}.wav", q, target))
    return clips


def _ref_pipeline(mel_cfg, ref_model, waves):
    """AugmentMelSTFT.eval() -> PaSST -> sigmoid, the reference eval path."""
    import sys

    import torch

    from torchaudio_kaldi_vendor import install_torchaudio_stub

    install_torchaudio_stub()
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models.preprocess import AugmentMelSTFT  # reference module

    ref_mel = AugmentMelSTFT(
        n_mels=mel_cfg.n_mels, sr=mel_cfg.sr, win_length=mel_cfg.win_length,
        hopsize=mel_cfg.hopsize, n_fft=mel_cfg.n_fft, freqm=mel_cfg.freqm,
        timem=mel_cfg.timem, fmin=mel_cfg.fmin, fmax=mel_cfg.fmax,
        fmin_aug_range=mel_cfg.fmin_aug_range,
        fmax_aug_range=mel_cfg.fmax_aug_range,
    )
    ref_mel.eval()
    with torch.no_grad():
        mel = ref_mel(torch.from_numpy(waves))
        logits, _ = ref_model(mel[:, None])
        return torch.sigmoid(logits).numpy()


def _chain_parity(
    tmp_path,
    monkeypatch,
    *,
    n_clips,
    n_classes,
    clip_samples,
    depth,
    embed_dim,
    num_heads,
    eval_batch_size,
    prob_atol,
    map_atol,
):
    """Run the full wave->mAP chain through BOTH pipelines and compare.

    Reference side: ``AugmentMelSTFT.eval() -> PaSST -> sigmoid -> sklearn
    AP`` (ex_audioset.py:216-291). Our side: HDF5 container + converter-ported
    .npz through the production ``evaluate_only`` / ``predict`` commands.
    """
    import torch
    from sklearn import metrics as skm

    ref_passt = load_reference_passt_module()

    import jax
    import passt_tpu.models.registry as registry
    from passt_tpu.config import apply_overrides
    from passt_tpu.data.prepare import pack_waveform_hdf5
    from passt_tpu.experiments import EXPERIMENTS
    from passt_tpu.models import PaSSTConfig, convert_torch_state_dict
    from passt_tpu.models.passt import init_passt
    from passt_tpu.models.pretrained import save_params_npz

    exp = EXPERIMENTS["audioset"]
    mel_cfg = exp.default_config.mel
    tdim = mel_cfg.frames(clip_samples)

    clips = _make_clips(n_clips=n_clips, n_classes=n_classes, n_samples=clip_samples)

    # ---- reference pipeline: AugmentMelSTFT.eval() -> PaSST -> sigmoid ----
    torch.manual_seed(0)
    ref = ref_passt.PaSST(
        img_size=(mel_cfg.n_mels, tdim), patch_size=16, stride=(10, 10),
        in_chans=1, num_classes=n_classes, embed_dim=embed_dim, depth=depth,
        num_heads=num_heads, distilled=True,
    )
    ref.eval()

    waves = np.stack([q.astype(np.float32) / 32768.0 for _, q, _ in clips])
    targets = np.stack([tg for _, _, tg in clips])
    ref_probs = _ref_pipeline(mel_cfg, ref, waves)
    # the reference protocol: per-class AP over the whole eval set, meaned
    # (ex_audioset.py:278-283)
    ref_map = skm.average_precision_score(targets, ref_probs, average=None).mean()

    # ---- our pipeline: HDF5 container + ported .npz through evaluate_only --
    h5 = str(tmp_path / "eval.h5")
    pack_waveform_hdf5(
        h5,
        [(n, q.astype(np.float32) / 32767.0, tg) for n, q, tg in clips],
        packed_targets=True,
    )
    pcfg = PaSSTConfig(
        input_tdim=tdim, num_classes=n_classes, depth=depth, embed_dim=embed_dim,
        num_heads=num_heads, distilled=True,
    )
    _, init_params = init_passt(pcfg, jax.random.PRNGKey(0))
    params = convert_torch_state_dict(ref.state_dict(), pcfg, init_params=init_params)
    npz = str(tmp_path / "ported.npz")
    save_params_npz(npz, params)

    spec = registry.ARCHS[exp.default_config.model.arch]
    monkeypatch.setitem(
        registry.ARCHS,
        exp.default_config.model.arch,
        dataclasses.replace(spec, depth=depth, embed_dim=embed_dim, num_heads=num_heads),
    )
    cfg = apply_overrides(
        exp.default_config,
        {
            "model.n_classes": str(n_classes),
            "model.input_tdim": str(tdim),
            "model.pretrained": "true",
            "model.checkpoint_path": npz,
            "model.dtype": "float32",
            "model.s_patchout_t": "0",
            "model.s_patchout_f": "0",
            "model.u_patchout": "0",
            "data.eval_hdf5": h5,
            "data.num_classes": str(n_classes),
            "data.clip_length": str(clip_samples // 32000),
            "data.eval_batch_size": str(eval_batch_size),
        },
    )

    our = exp.evaluate_only(cfg)

    # per-clip probabilities through the production predict command
    pred_path = str(tmp_path / "pred.npz")
    exp.predict(cfg, out_path=pred_path)
    pred = np.load(pred_path)
    order = np.argsort(pred["names"])
    our_probs = pred["out"][order]
    our_targets = pred["target"][order]

    np.testing.assert_array_equal(
        our_targets.astype(np.float32), targets, err_msg="target round-trip"
    )
    np.testing.assert_allclose(our_probs, ref_probs, atol=prob_atol)

    # our evaluate() metric must BE the sklearn protocol number ...
    sk_ours = skm.average_precision_score(targets, our_probs, average=None).mean()
    assert abs(our["allap"] - sk_ours) < 1e-9
    # ... and the chain end-to-end must land on the reference's mAP.
    assert abs(our["allap"] - ref_map) < map_atol, (our["allap"], ref_map)


@pytest.mark.slow
def test_wave_to_map_eval_protocol_parity(tmp_path, monkeypatch):
    _chain_parity(
        tmp_path,
        monkeypatch,
        n_clips=N_CLIPS,
        n_classes=N_CLASSES,
        clip_samples=32000,
        depth=2,
        embed_dim=192,
        num_heads=3,
        eval_batch_size=5,  # ragged tail: 12 = 5 + 5 + 2
        prob_atol=2e-4,
        map_atol=1e-6,
    )


@pytest.mark.slow
def test_wave_to_map_eval_protocol_parity_flagship_geometry(tmp_path, monkeypatch):
    """The SAME chain at the flagship checkpoint's exact geometry: depth-12,
    768-wide, 12 heads, 527 classes, 10-second clips (tdim 998) — the
    ``passt_s_swa_p16_128_ap476`` eval shape (reference models/passt.py:175-178,
    README.md:307-326). With the published .pt in place of the random-init
    state dict, this test IS the mAP-0.476 oracle run.

    mAP tolerance is looser than the small-geometry test: with 527 classes
    ranked over 8 clips, ~1e-5 prob noise between the two float32 pipelines
    can flip a near-tied ranking, moving the mean AP by O(0.1/527).
    """
    _chain_parity(
        tmp_path,
        monkeypatch,
        n_clips=8,
        n_classes=527,
        clip_samples=320000,
        depth=12,
        embed_dim=768,
        num_heads=12,
        eval_batch_size=3,  # ragged tail: 8 = 3 + 3 + 2
        prob_atol=1e-3,
        map_atol=2e-3,
    )
