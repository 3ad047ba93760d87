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


def _make_clips():
    """Distinct tone+noise clips, int16-quantized exactly as
    pack_waveform_hdf5 stores them (so both pipelines see the SAME wave:
    the loader decodes raw_i16 as int16/32768, datasets.py:171-172)."""
    rng = np.random.default_rng(42)
    t = np.arange(32000) / 32000.0
    clips = []
    for i in range(N_CLIPS):
        w = (
            0.4 * np.sin(2 * np.pi * (220.0 + 137.0 * i) * t)
            + 0.15 * np.sin(2 * np.pi * (900.0 + 410.0 * i) * t)
            + 0.05 * rng.standard_normal(t.size)
        ).astype(np.float32)
        q = (np.clip(w, -1.0, 1.0) * 32767.0).astype(np.int16)
        target = np.zeros(N_CLASSES, np.float32)
        target[i % N_CLASSES] = 1.0
        clips.append((f"clip{i:02d}.wav", q, target))
    return clips


@pytest.mark.slow
def test_wave_to_map_eval_protocol_parity(tmp_path, monkeypatch):
    import sys

    import torch
    from sklearn import metrics as skm

    from torchaudio_kaldi_vendor import install_torchaudio_stub

    install_torchaudio_stub()
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    ref_passt = load_reference_passt_module()
    from models.preprocess import AugmentMelSTFT  # reference module

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
    tdim = mel_cfg.frames(32000)

    clips = _make_clips()

    # ---- reference pipeline: AugmentMelSTFT.eval() -> PaSST -> sigmoid ----
    ref_mel = AugmentMelSTFT(
        n_mels=mel_cfg.n_mels, sr=mel_cfg.sr, win_length=mel_cfg.win_length,
        hopsize=mel_cfg.hopsize, n_fft=mel_cfg.n_fft, freqm=mel_cfg.freqm,
        timem=mel_cfg.timem, fmin=mel_cfg.fmin, fmax=mel_cfg.fmax,
        fmin_aug_range=mel_cfg.fmin_aug_range,
        fmax_aug_range=mel_cfg.fmax_aug_range,
    )
    ref_mel.eval()
    torch.manual_seed(0)
    ref = ref_passt.PaSST(
        img_size=(mel_cfg.n_mels, tdim), patch_size=16, stride=(10, 10),
        in_chans=1, num_classes=N_CLASSES, embed_dim=192, depth=2,
        num_heads=3, distilled=True,
    )
    ref.eval()

    waves = np.stack([q.astype(np.float32) / 32768.0 for _, q, _ in clips])
    targets = np.stack([tg for _, _, tg in clips])
    with torch.no_grad():
        mel = ref_mel(torch.from_numpy(waves))
        ref_logits, _ = ref(mel[:, None])
        ref_probs = torch.sigmoid(ref_logits).numpy()
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
        input_tdim=tdim, num_classes=N_CLASSES, depth=2, embed_dim=192,
        num_heads=3, distilled=True,
    )
    _, init_params = init_passt(pcfg, jax.random.PRNGKey(0))
    params = convert_torch_state_dict(ref.state_dict(), pcfg, init_params=init_params)
    npz = str(tmp_path / "ported.npz")
    save_params_npz(npz, params)

    spec = registry.ARCHS[exp.default_config.model.arch]
    monkeypatch.setitem(
        registry.ARCHS,
        exp.default_config.model.arch,
        dataclasses.replace(spec, depth=2, embed_dim=192, num_heads=3),
    )
    cfg = apply_overrides(
        exp.default_config,
        {
            "model.n_classes": str(N_CLASSES),
            "model.input_tdim": str(tdim),
            "model.pretrained": "true",
            "model.checkpoint_path": npz,
            "model.dtype": "float32",
            "model.s_patchout_t": "0",
            "model.s_patchout_f": "0",
            "model.u_patchout": "0",
            "data.eval_hdf5": h5,
            "data.num_classes": str(N_CLASSES),
            "data.clip_length": "1",
            "data.eval_batch_size": "5",  # ragged tail: 12 = 5 + 5 + 2
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
    np.testing.assert_allclose(our_probs, ref_probs, atol=2e-4)

    # our evaluate() metric must BE the sklearn protocol number ...
    sk_ours = skm.average_precision_score(targets, our_probs, average=None).mean()
    assert abs(our["allap"] - sk_ours) < 1e-9
    # ... and the chain end-to-end must land on the reference's mAP.
    assert abs(our["allap"] - ref_map) < 1e-6, (our["allap"], ref_map)
