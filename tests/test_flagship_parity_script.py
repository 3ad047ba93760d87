"""Wiring test for scripts/run_flagship_parity.py (stubbed artifacts).

The script is the one-command runway for the published-checkpoint oracles
(flagship mAP 0.476 + the three fine-tune numbers) that cannot execute in
this environment for lack of the artifacts. This test runs the ENTIRE
wiring — synthetic reference .pt → port → evaluate_only → JSON verdict →
exit code — at a shrunken depth-2 geometry so the one real invocation
needs zero decisions (VERDICT r4 item 4).
"""

import dataclasses
import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/scripts")

from passt_tpu.data.prepare import pack_waveform_hdf5

from tests.reference_oracle import load_reference_passt_module


ARCH = "passt_s_swa_p16_128_ap476"


@pytest.fixture
def tiny_artifacts(tmp_path, monkeypatch):
    """(pt_path, h5_path): a synthetic reference checkpoint at depth-2
    geometry (ARCHS monkeypatched to match) + an 8-clip 527-class eval
    container."""
    torch = pytest.importorskip("torch")
    import passt_tpu.models.registry as registry

    monkeypatch.setitem(
        registry.ARCHS,
        ARCH,
        dataclasses.replace(registry.ARCHS[ARCH], depth=2, embed_dim=192, num_heads=3),
    )
    ref_passt = load_reference_passt_module()
    torch.manual_seed(7)
    ref = ref_passt.PaSST(
        img_size=(128, 998), patch_size=16, stride=(10, 10), in_chans=1,
        num_classes=527, distilled=True, depth=2, embed_dim=192, num_heads=3,
    )
    pt_path = str(tmp_path / "synthetic-flagship.pt")
    torch.save(ref.state_dict(), pt_path)

    rng = np.random.default_rng(3)
    items = []
    for i in range(8):
        wave = (rng.standard_normal(32000) * 0.1).astype(np.float32)
        target = np.zeros(527)
        target[i % 527] = 1
        items.append((f"e{i}.wav", wave, target))
    h5_path = str(tmp_path / "eval.h5")
    pack_waveform_hdf5(h5_path, items, packed_targets=True)
    return pt_path, h5_path


# model.input_tdim stays at the checkpoint's nominal 998: short clips are
# handled by the model's runtime time-embed crop (as in the real fine-tune
# protocol), not by rebuilding the pos-embed grid.
_SHRINK = [
    "model.dtype=float32",
    "data.clip_length=1",
    "data.eval_batch_size=4",
]


@pytest.mark.slow
def test_wiring_ungated_smoke(tiny_artifacts, tmp_path, capsys):
    """Truncated eval runs end to end, reports, and does NOT gate."""
    import run_flagship_parity as rfp

    pt, h5 = tiny_artifacts
    rc = rfp.main(
        [pt, h5, "--out-npz", str(tmp_path / "ported.npz")]
        + _SHRINK
        + ["trainer.limit_eval_batches=1"]
    )
    assert rc == 0
    line = [
        ln for ln in capsys.readouterr().out.splitlines() if ln.startswith('{"mode"')
    ][-1]
    rec = json.loads(line)
    assert rec["mode"] == "audioset" and rec["metric"] == "ap"
    assert rec["pass"] is None and rec["gated"] is False
    assert 0.0 <= rec["value"] <= 1.0


@pytest.mark.slow
def test_gate_pass_and_fail_exit_codes(tiny_artifacts, tmp_path, capsys):
    """Full (untruncated) eval gates on |value - expect| <= tol: rc 0 when
    the measured number is pinned as expected, rc 1 when it is far off.
    Second run feeds the already-ported .npz back in (port skipped)."""
    import run_flagship_parity as rfp

    pt, h5 = tiny_artifacts
    npz = str(tmp_path / "ported.npz")
    rc = rfp.main([pt, h5, "--out-npz", npz, "--expect", "0.9", "--tol", "1.0"] + _SHRINK)
    assert rc == 0
    rec = json.loads(
        [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith('{"mode"')][-1]
    )
    assert rec["pass"] is True and rec["gated"] is True

    rc = rfp.main([npz, h5, "--expect", "0.9", "--tol", "1e-6"] + _SHRINK)
    assert rc == 1
    rec = json.loads(
        [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith('{"mode"')][-1]
    )
    assert rec["pass"] is False
    assert rec["ported_npz"] == npz  # .npz input skipped the port step


def test_mode_table_matches_published_numbers():
    """The four oracle rows carry the reference's published numbers."""
    import run_flagship_parity as rfp

    assert rfp.MODES["audioset"]["expect"] == 0.476
    assert rfp.MODES["esc50"]["expect"] == 0.967
    assert rfp.MODES["fsd50k"]["expect"] == 0.655
    assert rfp.MODES["openmic"]["expect"] == 0.85
    assert rfp.MODES["esc50"]["metric"] == "accuracy"
    assert {m["experiment"] for m in rfp.MODES.values()} == {
        "audioset", "esc50", "fsd50k", "openmic",
    }
