"""Offline-prep metadata parsing tests (synthetic CSVs)."""

import os

import numpy as np
import pytest

from passt_tpu.data.prepare.metadata import (
    load_class_labels_indices,
    load_fsd50k_vocabulary,
    openmic_targets,
    parse_audioset_segments_csv,
    parse_esc50_meta,
    parse_fsd50k_csv,
)


def test_audioset_csv(tmp_path):
    labels = tmp_path / "class_labels_indices.csv"
    labels.write_text("index,mid,display_name\n0,/m/09x0r,Speech\n1,/m/05zppz,Male\n")
    seg = tmp_path / "balanced.csv"
    seg.write_text(
        "# comment\n# another\n"
        '--aE2O5G5WE, 0.000, 10.000, "/m/09x0r,/m/05zppz"\n'
        '--aaaaaaaaa, 1.000, 11.000, "/m/09x0r"\n'
    )
    m2i = load_class_labels_indices(str(labels))
    files, y = parse_audioset_segments_csv(str(seg), m2i, num_classes=4)
    assert files == ["--aE2O5G5WE_0_10000.wav", "--aaaaaaaaa_1000_11000.wav"]
    np.testing.assert_array_equal(y, [[1, 1, 0, 0], [1, 0, 0, 0]])


def test_fsd50k_csv(tmp_path):
    vocab = tmp_path / "vocabulary.csv"
    vocab.write_text("0,Bark,/m/05tny_\n1,Meow,/m/07qrkrw\n")
    dev = tmp_path / "dev.csv"
    dev.write_text(
        "fname,labels,mids,split\n"
        "1001,Bark,/m/05tny_,train\n"
        '1002,"Bark,Meow","/m/05tny_,/m/07qrkrw",val\n'
    )
    v = load_fsd50k_vocabulary(str(vocab))
    files, y = parse_fsd50k_csv(str(dev), v, split="train")
    assert files == ["1001.wav"]
    np.testing.assert_array_equal(y, [[1, 0]])
    files, y = parse_fsd50k_csv(str(dev), v, split="val")
    assert files == ["1002.wav"]
    np.testing.assert_array_equal(y, [[1, 1]])


def test_esc50_meta(tmp_path):
    meta = tmp_path / "esc50.csv"
    meta.write_text(
        "filename,fold,target,category\n"
        "a.wav,1,0,dog\nb.wav,2,5,cat\nc.wav,1,3,rain\nd.wav,3,5,cat\n"
    )
    train_f, train_y = parse_esc50_meta(str(meta), fold=1, train=True)
    test_f, test_y = parse_esc50_meta(str(meta), fold=1, train=False)
    assert train_f == ["b.wav", "d.wav"] and list(train_y) == [5, 5]
    assert test_f == ["a.wav", "c.wav"] and list(test_y) == [0, 3]


def test_openmic_targets():
    y_true = np.asarray([[0.9, 0.1], [0.2, 0.8]])
    y_mask = np.asarray([[1, 0], [1, 1]])
    t = openmic_targets(y_true, y_mask)
    assert t.shape == (2, 4)
    np.testing.assert_allclose(t[0], [0.9, 0.1, 1, 0])


def test_transcode_tool_with_stub_ffmpeg(tmp_path, monkeypatch):
    """scripts/transcode_to_mp3.py reproduces the reference's ffmpeg
    contract (convert_to_mp3.py:30): flags, 32 kHz, .wav -> .mp3 naming.
    ffmpeg itself is stubbed (none in this image)."""
    import os
    import stat
    import subprocess
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import transcode_to_mp3 as t

    cmd = t.ffmpeg_cmd("/a/x.wav", "/b/x.mp3", 32000)
    assert cmd[0] == "ffmpeg" and "-n" in cmd and "mp3" in cmd
    assert cmd[cmd.index("-ar") + 1] == "32000"
    assert cmd[cmd.index("-i") + 1] == "/a/x.wav" and cmd[-1] == "/b/x.mp3"

    # stub ffmpeg: records its argv and writes the output file
    bindir = tmp_path / "bin"
    bindir.mkdir()
    stub = bindir / "ffmpeg"
    stub.write_text(
        "#!/bin/sh\n"
        f'echo "$@" >> {tmp_path}/calls.txt\n'
        'for last; do :; done\n'
        'echo fake > "$last"\n'
    )
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    src = tmp_path / "audios" / "balanced_train_segments"
    src.mkdir(parents=True)
    for name in ("a.wav", "b.wav"):
        (src / name).write_bytes(b"RIFF")
    out = tmp_path / "mp3s"
    rc = t.transcode_tree(
        str(tmp_path / "audios"), str(out),
        ["balanced_train_segments"], workers=2, sample_rate=32000,
    )
    assert rc == 0
    made = sorted(p.name for p in (out / "balanced_train_segments").glob("*.mp3"))
    assert made == ["a.mp3", "b.mp3"]
    calls = (tmp_path / "calls.txt").read_text()
    assert "-codec:a mp3 -ar 32000" in calls


def test_transcode_tool_missing_ffmpeg(tmp_path, monkeypatch):
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import transcode_to_mp3 as t

    monkeypatch.setenv("PATH", str(tmp_path))  # nothing on PATH
    with pytest.raises(SystemExit, match="ffmpeg not found"):
        t.transcode_tree(str(tmp_path), str(tmp_path / "o"), [""], 1, 32000)


def test_openmic_end_to_end_prep(tmp_path):
    """The OpenMIC prep chain (scripts/prepare_openmic.py) minus the
    network download: real .ogg files -> in-process vorbis decode ->
    resample to 32 kHz -> libmp3lame encode -> packed [labels || mask]
    HDF5 -> readable by the OpenMIC dataset config (reference
    openmic/prepare_scripts/download_preprocess.py, ffmpeg-free here)."""
    import shutil
    import sys

    from passt_tpu.data.prepare import mp3enc, oggdec
    from passt_tpu.data import native

    ogg_src = "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.ogg"
    if not (oggdec.available() and mp3enc.available() and native.mp3_available()):
        pytest.skip("vorbis/lame/mpg123 stack not complete on this host")
    if not os.path.isfile(ogg_src):
        pytest.skip("no sample ogg on this image")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import prepare_openmic

    # synthetic extracted dataset layout
    root = tmp_path / "openmic-2018"
    keys = ["aaa001", "bbb002", "ccc003"]
    rng = np.random.default_rng(0)
    y_true = rng.uniform(size=(3, 20)).astype(np.float32)
    y_mask = rng.uniform(size=(3, 20)) < 0.5
    for k in keys:
        d = root / "audio" / k[:3]
        d.mkdir(parents=True, exist_ok=True)
        shutil.copy(ogg_src, d / f"{k}.ogg")
    np.savez(
        root / "openmic-2018.npz",
        sample_key=np.array(keys),
        Y_true=y_true,
        Y_mask=y_mask,
    )
    (root / "partitions").mkdir()
    (root / "partitions" / "split01_train.csv").write_text("\n".join(keys[:2]) + "\n")

    out = tmp_path / "openmic_train.h5"
    n = prepare_openmic.pack_split(
        str(root), str(root / "partitions" / "split01_train.csv"), str(out)
    )
    assert n == 2

    from passt_tpu.data import HDF5AudioDataset

    ds = HDF5AudioDataset(
        str(out), classes_num=40, clip_length=2, packed_targets=False,
        sample_rate=32000,
    )
    wave, name, target = ds[0]
    assert name == "aaa001.mp3"
    assert wave.shape == (64000,) and np.abs(wave).max() > 0.01
    assert target.shape == (40,)
    np.testing.assert_allclose(target[:20], y_true[0], atol=1e-6)
    np.testing.assert_array_equal(target[20:], y_mask[0].astype(np.float32))


def test_pack_names_longer_than_64_bytes_not_truncated(tmp_path):
    """The audio_name column is sized to the longest name — a fixed S64
    dtype silently truncated longer names (numpy drops overflow bytes)."""
    import h5py

    from passt_tpu.data.prepare import pack_waveform_hdf5

    long_name = "a" * 80 + ".wav"
    t = np.zeros(16, np.float32)
    t[1] = 1
    out = str(tmp_path / "long.h5")
    pack_waveform_hdf5(
        out,
        [(long_name, np.zeros(100, np.float32), t), ("short.wav", np.zeros(100, np.float32), t)],
        packed_targets=False,
    )
    with h5py.File(out, "r") as f:
        names = [n.decode() for n in f["audio_name"][:]]
    assert names == [long_name, "short.wav"]
