"""Offline prep plane: WAV decode/resample, streaming packer, and the
per-dataset driver scripts (ESC-50 / FSD50K / AudioSet) — the reference's
prepare_scripts rebuilt in-process (fsd50k/prepare_scripts/*,
audioset/prepare_scripts/create_h5pymp3_dataset.py, esc50/dataset.py's
librosa.load(sr=32000) + fold filter)."""

import csv
import os
import struct
import sys
import wave as wave_mod

import numpy as np
import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")
if SCRIPTS not in sys.path:
    sys.path.insert(0, SCRIPTS)


def _write_wav_pcm16(path, wave_f32, rate, channels=1):
    with wave_mod.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        q = (np.clip(wave_f32, -1, 1) * 32767.0).astype("<i2")
        w.writeframes(q.tobytes())


def _write_wav_float32(path, wave_f32, rate):
    """Minimal WAVE_FORMAT_IEEE_FLOAT writer (stdlib wave is PCM-only)."""
    data = np.asarray(wave_f32, "<f4").tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, rate, rate * 4, 4, 32))
        f.write(b"data" + struct.pack("<I", len(data)) + data)


def _write_wav_pcm24(path, wave_f32, rate):
    i32 = (np.clip(wave_f32, -1, 1) * 8388607.0).astype(np.int32)
    b = np.zeros((len(i32), 3), np.uint8)
    b[:, 0] = i32 & 0xFF
    b[:, 1] = (i32 >> 8) & 0xFF
    b[:, 2] = (i32 >> 16) & 0xFF
    data = b.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 3, 3, 24))
        f.write(b"data" + struct.pack("<I", len(data)) + data)


def _sine(n, freq, rate, amp=0.5):
    return (amp * np.sin(2 * np.pi * freq * np.arange(n) / rate)).astype(np.float32)


class TestWavDecode:
    def test_pcm16_roundtrip(self, tmp_path):
        from passt_tpu.data.prepare.wavdec import decode_wav

        x = _sine(4410, 440.0, 44100)
        p = tmp_path / "a.wav"
        _write_wav_pcm16(p, x, 44100)
        got, rate = decode_wav(str(p))
        assert rate == 44100 and got.dtype == np.float32
        # encode rounds at x*32767, decode divides by 32768: 2 LSB worst case
        np.testing.assert_allclose(got, x, atol=2.0 / 32767)

    def test_stereo_mixdown(self, tmp_path):
        """Multi-channel -> mean, librosa mono=True semantics."""
        from passt_tpu.data.prepare.wavdec import decode_wav

        left = _sine(1000, 300.0, 32000)
        right = _sine(1000, 700.0, 32000)
        inter = np.stack([left, right], axis=1).reshape(-1)
        p = tmp_path / "st.wav"
        _write_wav_pcm16(p, inter, 32000, channels=2)
        got, _ = decode_wav(str(p))
        np.testing.assert_allclose(got, (left + right) / 2, atol=2.0 / 32767)

    def test_float32_and_pcm24(self, tmp_path):
        from passt_tpu.data.prepare.wavdec import decode_wav

        x = _sine(2000, 550.0, 44100)
        pf = tmp_path / "f.wav"
        _write_wav_float32(pf, x, 44100)
        got, rate = decode_wav(str(pf))
        assert rate == 44100
        np.testing.assert_allclose(got, x, atol=1e-6)

        p24 = tmp_path / "p24.wav"
        _write_wav_pcm24(p24, x, 44100)
        got24, _ = decode_wav(str(p24))
        np.testing.assert_allclose(got24, x, atol=2.0 / 8388607)

    def test_rejects_non_wav(self, tmp_path):
        from passt_tpu.data.prepare.wavdec import decode_wav

        p = tmp_path / "x.wav"
        p.write_bytes(b"ID3\x04not a wav at all" * 4)
        with pytest.raises(ValueError):
            decode_wav(str(p))

    def test_wave_format_extensible_pcm16(self, tmp_path):
        """WAVE_FORMAT_EXTENSIBLE carrying plain PCM16 (the common export
        container for >16-bit / multichannel WAVs): the stdlib wave module
        rejects these before Python 3.12 ('unknown format: 65534'), so the
        chunk-walk decoder must handle them without it."""
        from passt_tpu.data.prepare.wavdec import decode_wav

        x = _sine(3000, 440.0, 44100)
        data = (np.clip(x, -1, 1) * 32767.0).astype("<i2").tobytes()
        # fmt: 16-byte base (tag 0xFFFE) + cbSize=22 extension whose
        # SubFormat GUID leads with the real format code (1 = PCM)
        guid = b"\x01\x00" + b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
        fmt = (
            struct.pack("<HHIIHH", 0xFFFE, 1, 44100, 44100 * 2, 2, 16)
            + struct.pack("<HHI", 22, 16, 0x4)
            + guid
        )
        p = tmp_path / "ext.wav"
        with open(p, "wb") as f:
            f.write(
                b"RIFF"
                + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
                + b"WAVE"
            )
            f.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
            f.write(b"data" + struct.pack("<I", len(data)) + data)
        got, rate = decode_wav(str(p))
        assert rate == 44100
        np.testing.assert_allclose(got, x, atol=2.0 / 32767)

    def test_truncated_final_frame(self, tmp_path):
        """A data-chunk size field larger than the bytes on disk (truncated
        download) clips to whole frames instead of crashing frombuffer."""
        from passt_tpu.data.prepare.wavdec import decode_wav

        left = _sine(100, 300.0, 32000)
        right = _sine(100, 700.0, 32000)
        inter = np.stack([left, right], axis=1).reshape(-1)
        p = tmp_path / "trunc.wav"
        _write_wav_pcm16(p, inter, 32000, channels=2)
        raw = p.read_bytes()
        p.write_bytes(raw[:-3])  # chop mid-frame; header still claims full size
        got, _ = decode_wav(str(p))
        assert len(got) == 99  # last (incomplete) frame dropped
        np.testing.assert_allclose(
            got, ((left + right) / 2)[:99], atol=2.0 / 32767
        )

    def test_rejects_non_pcm_integer_codec(self, tmp_path):
        """Integer widths require WAVE_FORMAT_PCM (code 1): a 16-bit frame
        of some compressed codec (e.g. ADPCM, code 2) must raise instead of
        being decoded as little-endian PCM garbage (ADVICE r4 #1). Float
        widths likewise require code 3 — fmt_code=1 bits=32 is int PCM,
        fmt_code=3 bits=16 is nonsense and must raise."""
        import struct as _s

        from passt_tpu.data.prepare.wavdec import decode_wav

        def write(path, fmt_code, bits, payload):
            with open(path, "wb") as f:
                f.write(b"RIFF" + _s.pack("<I", 36 + len(payload)) + b"WAVE")
                f.write(
                    b"fmt "
                    + _s.pack(
                        "<IHHIIHH", 16, fmt_code, 1, 32000,
                        32000 * bits // 8, bits // 8, bits,
                    )
                )
                f.write(b"data" + _s.pack("<I", len(payload)) + payload)

        payload = bytes(range(64)) * 4
        for fmt_code, bits in [(2, 16), (6, 16), (7, 16), (2, 32), (3, 16)]:
            p = tmp_path / f"bad_{fmt_code}_{bits}.wav"
            write(p, fmt_code, bits, payload)
            with pytest.raises(ValueError, match="unsupported WAV format"):
                decode_wav(str(p))

    def test_resample_44k_to_32k_tone(self):
        """Anti-aliased polyphase: a mid-band tone survives with the right
        frequency and near-unit amplitude (linear interp would attenuate)."""
        from passt_tpu.data.prepare.wavdec import resample

        x = resample(_sine(44100, 1000.0, 44100), 44100, 32000)
        assert abs(len(x) - 32000) <= 2
        ref = _sine(len(x), 1000.0, 32000)
        # compare away from filter edge effects
        np.testing.assert_allclose(x[500:-500], ref[500:-500], atol=5e-3)

    def test_resample_integer_stride(self):
        from passt_tpu.data.prepare.wavdec import resample

        x = np.arange(100, dtype=np.float32)
        np.testing.assert_array_equal(resample(x, 32000, 32000), x)
        np.testing.assert_array_equal(resample(x, 64000, 32000), x[::2])


class TestStreamingPacker:
    def test_matches_batch_packer_bytes(self, tmp_path):
        from passt_tpu.data.prepare import StreamingPacker, pack_bytes_hdf5

        h5py = pytest.importorskip("h5py")
        rng = np.random.default_rng(0)
        items = [
            (f"c{i}.mp3", rng.integers(0, 255, 50 + 7 * i, dtype=np.uint8).tobytes(),
             (rng.random(16) < 0.3).astype(np.uint8))
            for i in range(5)
        ]
        a, b = str(tmp_path / "a.h5"), str(tmp_path / "b.h5")
        pack_bytes_hdf5(a, items, lengths=[100 + i for i in range(5)])
        with StreamingPacker(b) as p:
            for i, (n, blob, t) in enumerate(items):
                p.add_bytes(n, blob, t, length_samples=100 + i)
        with h5py.File(a) as fa, h5py.File(b) as fb:
            for col in ("audio_name", "target", "length_samples"):
                np.testing.assert_array_equal(fa[col][:], fb[col][:])
            for i in range(5):
                np.testing.assert_array_equal(fa["mp3"][i], fb["mp3"][i])
            assert fb.attrs["sample_rate"] == 32000

    def test_matches_batch_packer_waveform(self, tmp_path):
        from passt_tpu.data.prepare import StreamingPacker, pack_waveform_hdf5

        h5py = pytest.importorskip("h5py")
        rng = np.random.default_rng(1)
        items = [
            (f"w{i}.wav", rng.standard_normal(200 + i).astype(np.float32) * 0.3,
             np.asarray(i, np.int64))
            for i in range(4)
        ]
        a, b = str(tmp_path / "a.h5"), str(tmp_path / "b.h5")
        pack_waveform_hdf5(a, items, packed_targets=False)
        with StreamingPacker(b, column="raw_i16", packed_targets=False) as p:
            for n, w, t in items:
                p.add_waveform(n, w, t)
        with h5py.File(a) as fa, h5py.File(b) as fb:
            for col in ("audio_name", "target", "length_samples"):
                np.testing.assert_array_equal(fa[col][:], fb[col][:])
            for i in range(4):
                np.testing.assert_array_equal(fa["raw_i16"][i], fb["raw_i16"][i])

    def test_column_guard_and_error_path(self, tmp_path):
        from passt_tpu.data.prepare import StreamingPacker

        with pytest.raises(ValueError, match="raw_i16"):
            with StreamingPacker(str(tmp_path / "x.h5"), column="mp3") as p:
                p.add_waveform("a", np.zeros(10, np.float32), np.zeros(4))
        # the file must be closed (not locked) after the error exit
        assert os.path.exists(tmp_path / "x.h5")


def _make_esc50_tree(tmp_path, n=8, rate=44100):
    """Tiny ESC-50-master layout: audio/ + meta/esc50.csv with 2 folds."""
    root = tmp_path / "ESC-50-master"
    (root / "audio").mkdir(parents=True)
    (root / "meta").mkdir()
    rows = []
    for i in range(n):
        fn = f"1-{i}-A-{i % 4}.wav"
        _write_wav_pcm16(root / "audio" / fn, _sine(rate * 2, 200.0 + 50 * i, rate), rate)
        rows.append({"filename": fn, "fold": str(1 + i % 2), "target": str(i % 4)})
    with open(root / "meta" / "esc50.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["filename", "fold", "target"])
        w.writeheader()
        w.writerows(rows)
    return str(root), rows


class TestPrepareESC50:
    def test_pack_fold_raw(self, tmp_path):
        pytest.importorskip("h5py")
        from prepare_esc50 import pack_fold

        from passt_tpu.data.datasets import HDF5AudioDataset
        from passt_tpu.data.prepare.metadata import parse_esc50_meta

        root, rows = _make_esc50_tree(tmp_path)
        out = tmp_path / "out"
        out.mkdir()
        train_h5, test_h5 = pack_fold(root, str(out), fold=1, workers=2)

        exp_train, exp_labels = parse_esc50_meta(
            os.path.join(root, "meta", "esc50.csv"), fold=1, train=True
        )
        ds = HDF5AudioDataset(
            train_h5, classes_num=50, clip_length=None, packed_targets=False
        )
        assert len(ds) == len(exp_train) == sum(1 for r in rows if r["fold"] != "1")
        wave, name, target = ds[0]
        assert name == exp_train[0] and int(target) == int(exp_labels[0])
        # 2 s at 44.1 kHz -> 2 s at 32 kHz, energy preserved (tone survives)
        assert abs(len(wave) - 64000) <= 4
        assert 0.3 < np.sqrt((wave**2).mean()) < 0.4  # 0.5-amp sine rms=0.354

        # fold exclusivity: test container holds exactly the fold-1 rows
        ds_test = HDF5AudioDataset(
            test_h5, classes_num=50, clip_length=None, packed_targets=False
        )
        test_names = {ds_test[i][1] for i in range(len(ds_test))}
        assert test_names == {r["filename"] for r in rows if r["fold"] == "1"}
        assert test_names.isdisjoint({ds[i][1] for i in range(len(ds))})

    def test_pack_fold_mp3(self, tmp_path):
        pytest.importorskip("h5py")
        from passt_tpu.data import native
        from passt_tpu.data.prepare import mp3enc

        if not (mp3enc.available() and native.mp3_available()):
            pytest.skip("mp3 encode/decode stack unavailable")
        from prepare_esc50 import pack_fold

        from passt_tpu.data.datasets import HDF5AudioDataset

        root, _ = _make_esc50_tree(tmp_path, n=4)
        out = tmp_path / "out"
        out.mkdir()
        train_h5, _ = pack_fold(root, str(out), fold=1, fmt="mp3", workers=2)
        ds = HDF5AudioDataset(
            train_h5, classes_num=50, clip_length=None, packed_targets=False
        )
        wave, _, _ = ds[0]
        assert 0.25 < np.sqrt((wave**2).mean()) < 0.45  # decoded tone energy


def _make_fsd50k_tree(tmp_path, n_dev=6, n_eval=3, rate=44100):
    root = tmp_path / "FSD50K"
    gt = root / "FSD50K.ground_truth"
    gt.mkdir(parents=True)
    (root / "FSD50K.dev_audio").mkdir()
    (root / "FSD50K.eval_audio").mkdir()
    labels = ["Bark", "Meow", "Siren"]
    with open(gt / "vocabulary.csv", "w", newline="") as f:
        for i, lb in enumerate(labels):
            f.write(f"{i},{lb},/m/0{i}\n")
    with open(gt / "dev.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["fname", "labels", "mids", "split"])
        w.writeheader()
        for i in range(n_dev):
            fn = str(10000 + i)
            # variable lengths: 0.5 s .. 1.75 s
            _write_wav_pcm16(
                root / "FSD50K.dev_audio" / f"{fn}.wav",
                _sine(int(rate * (0.5 + 0.25 * i)), 300.0 + 40 * i, rate), rate,
            )
            w.writerow({
                "fname": fn,
                "labels": ",".join([labels[i % 3]] + ([labels[(i + 1) % 3]] if i % 2 else [])),
                "mids": "", "split": "train" if i < 4 else "val",
            })
    with open(gt / "eval.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["fname", "labels", "mids"])
        w.writeheader()
        for i in range(n_eval):
            fn = str(20000 + i)
            _write_wav_pcm16(
                root / "FSD50K.eval_audio" / f"{fn}.wav",
                _sine(rate, 500.0 + 40 * i, rate), rate,
            )
            w.writerow({"fname": fn, "labels": labels[i % 3], "mids": ""})
    return str(root), labels


class TestPrepareFSD50K:
    def test_pack_splits(self, tmp_path):
        h5py = pytest.importorskip("h5py")
        from passt_tpu.data import native
        from passt_tpu.data.prepare import mp3enc

        if not (mp3enc.available() and native.mp3_available()):
            pytest.skip("mp3 encode/decode stack unavailable")
        from prepare_fsd50k import pack_split

        from passt_tpu.data.datasets import HDF5AudioDataset

        root, labels = _make_fsd50k_tree(tmp_path)
        out = tmp_path / "out"
        out.mkdir()
        train = pack_split(root, str(out), "train", workers=2)
        valid = pack_split(root, str(out), "valid", workers=2)
        evalc = pack_split(root, str(out), "eval", workers=2)

        ds = HDF5AudioDataset(train, classes_num=3, clip_length=None)
        assert len(ds) == 4
        dsv = HDF5AudioDataset(valid, classes_num=3, clip_length=None)
        assert len(dsv) == 2
        dse = HDF5AudioDataset(evalc, classes_num=3, clip_length=None)
        assert len(dse) == 3

        # multi-hot targets from vocabulary order; variable lengths recorded
        wave, name, target = ds[1]  # i=1: labels[1] + labels[2]
        assert name == "10001.wav"
        np.testing.assert_array_equal(target, [0, 1, 1])
        with h5py.File(train) as f:
            lens = f["length_samples"][:]
        # 0.5 s + 0.25 s*i at 32 kHz
        assert [abs(int(l) - int(32000 * (0.5 + 0.25 * i))) <= 2
                for i, l in enumerate(lens)] == [True] * 4
        # decoded mp3 length tracks the recorded length (mp3 pads to whole
        # 1152-sample frames plus the lame encoder delay: ~3 frames of slack)
        assert abs(len(wave) - lens[1]) < 4 * 1152


class TestPrepareAudioSet:
    def test_pack_split_skips_missing(self, tmp_path):
        pytest.importorskip("h5py")
        from passt_tpu.data import native
        from passt_tpu.data.prepare import mp3enc

        if not (mp3enc.available() and native.mp3_available()):
            pytest.skip("mp3 encode/decode stack unavailable")
        from prepare_audioset import pack_split

        from passt_tpu.data.datasets import HDF5AudioDataset

        meta = tmp_path / "metadata"
        meta.mkdir()
        with open(meta / "class_labels_indices.csv", "w", newline="") as f:
            f.write("index,mid,display_name\n0,/m/0a,A\n1,/m/0b,B\n2,/m/0c,C\n")
        # 3 segments; only 2 mp3s exist on disk (downloads are incomplete)
        with open(meta / "balanced_train_segments.csv", "w") as f:
            f.write("# head\n# head\n# head\n")
            f.write('id_aaa, 0.000, 10.000, "/m/0a,/m/0c"\n')
            f.write('id_bbb, 5.000, 15.000, "/m/0b"\n')
            f.write('id_gone, 0.000, 10.000, "/m/0a"\n')
        mp3_root = tmp_path / "mp3" / "balanced_train_segments"
        mp3_root.mkdir(parents=True)
        for ytid in ("id_aaa", "id_bbb"):
            blob = mp3enc.encode_mp3(_sine(32000, 400.0, 32000), 32000)
            (mp3_root / f"Y{ytid}.mp3").write_bytes(blob)

        out = tmp_path / "out"
        out.mkdir()
        h5 = pack_split(
            str(tmp_path / "mp3"), str(meta), "balanced_train_segments", str(out)
        )
        ds = HDF5AudioDataset(h5, classes_num=3, clip_length=1)
        assert len(ds) == 2
        wave, name, target = ds[0]
        assert name == "Yid_aaa.mp3"
        np.testing.assert_array_equal(target, [1, 0, 1])
        np.testing.assert_array_equal(ds[1][2], [0, 1, 0])
        assert len(wave) == 32000
