"""mp3 ingestion tests: the native libmpg123-backed decoder vs an
INDEPENDENT decoder (pygame/SDL ships its own mp3 stack), plus the
HDF5-mp3-column end-to-end path — the reference's actual container format
(reference decode_mp3, audioset/dataset.py:55-70; every published
AudioSet/FSD50K/OpenMIC HDF5 stores mp3 bytes)."""

import os
import subprocess

import numpy as np
import pytest

from passt_tpu.data import native
from passt_tpu.data.datasets import HDF5AudioDataset, pad_or_truncate
from passt_tpu.data.prepare.pack_hdf5 import pack_bytes_hdf5

# Real-world mp3 files shipped with this image (MPEG-2.5 mono 11025 Hz and
# MPEG-2 mono 22050 Hz with a leading ID3v2 tag).
MP3_MUSIC = "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.mp3"
MP3_ID3 = "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3"


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    subprocess.run(["make", "-C", "native", "-s"], check=True, cwd="/root/repo")
    lib = native.load(n_threads=2)
    assert lib is not None
    if not native.mp3_available():
        pytest.skip("libmpg123 not on this machine")
    return lib


def _pygame_decode(path: str, rate: int) -> np.ndarray:
    """Independent oracle: pygame/SDL_mixer bundles its own mp3 decoder."""
    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    pygame = pytest.importorskip("pygame")
    pygame.mixer.quit()
    pygame.mixer.init(frequency=rate, size=-16, channels=1)
    try:
        arr = pygame.sndarray.array(pygame.mixer.Sound(path))
    finally:
        # SDL's audio thread must be torn down or the pytest process hangs
        # at interpreter exit.
        pygame.mixer.quit()
    return arr.reshape(-1).astype(np.float32) / 32768.0


@pytest.mark.skipif(not os.path.exists(MP3_MUSIC), reason="sample file missing")
def test_decode_matches_independent_decoder():
    wav, rate = native.decode_mp3(open(MP3_MUSIC, "rb").read())
    assert rate == 11025
    ref = _pygame_decode(MP3_MUSIC, rate)
    assert len(wav) == len(ref)  # same gapless trim, zero lag
    # pygame's path quantizes to int16, so half-LSB (1.6e-5) is the floor
    assert np.abs(wav - ref).max() < 2e-4
    assert np.corrcoef(wav, ref)[0, 1] > 0.99999


@pytest.mark.skipif(not os.path.exists(MP3_ID3), reason="sample file missing")
def test_decode_skips_id3_tag():
    wav, rate = native.decode_mp3(open(MP3_ID3, "rb").read())
    assert rate == 22050
    assert len(wav) > 20000  # ~1.2 s of (silent) audio frames


def test_decode_garbage_raises():
    with pytest.raises(ValueError, match="mp3 decode failed"):
        native.decode_mp3(b"\x00" * 4096)


def test_batch_equals_single_decode():
    data = open(MP3_MUSIC, "rb").read()
    single, rate = native.decode_mp3(data)
    clip = len(single) + 1000  # pad tail so the full decode is visible
    out, rates, lens = native.assemble_mp3_batch([data, data], clip)
    assert (rates == rate).all() and (lens == len(single)).all()
    for b in range(2):
        np.testing.assert_array_equal(out[b, : len(single)], single)
        assert (out[b, len(single) :] == 0).all()


def test_hdf5_mp3_column_end_to_end(tmp_path):
    """Pack real mp3 bytes into the reference container layout and read it
    back through HDF5AudioDataset — the full decode-at-train-time path."""
    data = open(MP3_MUSIC, "rb").read()
    target = np.zeros(16, dtype=np.float32)
    target[3] = 1.0
    path = str(tmp_path / "mp3set.h5")
    n = pack_bytes_hdf5(
        path,
        [("a.mp3", data, target), ("b.mp3", data, target)],
        column="mp3",
        sample_rate=11025,
        packed_targets=False,
    )
    assert n == 2
    ds = HDF5AudioDataset(
        path,
        sample_rate=11025,
        classes_num=16,
        clip_length=2,  # 22050 samples: shorter than the 80064-sample clip
        packed_targets=False,
    )
    assert ds.audio_column == "mp3"
    wave, name, tgt = ds[0]
    assert name == "a.mp3"
    assert wave.shape == (22050,) and wave.dtype == np.float32
    full, _ = native.decode_mp3(data)
    np.testing.assert_array_equal(wave, pad_or_truncate(full, 22050))
    np.testing.assert_array_equal(tgt, target)


def test_native_builder_mp3_matches_numpy_path(tmp_path):
    """NativeBatchBuilder on an mp3 column == the per-item numpy chain
    bitwise (augmentation off)."""
    from passt_tpu.data.native_loader import NativeBatchBuilder

    data = open(MP3_MUSIC, "rb").read()
    tgts = [np.eye(8, dtype=np.float32)[i % 8] for i in range(4)]
    path = str(tmp_path / "mp3set.h5")
    pack_bytes_hdf5(
        path,
        [(f"c{i}.mp3", data, tgts[i]) for i in range(4)],
        column="mp3",
        sample_rate=11025,
        packed_targets=False,
    )
    ds = HDF5AudioDataset(
        path, sample_rate=11025, classes_num=8, clip_length=3, packed_targets=False
    )
    builder = NativeBatchBuilder(ds, seed=5)
    batch = builder([0, 2, 1])
    assert batch["wave"].shape == (3, 3 * 11025)
    for row, idx in zip(batch["wave"], [0, 2, 1]):
        wave, _, tgt = ds[idx]
        np.testing.assert_array_equal(row, wave)
    np.testing.assert_array_equal(batch["target"], np.stack([tgts[0], tgts[2], tgts[1]]))


def test_native_builder_rejects_rate_mismatch(tmp_path):
    data = open(MP3_MUSIC, "rb").read()  # 11025 Hz
    path = str(tmp_path / "bad.h5")
    pack_bytes_hdf5(
        path,
        [("x.mp3", data, np.zeros(4, np.float32))],
        column="mp3",
        packed_targets=False,
    )
    from passt_tpu.data.native_loader import NativeBatchBuilder

    ds = HDF5AudioDataset(
        path, sample_rate=32000, classes_num=4, clip_length=1, packed_targets=False
    )
    builder = NativeBatchBuilder(ds)
    with pytest.raises(ValueError, match="native rate"):
        builder([0])


def test_truncated_mp3_partial_decode_reports_rate():
    """A clip cut mid-stream (truncated download — common in AudioSet
    scrapes) decodes partially; the contract is: positive return => BOTH
    samples and a valid rate (the rate was previously left uninitialized
    on the mid-stream-error path, feeding garbage into the batch path's
    rate check)."""
    data = open(MP3_MUSIC, "rb").read()
    full, full_rate = native.decode_mp3(data)
    cut = data[: len(data) // 3]
    wav, rate = native.decode_mp3(cut)
    assert rate == full_rate  # the format was announced before the cut
    assert 0 < len(wav) < len(full)
    assert np.isfinite(wav).all()


def test_lame_encoder_roundtrip():
    """In-process libmp3lame encoder (prepare/mp3enc.py) -> native
    libmpg123 decode: rate preserved, waveform reconstructed (xcorr-aligned
    correlation > 0.999 for a band-limited signal)."""
    from passt_tpu.data.prepare import mp3enc

    if not mp3enc.available():
        pytest.skip("libmp3lame not on this host")
    from passt_tpu.data import native

    if not native.mp3_available():
        pytest.skip("native mp3 decode unavailable")
    t = np.arange(32000 * 2) / 32000.0
    wave = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    blob = mp3enc.encode_mp3(wave, 32000)
    assert len(blob) > 10000
    dec, rate = native.decode_mp3(blob)
    assert rate == 32000
    # The finalized LAME/Info tag (round 5) carries the encoder
    # delay/padding, so libmpg123 gapless-trims: EXACT length, ZERO lag —
    # the same contract reference ffmpeg-made containers satisfy.
    assert len(dec) == len(wave)
    # zero-lag alignment (a lag-argmax is ambiguous on a periodic sine):
    # the decoded signal must correlate >0.999 with NO shift applied
    n = 32000
    corr = np.corrcoef(dec[:n], wave[:n])[0, 1]
    assert corr > 0.999


def test_native_two_container_mp3_chain(tmp_path):
    """The ACTUAL flagship shape: TWO mp3 containers (balanced+unbalanced),
    fused C++ decode+assembly, global-index routing — bit-identical to the
    numpy ConcatDataset chain with augmentation off."""
    from passt_tpu.data import ConcatDataset, HDF5AudioDataset, native
    from passt_tpu.data.native_loader import NativeBatchBuilder
    from passt_tpu.data.pipeline import default_collate
    from passt_tpu.data.prepare import mp3enc, pack_bytes_hdf5

    if not (native.mp3_available() and mp3enc.available()):
        pytest.skip("mp3 encode/decode stack unavailable")

    rng = np.random.default_rng(3)

    def container(path, n, seed):
        items = []
        for i in range(n):
            w = (np.random.default_rng(seed + i).standard_normal(32000) * 0.1).astype(
                np.float32
            )
            t = np.zeros(16)
            t[i % 16] = 1
            items.append((f"s{seed}_{i}.mp3", mp3enc.encode_mp3(w, 32000), t))
        pack_bytes_hdf5(str(path), items, column="mp3", sample_rate=32000)
        return HDF5AudioDataset(str(path), classes_num=16, clip_length=1)

    ds1 = container(tmp_path / "bal.h5", 6, 100)
    ds2 = container(tmp_path / "unbal.h5", 9, 200)
    cat = ConcatDataset([ds1, ds2])
    builder = NativeBatchBuilder([ds1, ds2], seed=0, num_workers=2)
    idxs = [0, 7, 5, 14, 2, 6]  # interleaved across the boundary (6)
    nat = builder(idxs)
    ref = default_collate([cat[i] for i in idxs])
    np.testing.assert_array_equal(nat["wave"], ref["wave"])
    np.testing.assert_array_equal(nat["target"], ref["target"])
    assert nat["name"] == ref["name"]
