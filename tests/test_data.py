"""Data-layer tests: HDF5 container round trip, augmentation semantics,
wavmix, the class-balanced weighted sampler with rank sharding + epoch
reseed, and the loader/prefetcher."""

import os

import numpy as np
import pytest

from passt_tpu.data import (
    ConcatDataset,
    DataLoader,
    HDF5AudioDataset,
    MapDataset,
    SequentialSampler,
    ShuffleSampler,
    WavMixDataset,
    WeightedEpochSampler,
    class_balanced_sample_weights,
    pad_or_truncate,
    random_crop,
    stride_resample,
)
from passt_tpu.data.prepare import pack_waveform_hdf5


@pytest.fixture()
def synth_hdf5(tmp_path, rng_np):
    path = str(tmp_path / "train.h5")
    items = []
    for i in range(20):
        t = rng_np.uniform(1.0, 3.0)  # 1-3 s clips
        wave = (rng_np.standard_normal(int(32000 * t)) * 0.1).astype(np.float32)
        target = np.zeros(16)
        target[i % 16] = 1
        if i % 3 == 0:
            target[(i + 5) % 16] = 1
        items.append((f"clip_{i:03d}.wav", wave, target))
    pack_waveform_hdf5(path, items, packed_targets=True)
    return path


def test_hdf5_roundtrip(synth_hdf5):
    ds = HDF5AudioDataset(synth_hdf5, classes_num=16, clip_length=2)
    assert len(ds) == 20
    wave, name, target = ds[0]
    assert name == "clip_000.wav"
    assert wave.shape == (64000,) and wave.dtype == np.float32
    assert target.shape == (16,) and target[0] == 1.0
    # int16 quantization bound
    assert np.abs(wave).max() <= 1.0


def test_pad_truncate_and_crop(rng_np):
    x = rng_np.standard_normal(100).astype(np.float32)
    assert len(pad_or_truncate(x, 150)) == 150
    assert pad_or_truncate(x, 150)[120] == 0.0
    np.testing.assert_array_equal(pad_or_truncate(x, 50), x[:50])
    rng = np.random.default_rng(0)
    c = random_crop(x, 50, rng)
    assert len(c) == 50
    # crop must be a contiguous window of x
    starts = [i for i in range(51) if np.array_equal(x[i : i + 50], c)]
    assert len(starts) == 1


def test_stride_resample():
    x = np.arange(32000, dtype=np.float32)
    np.testing.assert_array_equal(stride_resample(x, 16000), x[::2])
    np.testing.assert_array_equal(stride_resample(x, 8000), x[::4])
    with pytest.raises(ValueError):
        stride_resample(x, 44100)


def test_wavmix(synth_hdf5):
    base = HDF5AudioDataset(synth_hdf5, classes_num=16, clip_length=2)
    ds = WavMixDataset(base, rate=1.0, seed=1)
    wave, name, target = ds[0]
    w0, _, t0 = base[0]
    assert wave.shape == w0.shape
    assert not np.array_equal(wave, w0)  # always mixed at rate=1
    assert abs(wave.mean()) < 1e-6  # mean-centered
    # targets became soft
    assert ((target > 0) & (target < 1)).any() or (target == t0).all()
    ds_off = WavMixDataset(base, rate=0.0)
    w_off, _, _ = ds_off[0]
    np.testing.assert_array_equal(w_off, w0)


def test_concat_and_map(synth_hdf5):
    a = HDF5AudioDataset(synth_hdf5, classes_num=16, clip_length=2)
    b = HDF5AudioDataset(synth_hdf5, classes_num=16, clip_length=2)
    cat = ConcatDataset([a, b])
    assert len(cat) == 40
    np.testing.assert_array_equal(cat[25][0], b[5][0])
    doubled = MapDataset(cat, lambda it: (it[0] * 2, it[1], it[2]))
    np.testing.assert_allclose(doubled[3][0], cat[3][0] * 2)


def test_class_balanced_weights():
    targets = np.zeros((6, 3))
    targets[0:4, 0] = 1  # frequent class
    targets[4, 1] = 1  # rare class
    targets[5, [0, 1]] = 1
    w = class_balanced_sample_weights(targets, offset=1)
    # rare-class samples weigh more
    assert w[4] > w[0]
    # multi-label sample sums both class weights
    np.testing.assert_allclose(w[5], w[0] + w[4])
    # reference formula: 1000/(offset + freq)
    np.testing.assert_allclose(w[0], 1000.0 / 6.0)


def test_weighted_epoch_sampler_rank_sharding():
    rng = np.random.default_rng(0)
    weights = rng.uniform(0.1, 1.0, size=1000)
    samplers = [
        WeightedEpochSampler(weights, epoch_len=100, num_replicas=4, rank=r, seed=7)
        for r in range(4)
    ]
    for s in samplers:
        s.set_epoch(3)
    parts = [list(s) for s in samplers]
    # disjoint slices covering exactly the same epoch draw
    merged = []
    for i in range(max(len(p) for p in parts)):
        for p in parts:
            if i < len(p):
                merged.append(p[i])
    single = WeightedEpochSampler(weights, epoch_len=100, seed=7)
    single.set_epoch(3)
    assert merged == list(single)
    # without replacement: no duplicate indices in the epoch
    assert len(set(merged)) == len(merged) == 100
    # epoch reseed changes the draw; same epoch reproduces it
    single.set_epoch(4)
    other = list(single)
    assert other != merged
    single.set_epoch(3)
    assert list(single) == merged  # reproducible for the same epoch


def test_weighted_sampler_bias():
    """Heavier weights must be drawn more often across epochs."""
    weights = np.ones(100)
    weights[:10] = 20.0
    s = WeightedEpochSampler(weights, epoch_len=50, seed=0)
    counts = np.zeros(100)
    for e in range(60):
        s.set_epoch(e)
        for i in s:
            counts[i] += 1
    assert counts[:10].mean() > counts[10:].mean() * 2


def test_dataloader_and_prefetch(synth_hdf5):
    ds = HDF5AudioDataset(synth_hdf5, classes_num=16, clip_length=2)
    dl = DataLoader(ds, batch_size=6, sampler=SequentialSampler(len(ds)), prefetch=2)
    batches = list(iter(dl))
    assert len(batches) == 4  # 20/6 -> 3 full + 1 partial
    assert batches[0]["wave"].shape == (6, 64000)
    assert batches[0]["target"].shape == (6, 16)
    assert batches[-1]["wave"].shape[0] == 2
    assert len(dl) == 4
    # shuffle sampler: epoch changes order deterministically
    sh = ShuffleSampler(20, seed=3)
    sh.set_epoch(0)
    e0 = list(sh)
    sh.set_epoch(1)
    e1 = list(sh)
    sh.set_epoch(0)
    assert list(sh) == e0 and e0 != e1


def test_prefetcher_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    from passt_tpu.data import Prefetcher

    it = Prefetcher(gen(), depth=1)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_cached_dataset(tmp_path, synth_hdf5):
    from passt_tpu.data import CachedDataset

    base = HDF5AudioDataset(synth_hdf5, classes_num=16, clip_length=2)
    cached = CachedDataset(base, str(tmp_path / "cache"))
    w1, n1, t1 = cached[3]  # miss -> writes
    w2, n2, t2 = cached[3]  # hit -> reads
    np.testing.assert_array_equal(w1, w2)
    assert n1 == n2
    np.testing.assert_array_equal(t1, t2)
    import os

    # pre-set_epoch sentinel key: an epoch-dependent chain's state before
    # set_epoch differs from after set_epoch(0), so "s0" must not be shared
    assert os.path.exists(str(tmp_path / "cache" / "sinit_3.npz"))


def test_extra_ramp_functions():
    from passt_tpu.train import (
        cosine_rampdown,
        exp_rampdown,
        exp_warmup,
        linear_rampup,
        pseudo_rampup,
    )

    assert pseudo_rampup(10, 20)(5) == 0.0
    assert pseudo_rampup(10, 20)(15) == 0.5
    assert pseudo_rampup(10, 20)(25) == 1.0
    assert linear_rampup(10)(5) == 0.5 and linear_rampup(10)(20) == 1.0
    assert exp_rampdown(10, 100)(50) == 1.0 and exp_rampdown(10, 100)(99) < 0.2
    assert cosine_rampdown(10, 100)(50) == 1.0
    cd = cosine_rampdown(10, 100)
    assert cd(95) > cd(99) > 0.0  # monotone tail (reaches 0 at ep=rampdown)
    w = exp_warmup(5, 10, 100)
    assert w(0) < 0.1 and abs(w(50) - 1.0) < 1e-9 and w(99) < 0.2


def test_folder_dataset(tmp_path, rng_np):
    import wave as wavemod

    from passt_tpu.data import FolderDataset

    for i in range(3):
        x = (rng_np.standard_normal(16000) * 3000).astype(np.int16)
        with wavemod.open(str(tmp_path / f"a{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(32000)
            w.writeframes(x.tobytes())
    ds = FolderDataset(str(tmp_path), num_classes=8, clip_length=1)
    assert len(ds) == 3
    wave, name, target = ds[0]
    assert wave.shape == (32000,) and name == "a0.wav"
    assert target.shape == (8,) and (target == 0).all()
    ds2 = FolderDataset(str(tmp_path), num_classes=8, labels={"a1.wav": np.eye(8)[2]})
    assert ds2[1][2][2] == 1.0
    with pytest.raises(FileNotFoundError):
        FolderDataset(str(tmp_path / "empty"))


def test_prefetcher_stop_releases_worker():
    import threading
    import time as _time

    from passt_tpu.data import Prefetcher

    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield i

    it = Prefetcher(gen(), depth=1)
    assert next(it) == 0
    it.stop()
    deadline = _time.time() + 2.0
    while it.thread.is_alive() and _time.time() < deadline:
        _time.sleep(0.01)
    assert not it.thread.is_alive()  # worker exited, not blocked on put
    assert len(produced) < 100  # and it did not drain the source


# --------------------------------------------------------------------------
# Parallel workers + native batch assembly
# --------------------------------------------------------------------------
def test_dataloader_workers_deterministic(synth_hdf5):
    """Item augmentation is a pure function of (epoch seed, index), so
    worker count/scheduling never changes the produced batches."""
    def batches(num_workers):
        ds = HDF5AudioDataset(
            synth_hdf5, classes_num=16, clip_length=2, gain_augment_db=7, seed=3
        )
        mixed = WavMixDataset(ds, rate=0.5, seed=7)
        loader = DataLoader(
            mixed, 4, SequentialSampler(len(mixed)), prefetch=0, num_workers=num_workers
        )
        loader.set_epoch(2)
        return list(loader)

    a, b = batches(0), batches(4)
    assert len(a) == len(b) == 5
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["wave"], y["wave"])
        np.testing.assert_array_equal(x["target"], y["target"])
        assert x["name"] == y["name"]


def test_set_epoch_changes_augmentation(synth_hdf5):
    ds = HDF5AudioDataset(
        synth_hdf5, classes_num=16, clip_length=2, gain_augment_db=7, seed=3
    )
    ds.set_epoch(0)
    w0 = [ds[i][0] for i in range(8)]
    ds.set_epoch(1)
    w1 = [ds[i][0] for i in range(8)]
    # the integer-dB gain draw (14 values) may collide per item; across 8
    # items at least one must differ between epochs
    assert any(not np.array_equal(a, b) for a, b in zip(w0, w1))
    ds.set_epoch(0)
    for i in range(8):
        np.testing.assert_array_equal(ds[i][0], w0[i])  # and reproducible


def test_native_builder_matches_numpy_chain(synth_hdf5):
    """With augmentation off, the fused C++ batch assembly is bit-identical
    to the per-item numpy chain (decode + pad/truncate + unpackbits)."""
    from passt_tpu.data import native

    if not native.available():
        pytest.skip("libhostplane.so not built")
    from passt_tpu.data.native_loader import NativeBatchBuilder
    from passt_tpu.data.pipeline import default_collate

    ds = HDF5AudioDataset(synth_hdf5, classes_num=16, clip_length=2)
    builder = NativeBatchBuilder(ds, seed=0, num_workers=2)
    idxs = [3, 0, 7, 12]
    nat = builder(idxs)
    ref = default_collate([ds[i] for i in idxs])
    np.testing.assert_array_equal(nat["wave"], ref["wave"])
    np.testing.assert_array_equal(nat["target"], ref["target"])
    assert nat["name"] == ref["name"]


def test_native_builder_wavmix_matches_numpy_plan(synth_hdf5):
    """The native wavmix draws its (apply, partner, lambda) plan from the
    same per-(seed, index) streams as WavMixDataset.mix_plan, so targets
    match the numpy chain exactly and waves match to float tolerance."""
    from passt_tpu.data import native

    if not native.available():
        pytest.skip("libhostplane.so not built")
    from passt_tpu.data.native_loader import NativeBatchBuilder
    from passt_tpu.data.pipeline import default_collate

    ds = HDF5AudioDataset(synth_hdf5, classes_num=16, clip_length=2, seed=0)
    mixed = WavMixDataset(ds, rate=0.5, seed=11)
    builder = NativeBatchBuilder(ds, wavmix=True, seed=11, num_workers=0)
    epoch = 4
    from passt_tpu.data.datasets import set_epoch_recursive

    set_epoch_recursive(mixed, epoch)
    builder.set_epoch(epoch)
    idxs = list(range(12))
    plans = [mixed.mix_plan(i) for i in idxs]
    assert any(p[0] for p in plans) and not all(p[0] for p in plans)
    nat = builder(idxs)
    ref = default_collate([mixed[i] for i in idxs])
    np.testing.assert_allclose(nat["target"], ref["target"], atol=1e-6)
    np.testing.assert_allclose(nat["wave"], ref["wave"], atol=1e-5)


def test_prefetcher_joins_worker_on_done():
    """DONE must be followed by a worker join BEFORE StopIteration: a
    consumer that receives DONE and immediately exits the process otherwise
    races interpreter finalization against the daemon worker's last few
    bytecodes — CPython kills the thread at its next GIL acquisition with
    whatever locks it holds, which deadlocked finalization whenever the
    iterator's dataset reads held an HDF5 handle (reproduced: the
    test_loaders_train_speed CLI printed its results then hung forever on a
    futex; deterministic 3/3 without the join, 0/3 with)."""
    from passt_tpu.data import Prefetcher

    def gen():
        yield from range(5)

    it = Prefetcher(gen(), depth=1)
    assert list(it) == [0, 1, 2, 3, 4]
    assert not it.thread.is_alive()  # joined by the DONE path, not racing

    # error path gives the same guarantee
    def boom():
        yield 1
        raise RuntimeError("boom")

    it2 = Prefetcher(boom(), depth=1)
    assert next(it2) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it2)
    assert not it2.thread.is_alive()


def test_loader_process_exits_cleanly(synth_hdf5):
    """End-to-end exit-hang regression: a subprocess that drains a
    prefetch-threaded DataLoader over an HDF5 dataset must terminate by
    itself (the bug hung the interpreter in C-level finalization AFTER the
    last Python line ran, so it is only observable across a process
    boundary)."""
    import subprocess
    import sys as _sys
    import textwrap

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {repr(repo_root)})
        from passt_tpu.data import HDF5AudioDataset
        from passt_tpu.data.pipeline import DataLoader
        ds = HDF5AudioDataset({repr(synth_hdf5)}, classes_num=16, clip_length=2)
        loader = DataLoader(ds, batch_size=4, sampler=list(range(len(ds))), prefetch=2)
        loader.set_epoch(0)
        n = sum(len(b["wave"]) for b in loader)
        print("drained", n)
        """
    )
    proc = subprocess.run(
        [_sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "drained" in proc.stdout


def test_folder_dataset_resamples_foreign_rates(tmp_path, rng_np):
    """FolderDataset must not silently treat a 16 kHz / 44.1 kHz file as
    32 kHz (time/pitch-warped spectrograms with no diagnostic): the wav
    decoder reads the RIFF rate and resamples to the dataset rate —
    integer factors by striding (the reference's own 32k->16k technique,
    audioset/dataset.py:202-216), otherwise linear interpolation (the
    reference loads wavs via librosa.load(sr=32000), which resamples)."""
    import wave as wavemod

    from passt_tpu.data import FolderDataset

    def write(path, rate, n):
        x = (rng_np.standard_normal(n) * 3000).astype(np.int16)
        with wavemod.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(x.tobytes())

    write(tmp_path / "native32k.wav", 32000, 32000)   # 1 s
    write(tmp_path / "slow16k.wav", 16000, 16000)     # 1 s at 16 kHz
    write(tmp_path / "cd44k.wav", 44100, 44100)       # 1 s at 44.1 kHz
    ds = FolderDataset(str(tmp_path), num_classes=4, sample_rate=32000)
    for i in range(3):
        wave_i, name, _ = ds[i]
        # every clip must decode to ~1 s at 32 kHz regardless of file rate
        assert abs(len(wave_i) - 32000) <= 1, (name, len(wave_i))


def test_cached_dataset_epoch_keying(tmp_path, synth_hdf5):
    """Deterministic chains keep one cross-epoch cache; augmented chains
    (chain_epoch_dependent) re-key per epoch so epoch-reseeded
    augmentations are not frozen by the cache."""
    import os

    from passt_tpu.data import CachedDataset, WavMixDataset
    from passt_tpu.data.datasets import chain_epoch_dependent

    det = HDF5AudioDataset(synth_hdf5, classes_num=16, clip_length=2)
    assert not chain_epoch_dependent(det)
    cache_det = CachedDataset(det, str(tmp_path / "det"))
    cache_det.set_epoch(0)
    w0 = cache_det[1][0]
    cache_det.set_epoch(3)
    w3 = cache_det[1][0]
    np.testing.assert_array_equal(w0, w3)
    # deterministic chain: set_epoch is a no-op, one "sinit" key forever
    assert sorted(os.listdir(tmp_path / "det")) == ["sinit_1.npz"]  # one key

    from passt_tpu.data.datasets import set_epoch_recursive

    aug = WavMixDataset(
        HDF5AudioDataset(synth_hdf5, classes_num=16, clip_length=2, gain_augment_db=7)
    )
    assert chain_epoch_dependent(aug)
    cache_aug = CachedDataset(aug, str(tmp_path / "aug"))
    set_epoch_recursive(cache_aug, 0)   # what DataLoader.set_epoch does
    a0 = cache_aug[1][0]
    set_epoch_recursive(cache_aug, 3)
    a3 = cache_aug[1][0]
    assert not np.array_equal(a0, a3)  # augmentation varies across epochs
    files = sorted(os.listdir(tmp_path / "aug"))
    assert "s0_1.npz" in files and "s3_1.npz" in files

    # Regression (ADVICE r1): reading an epoch-dependent chain BEFORE any
    # set_epoch (constructor-seed state) must not serve/populate the
    # epoch-0 cache key — the augmentation states differ.
    fresh = CachedDataset(
        WavMixDataset(
            HDF5AudioDataset(synth_hdf5, classes_num=16, clip_length=2, gain_augment_db=7)
        ),
        str(tmp_path / "fresh"),
    )
    fresh[1]  # pre-set_epoch read
    set_epoch_recursive(fresh, 0)
    fresh[1]
    assert sorted(os.listdir(tmp_path / "fresh")) == ["s0_1.npz", "sinit_1.npz"]


def _pack_second_container(tmp_path, rng_np, n=15):
    from passt_tpu.data.prepare import pack_waveform_hdf5

    path = str(tmp_path / "train_extra.h5")
    items = []
    for i in range(n):
        wave = (rng_np.standard_normal(int(32000 * 1.5)) * 0.1).astype(np.float32)
        target = np.zeros(16)
        target[(i + 7) % 16] = 1
        items.append((f"extra_{i:03d}.wav", wave, target))
    pack_waveform_hdf5(path, items, packed_targets=True)
    return path


def test_native_builder_two_containers(tmp_path, synth_hdf5, rng_np):
    """The fused C++ plane on the flagship balanced+unbalanced
    ConcatDataset chain (reference audioset/dataset.py:239-243): global
    indices route to the owning container and, with augmentation off, the
    batch is bit-identical to the numpy ConcatDataset chain."""
    from passt_tpu.data import native

    if not native.available():
        pytest.skip("libhostplane.so not built")
    from passt_tpu.data.native_loader import NativeBatchBuilder
    from passt_tpu.data.pipeline import default_collate

    extra = _pack_second_container(tmp_path, rng_np)
    ds1 = HDF5AudioDataset(synth_hdf5, classes_num=16, clip_length=2)
    ds2 = HDF5AudioDataset(extra, classes_num=16, clip_length=2)
    cat = ConcatDataset([ds1, ds2])
    builder = NativeBatchBuilder([ds1, ds2], seed=0, num_workers=2)
    idxs = [3, 25, 0, 34, 19, 20, 21, 7]  # interleaved across both
    nat = builder(idxs)
    ref = default_collate([cat[i] for i in idxs])
    np.testing.assert_array_equal(nat["wave"], ref["wave"])
    np.testing.assert_array_equal(nat["target"], ref["target"])
    assert nat["name"] == ref["name"]

    # wavmix partners drawn over the WHOLE concatenation, same plan streams
    mixed = WavMixDataset(cat, rate=0.5, seed=11)
    b2 = NativeBatchBuilder([ds1, ds2], wavmix=True, seed=11, num_workers=0)
    from passt_tpu.data.datasets import set_epoch_recursive

    idxs = list(range(14, 26))  # spans the container boundary (20)
    # find an epoch whose plans include a CROSS-container partner, so the
    # native-vs-numpy comparison below actually exercises the routing of a
    # partner owned by the other container
    for epoch in range(20):
        set_epoch_recursive(mixed, epoch)
        plans = [mixed.mix_plan(i) for i in idxs]
        if any(p[0] and p[1] >= 20 for p in plans):
            break
    else:
        raise AssertionError("no cross-container wavmix partner in 20 epochs")
    b2.set_epoch(epoch)
    assert any(p[0] for p in plans)
    nat = b2(idxs)
    ref = default_collate([mixed[i] for i in idxs])
    np.testing.assert_allclose(nat["target"], ref["target"], atol=1e-6)
    np.testing.assert_allclose(nat["wave"], ref["wave"], atol=1e-5)

    # mismatched geometry across containers is rejected (falls back loudly
    # through maybe_native_builder)
    ds_bad = HDF5AudioDataset(extra, classes_num=16, clip_length=1)
    from passt_tpu.data.native_loader import NativeBatchBuilder as NBB

    with pytest.raises(ValueError, match="share column/geometry"):
        NBB([ds1, ds_bad], seed=0)


def test_maybe_native_builder_two_container_cfg(tmp_path, synth_hdf5, rng_np, capsys):
    """cfg-driven activation for the flagship two-container recipe (the
    round-1 gap: train_hdf5_extra silently fell back to numpy), and the
    loud log line when the chain is ineligible."""
    from passt_tpu.data import native

    if not native.available():
        pytest.skip("libhostplane.so not built")
    import dataclasses

    from passt_tpu.data.native_loader import maybe_native_builder
    from passt_tpu.experiments import EXPERIMENTS

    extra = _pack_second_container(tmp_path, rng_np)
    base = EXPERIMENTS["audioset"].default_config
    cfg = dataclasses.replace(
        base,
        data=dataclasses.replace(
            base.data,
            train_hdf5=synth_hdf5,
            train_hdf5_extra=extra,
            num_classes=16,
            clip_length=2,
            packed_targets=True,
            native_loader=True,
        ),
    )
    builder = maybe_native_builder(cfg)
    assert builder is not None and len(builder.datasets) == 2
    assert len(builder.dataset) + len(builder.datasets[1]) == builder._total == 35

    # ineligible chain (no fixed clip length) -> None + loud line
    cfg2 = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, clip_length=None)
    )
    capsys.readouterr()
    assert maybe_native_builder(cfg2) is None
    assert "numpy loader path" in capsys.readouterr().out


def test_ir_augment_bank_config_activated(tmp_path, synth_hdf5):
    """data.ir_path + data.ir_augment activate IR convolution in the
    cfg-derived chain (reference get_ir_sample/pydub_augment,
    audioset/dataset.py:84-112): bank loading (rglob sorted, resample),
    deterministic per-(seed,index) application, rate=0 bit-identity."""
    import dataclasses
    import wave as wavmod

    from passt_tpu.data import load_ir_bank
    from passt_tpu.experiments import EXPERIMENTS
    from passt_tpu.experiments.common import build_base_train_dataset

    # write a tiny 2-IR .wav bank (PCM16 mono 32 kHz)
    bank_dir = tmp_path / "irs"
    bank_dir.mkdir()
    rng = np.random.default_rng(5)
    for name, decay in [("room_a.wav", 60.0), ("room_b.wav", 15.0)]:
        ir = (rng.standard_normal(400) * np.exp(-np.arange(400) / decay)).astype(
            np.float32
        )
        with wavmod.open(str(bank_dir / name), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(32000)
            w.writeframes((ir * 32767).astype(np.int16).tobytes())

    bank = load_ir_bank(str(bank_dir), 32000)
    assert len(bank) == 2 and all(b.dtype == np.float32 for b in bank)

    base = EXPERIMENTS["audioset"].default_config
    data = dataclasses.replace(
        base.data,
        train_hdf5=synth_hdf5,
        num_classes=16,
        clip_length=2,
        gain_augment_db=0,
        ir_augment=1.0,
        ir_path=str(bank_dir),
    )
    cfg = dataclasses.replace(base, data=data)
    ds_ir = build_base_train_dataset(cfg, synth_hdf5, seed=3)
    assert ds_ir.ir_augment_rate == 1.0 and len(ds_ir.impulse_responses) == 2

    cfg_off = dataclasses.replace(
        cfg, data=dataclasses.replace(data, ir_augment=0.0)
    )
    ds_off = build_base_train_dataset(cfg_off, synth_hdf5, seed=3)
    w_ir, _, _ = ds_ir[2]
    w_off, _, _ = ds_off[2]
    assert w_ir.shape == w_off.shape  # crop after convolve keeps clip length
    assert not np.array_equal(w_ir, w_off)

    # pure in (seed, index): repeated reads are bit-identical, and a
    # different seed draws a different IR for at least one of 6 items
    np.testing.assert_array_equal(w_ir, ds_ir[2][0])
    before = [ds_ir[i][0] for i in range(6)]
    ds_ir.reseed(99)
    after = [ds_ir[i][0] for i in range(6)]
    assert any(not np.array_equal(a, b) for a, b in zip(before, after))

    # the bank loads at the CONTAINER source rate, not the pipeline target
    # rate: convolution happens BEFORE stride_resample, so a 16 kHz preset
    # on a 32 kHz container must not time-stretch the IRs
    cfg16 = dataclasses.replace(
        cfg, data=dataclasses.replace(data, sample_rate=16000)
    )
    ds16 = build_base_train_dataset(cfg16, synth_hdf5, seed=3)
    np.testing.assert_array_equal(ds16.impulse_responses[0], bank[0])

    # the IR chain keeps the numpy path (native plane rejects it loudly)
    from passt_tpu.data import native

    if native.available():
        from passt_tpu.data.native_loader import NativeBatchBuilder

        with pytest.raises(ValueError, match="ir_augment"):
            NativeBatchBuilder(ds_ir, seed=0)


def test_wavmix_merge_masks_zero_unobserved_labels():
    """Reference openmic/dataset.py:131-134: unobserved (mask=0) labels are
    zeroed BEFORE the lambda blend — otherwise a partner's stale stored
    value leaks into a target the OR-merged mask marks observed."""
    from passt_tpu.data.datasets import WavMixDataset

    y0 = np.array([0.9, 0.6, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0], np.float32)
    y1 = np.array([0.8, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0], np.float32)

    class TwoItems:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            x = np.full(100, 0.5 + i, np.float32)
            return x, f"i{i}", (y0 if i == 0 else y1).copy()

    for seed in range(200):
        ds = WavMixDataset(TwoItems(), rate=0.9, seed=seed, merge_masks=True)
        applied, partner, lam = ds.mix_plan(0)
        if applied and partner == 1:
            break
    else:
        raise AssertionError("no (apply, partner=1) plan found")
    _, _, y = ds[0]
    lam = float(lam)
    # label 0: item0's 0.9 is UNOBSERVED (mask=0) -> contributes nothing
    np.testing.assert_allclose(y[0], 0.8 * (1 - lam), rtol=1e-6)
    # label 1: observed only on item0
    np.testing.assert_allclose(y[1], 0.6 * lam, rtol=1e-6)
    np.testing.assert_array_equal(y[4:], [1.0, 1.0, 0.0, 0.0])  # OR mask


def test_epoch_dependent_includes_ir(synth_hdf5):
    ds = HDF5AudioDataset(
        synth_hdf5, classes_num=16, clip_length=2,
        impulse_responses=[np.ones(4, np.float32)], ir_augment_rate=0.5,
    )
    assert ds.epoch_dependent
    ds0 = HDF5AudioDataset(synth_hdf5, classes_num=16, clip_length=2)
    assert not ds0.epoch_dependent


def test_wav_column_resamples_to_container_rate(tmp_path, rng_np):
    """A wav payload at a rate different from the container attr is
    resampled on decode (reference librosa.load(sr=...) semantics), not
    silently time/pitch-warped."""
    import io
    import wave as wavmod

    from passt_tpu.data.prepare import pack_bytes_hdf5

    def wav_bytes(x, rate):
        b = io.BytesIO()
        with wavmod.open(b, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes((x * 32767).astype(np.int16).tobytes())
        return b.getvalue()

    x16 = (rng_np.standard_normal(16000) * 0.1).astype(np.float32)
    t = np.zeros(16, np.float32)
    t[0] = 1
    path = str(tmp_path / "w.h5")
    pack_bytes_hdf5(
        path, [("a.wav", wav_bytes(x16, 16000), t)], column="wav",
        sample_rate=32000,
    )
    ds = HDF5AudioDataset(path, classes_num=16, clip_length=None)
    w, _, _ = ds[0]
    assert len(w) == 32000  # 1 s at the container rate (upsampled from 16k)


def test_streamed_weights_match_in_memory(rng_np):
    from passt_tpu.data.sampler import class_balanced_sample_weights_streamed

    targets = (rng_np.uniform(size=(300, 16)) < 0.1).astype(np.float32)
    want = class_balanced_sample_weights(targets)
    got = class_balanced_sample_weights_streamed(
        lambda: (targets[i : i + 64] for i in range(0, 300, 64)), 16
    )
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_native_builder_skips_ir_chain_without_building(tmp_path, synth_hdf5, capsys, monkeypatch):
    """The IR-chain fallback is decided BEFORE rebuilding the datasets —
    build_base_train_dataset would re-load + resample the whole .wav bank
    just for NativeBatchBuilder to reject it."""
    from passt_tpu.data import native

    if not native.available():
        pytest.skip("libhostplane.so not built")
    import dataclasses

    import passt_tpu.experiments.common as common
    from passt_tpu.data.native_loader import maybe_native_builder
    from passt_tpu.experiments import EXPERIMENTS

    def _must_not_build(*a, **k):
        raise AssertionError("dataset rebuilt for a chain known ineligible")

    monkeypatch.setattr(common, "build_base_train_dataset", _must_not_build)
    base = EXPERIMENTS["audioset"].default_config
    cfg = dataclasses.replace(
        base,
        data=dataclasses.replace(
            base.data,
            train_hdf5=synth_hdf5,
            num_classes=16,
            clip_length=2,
            native_loader=True,
            ir_augment=0.4,
            ir_path=str(tmp_path),
        ),
    )
    capsys.readouterr()
    assert maybe_native_builder(cfg) is None
    assert "ir_augment is python-side only" in capsys.readouterr().out


def test_hostplane_env_override_must_exist(monkeypatch):
    """An explicit PASST_TPU_HOSTPLANE pointing nowhere raises instead of
    silently falling back to the packaged .so (A/B runs would measure the
    wrong library)."""
    from passt_tpu.data import native

    monkeypatch.setenv("PASST_TPU_HOSTPLANE", "/nonexistent/libhostplane.so")
    with pytest.raises(FileNotFoundError, match="PASST_TPU_HOSTPLANE"):
        native._lib_path()


def test_decode_wav_noninteger_resample_antialiases():
    """44.1 kHz -> 32 kHz runtime resample must low-pass: a 21 kHz tone
    (above the 16 kHz target Nyquist) must come out attenuated to near
    silence, not aliased into band as plain linear interpolation did
    (round-5 review finding; matches the reference's librosa.load(sr=...)
    windowed-sinc behavior)."""
    import io
    import wave as wave_mod

    import numpy as np

    from passt_tpu.data.datasets import decode_wav

    sr = 44100
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 21000 * t)).astype(np.float32)
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((tone * 32767).astype(np.int16).tobytes())
    payload = np.frombuffer(buf.getvalue(), np.uint8)
    out = decode_wav(payload, target_rate=32000)
    assert abs(len(out) - 32000) <= 2
    # aliased linear-interp kept ~70% of the tone's RMS; the polyphase
    # filter must kill it
    assert float(np.sqrt(np.mean(out**2))) < 0.02


def test_train_samplers_equal_per_rank_counts():
    """Train samplers must give EVERY rank the same item count even when
    draw_len % num_replicas != 0 — an extra item on rank 0 becomes an
    extra collective train step the other ranks never join (distributed
    hang; round-5 review finding). Eval's SequentialSampler deliberately
    stays ragged (the gather pads)."""
    from passt_tpu.data.sampler import (
        SequentialSampler,
        ShuffleSampler,
        WeightedEpochSampler,
    )

    weights = np.ones(50)
    for n_rep, epoch_len in ((3, 100), (4, 49), (2, 7)):
        counts = []
        for r in range(n_rep):
            s = WeightedEpochSampler(
                weights, epoch_len=epoch_len, num_replicas=n_rep, rank=r, seed=1
            )
            items = list(s)
            assert len(items) == len(s)
            counts.append(len(items))
        assert len(set(counts)) == 1, (n_rep, epoch_len, counts)

        sh_counts = [
            len(list(ShuffleSampler(epoch_len, num_replicas=n_rep, rank=r)))
            for r in range(n_rep)
        ]
        assert len(set(sh_counts)) == 1

    # eval sampler keeps full ragged coverage
    ev = [len(list(SequentialSampler(7, num_replicas=2, rank=r))) for r in range(2)]
    assert sum(ev) == 7
