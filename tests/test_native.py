"""Native host-plane tests: build the C++ library and verify each op
against the pure-numpy behavioral reference in passt_tpu.data.datasets."""

import os
import subprocess

import numpy as np
import pytest

from passt_tpu.data import native


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    subprocess.run(["make", "-C", "native", "-s"], check=True, cwd="/root/repo")
    lib = native.load(n_threads=2)
    assert lib is not None
    assert lib.hostplane_version() == native._ABI_VERSION
    return lib


def test_assemble_pad_and_truncate(rng_np):
    items = [
        (rng_np.standard_normal(1000) * 1000).astype(np.int16),  # shorter -> pad
        (rng_np.standard_normal(3000) * 1000).astype(np.int16),  # longer -> head cut
    ]
    out = native.assemble_batch(items, clip_samples=2000)
    assert out.shape == (2, 2000)
    np.testing.assert_allclose(out[0, :1000], items[0] / 32768.0, atol=1e-7)
    assert (out[0, 1000:] == 0).all()
    np.testing.assert_allclose(out[1], items[1][:2000] / 32768.0, atol=1e-7)


def test_assemble_gain_roll_crop_deterministic(rng_np):
    items = [(rng_np.standard_normal(5000) * 1000).astype(np.int16) for _ in range(4)]
    a = native.assemble_batch(items, 3000, gain_db=7, roll_range=50, random_crop=True, seed=9)
    b = native.assemble_batch(items, 3000, gain_db=7, roll_range=50, random_crop=True, seed=9)
    np.testing.assert_array_equal(a, b)  # deterministic in seed
    c = native.assemble_batch(items, 3000, gain_db=7, roll_range=50, random_crop=True, seed=10)
    assert not np.array_equal(a, c)
    # gain stays within +/-7 dB of the un-gained crop norm
    plain = native.assemble_batch(items, 3000, seed=9)
    ratio = np.linalg.norm(a[0]) / np.linalg.norm(plain[0])
    assert 10 ** (-7.5 / 20) < ratio < 10 ** (7.5 / 20)


def test_roll_is_circular(rng_np):
    item = (rng_np.standard_normal(100) * 1000).astype(np.int16)
    out = native.assemble_batch([item], 100, roll_range=30, seed=3)
    ref = item.astype(np.float32) / 32768.0
    # some circular shift of ref must match exactly
    matches = [s for s in range(-30, 31) if np.allclose(np.roll(ref, s), out[0], atol=1e-7)]
    assert len(matches) >= 1


def test_wavmix_matches_numpy(rng_np):
    b, t = 3, 500
    x = rng_np.standard_normal((b, t)).astype(np.float32)
    y = rng_np.standard_normal((b, t)).astype(np.float32)
    lam = np.asarray([0.7, 0.9, 0.6], np.float32)
    apply = np.asarray([1, 0, 1], np.uint8)
    got = x.copy()
    native.wavmix(got, y, lam, apply)
    for i in range(b):
        if not apply[i]:
            np.testing.assert_array_equal(got[i], x[i])
            continue
        xi = x[i] - x[i].mean()
        yi = y[i] - y[i].mean()
        ref = xi * lam[i] + yi * (1 - lam[i])
        ref = ref - ref.mean()
        np.testing.assert_allclose(got[i], ref, atol=1e-5)


def test_unpack_targets_matches_numpy(rng_np):
    targets = (rng_np.uniform(size=(10, 527)) < 0.1).astype(np.uint8)
    packed = np.packbits(targets, axis=-1)
    got = native.unpack_targets(packed, 527)
    ref = np.unpackbits(packed, axis=-1, count=527).astype(np.float32)
    np.testing.assert_array_equal(got, ref)


def test_pool_more_shards_than_items():
    """Regression for the ParallelFor stack use-after-free: with a pool
    wider than the work list (8 threads, 2 items), shard closures used to
    outlive the waiter's stack frame. 50 repetitions on an 8-wide pool —
    a regression shows up as corruption/crash here."""
    from passt_tpu.data import native

    if not native.available():
        pytest.skip("native plane not built")
    native.load(n_threads=8)
    try:
        rng = np.random.default_rng(0)
        srcs = [
            (rng.standard_normal(5000) * 10000).astype(np.int16) for _ in range(2)
        ]
        expected = None
        for _ in range(50):
            out = native.assemble_batch(srcs, clip_samples=4000, gain_db=0,
                                        roll_range=0, random_crop=False, seed=7)
            assert out.shape == (2, 4000)
            if expected is None:
                expected = out.copy()
            np.testing.assert_array_equal(out, expected)  # deterministic
    finally:
        native.load(n_threads=None)  # restore default pool width


def test_lib_search_order(tmp_path, monkeypatch):
    """Search order: PASST_TPU_HOSTPLANE env override, the wheel-shipped
    passt_tpu/libhostplane.so (setup.py ctypes extension), then the
    source-checkout native/libhostplane.so Makefile output."""
    from passt_tpu.data import native

    cands = list(native._lib_candidates())
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(native.__file__)))
    assert cands[-2] == os.path.join(pkg_dir, "libhostplane.so")
    assert cands[-1] == os.path.join(
        os.path.dirname(pkg_dir), "native", "libhostplane.so"
    )

    override = tmp_path / "custom.so"
    override.write_bytes(b"")
    monkeypatch.setenv("PASST_TPU_HOSTPLANE", str(override))
    assert native._lib_path() == str(override)  # env wins when present


def test_assemble_seeding_is_per_dataset_index(rng_np):
    """Augmentation draws are seeded by DATASET index, not batch position:
    the same PCM assembled under different indices (two 'batches' of an
    epoch) must draw different gain/roll, while the same indices repeat
    bit-identically. Position seeding — the round-2 review finding — would
    collapse an epoch's diversity to one draw-set per batch slot."""
    src = (rng_np.standard_normal(5000) * 10000).astype(np.int16)
    items = [src] * 4
    kw = dict(clip_samples=4000, gain_db=7, roll_range=50, random_crop=True, seed=3)
    a = native.assemble_batch(items, **kw, indices=[0, 1, 2, 3])
    b = native.assemble_batch(items, **kw, indices=[4, 5, 6, 7])
    c = native.assemble_batch(items, **kw, indices=[0, 1, 2, 3])
    np.testing.assert_array_equal(a, c)  # pure in (seed, index)
    for slot in range(4):
        assert not np.array_equal(a[slot], b[slot])  # fresh draws per item
    # identical items with DISTINCT indices also differ within one batch
    assert not np.array_equal(a[0], a[1])


def test_unpack_targets_zero_fills_past_packed_row(rng_np):
    """classes > 8*packed_width (container packed for fewer classes):
    zero-fill like np.unpackbits(count=...), never read past the row."""
    packed = rng_np.integers(0, 256, size=(3, 2), dtype=np.uint8)  # 16 bits
    out = native.unpack_targets(packed, 30)
    want = np.zeros((3, 30), np.float32)
    want[:, :16] = np.unpackbits(packed, axis=1, count=16).astype(np.float32)
    np.testing.assert_array_equal(out, want)


def test_stale_abi_error_is_persistent(monkeypatch):
    """A stale-ABI library must keep failing LOUDLY on every load() call —
    the first caller consuming the one RuntimeError used to leave all
    later probes silently returning None with a false 'not built'
    diagnosis (round-5 review finding)."""
    import passt_tpu.data.native as native

    err = RuntimeError("stale libhostplane.so (test)")
    monkeypatch.setattr(native, "_LOAD_ERROR", err)
    monkeypatch.setattr(native, "_SEARCHED", True)
    with pytest.raises(RuntimeError, match="stale"):
        native.load()
    with pytest.raises(RuntimeError, match="stale"):  # and again
        native.load()


def test_wavmix_validates_out_buffer():
    """wavmix writes through out's raw pointer — wrong dtype/contiguity
    must raise, not silently reinterpret memory (round-5 review finding)."""
    import passt_tpu.data.native as native

    if not native.available():
        pytest.skip("native host plane not built")
    b, t = 2, 256
    other = np.zeros((b, t), np.float32)
    lam = np.ones(b, np.float32)
    apply = np.ones(b, np.uint8)
    with pytest.raises(ValueError, match="contiguous float32"):
        native.wavmix(np.zeros((b, t), np.float64), other, lam, apply)
    with pytest.raises(ValueError, match="other shape"):
        native.wavmix(np.zeros((b, t), np.float32), other[:, :128], lam, apply)
    with pytest.raises(ValueError, match="cover the batch"):
        native.wavmix(np.zeros((b, t), np.float32), other, lam[:1], apply)
