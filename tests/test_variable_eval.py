"""Variable-length eval path (FSD50K variable_eval, fsd50k/dataset.py
clip_length=None + ex_fsd50k.py variable_eval named config)."""

import dataclasses

import numpy as np
import pytest

from passt_tpu.config import apply_overrides, parse_cli
from passt_tpu.data import HDF5AudioDataset, DataLoader, SequentialSampler
from passt_tpu.data.pipeline import default_collate
from passt_tpu.data.prepare import pack_waveform_hdf5
from passt_tpu.experiments import EXPERIMENTS


def test_variable_eval_preset():
    base = EXPERIMENTS["fsd50k"].default_config
    _, cfg = parse_cli(["evaluate_only", "variable_eval"], base)
    assert cfg.data.clip_length is None
    assert cfg.data.eval_pad_multiple_s == 5


def test_variable_length_dataset_and_bucketed_collate(tmp_path, rng_np):
    items = []
    for i, secs in enumerate([0.7, 1.3, 2.1, 4.9]):
        wave = (rng_np.standard_normal(int(32000 * secs)) * 0.1).astype(np.float32)
        t = np.zeros(8)
        t[i % 8] = 1
        items.append((f"c{i}.wav", wave, t))
    path = str(tmp_path / "var.h5")
    pack_waveform_hdf5(path, items)
    ds = HDF5AudioDataset(path, classes_num=8, clip_length=None)
    # variable lengths survive (no pad/truncate)
    assert len(ds[0][0]) == int(32000 * 0.7)
    assert len(ds[3][0]) == int(32000 * 4.9)

    import functools

    collate = functools.partial(default_collate, pad_to_multiple=32000)
    dl = DataLoader(ds, 2, SequentialSampler(len(ds)), collate=collate, prefetch=0)
    batches = list(iter(dl))
    # batch 1: max 1.3s -> padded to 2s; batch 2: max 4.9s -> padded to 5s
    assert batches[0]["wave"].shape == (2, 64000)
    assert batches[1]["wave"].shape == (2, 160000)


def test_eval_set_switch(tmp_path, rng_np):
    from passt_tpu.experiments.common import build_eval_loader

    items = [(f"c{i}.wav", np.zeros(32000, np.float32), (np.arange(8) == i).astype(np.float64)) for i in range(4)]
    pa, pb = str(tmp_path / "a.h5"), str(tmp_path / "b.h5")
    pack_waveform_hdf5(pa, items[:2])
    pack_waveform_hdf5(pb, items)
    base = EXPERIMENTS["fsd50k"].default_config
    cfg = apply_overrides(
        base,
        {"data.eval_hdf5": pa, "data.valid_hdf5": pb, "data.num_classes": "8",
         "data.clip_length": "1"},
    )
    assert len(build_eval_loader(cfg).dataset) == 2
    cfg2 = apply_overrides(cfg, {"data.eval_set": "valid"})
    assert len(build_eval_loader(cfg2).dataset) == 4


def test_exact_eval_preset():
    base = EXPERIMENTS["fsd50k"].default_config
    _, cfg = parse_cli(["evaluate_only", "exact_eval"], base)
    assert cfg.data.clip_length is None
    # batched since round 2: the loader groups clips by EXACT length, so
    # bs>1 stays bitwise the reference's bs=1 protocol (no padding ever)
    assert cfg.data.eval_batch_size == 20
    assert cfg.data.eval_pad_multiple_s == 0


@pytest.mark.slow
def test_padded_vs_exact_eval_ap_delta(tmp_path, rng_np):
    """Bound the metric impact of padded variable-length eval vs the
    reference's exact-length bs=1 protocol (fsd50k/dataset.py:70-79):
    zero-padded tail seconds become real (silence) mel frames that enter
    attention and shift logits. On this toy (trained on 0.6-s padded clips,
    so padded eval is in-distribution and exact-length is the shifted
    protocol) the measured delta is ~0.12 AP — evidence that the two
    protocols are NOT interchangeable, which is exactly why the exact_eval
    preset exists. The test asserts both protocols work end-to-end, the
    model learned, and the delta stays within a loose sanity bound; a tight
    parity bound needs the real FSD50K checkpoint + eval set (documented in
    PARITY.md)."""
    import functools

    import jax

    from passt_tpu.data.pipeline import default_collate
    from passt_tpu.models.passt import PaSSTConfig
    from passt_tpu.ops.frontend import MelConfig
    from passt_tpu.train.loop import evaluate
    from passt_tpu.train.steps import (
        create_train_state,
        make_eval_step,
        make_optimizer,
        make_train_step,
    )

    classes = 8
    # tones: class k = pure tone at a class frequency, variable 0.3-0.6 s
    items = []
    for i in range(32):
        k = i % classes
        secs = 0.3 + 0.0375 * (i % 8)
        t = np.arange(int(32000 * secs)) / 32000.0
        wave = (0.5 * np.sin(2 * np.pi * (500 + 700 * k) * t)).astype(np.float32)
        y = np.zeros(classes)
        y[k] = 1
        items.append((f"c{i}.wav", wave, y))
    path = str(tmp_path / "tones.h5")
    pack_waveform_hdf5(path, items, packed_targets=False)

    cfg = PaSSTConfig(
        input_fdim=32, input_tdim=60, embed_dim=64, depth=2, num_heads=4,
        num_classes=classes,
    )
    mcfg = MelConfig(n_mels=32, freqm=0, timem=0)
    tx = make_optimizer(lr=2e-3, steps_per_epoch=8)
    model, state = create_train_state(cfg, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, mcfg, use_mixup=False)
    train_ds = HDF5AudioDataset(path, classes_num=classes, clip_length=0.6,
                                packed_targets=False)
    train_dl = DataLoader(train_ds, 8, SequentialSampler(len(train_ds)), prefetch=0)
    import jax.numpy as jnp

    for _ in range(6):
        for b in train_dl:
            state, _ = step(
                state,
                {"wave": jnp.asarray(b["wave"]), "target": jnp.asarray(b["target"])},
                jax.random.PRNGKey(1),
            )

    eval_step = make_eval_step(model, mcfg)
    ds = HDF5AudioDataset(path, classes_num=classes, clip_length=None,
                          packed_targets=False)
    exact = DataLoader(ds, 1, SequentialSampler(len(ds)), prefetch=0)
    padded = DataLoader(
        ds, 4, SequentialSampler(len(ds)),
        collate=functools.partial(default_collate, pad_to_multiple=int(0.6 * 32000)),
        prefetch=0,
    )
    m_exact = evaluate(eval_step, state.params, exact)
    m_padded = evaluate(eval_step, state.params, padded)
    assert m_exact["n_eval"] == m_padded["n_eval"] == 32
    delta = abs(m_exact["ap"] - m_padded["ap"])
    print(f"exact ap={m_exact['ap']:.4f} padded ap={m_padded['ap']:.4f} delta={delta:.4f}")
    assert m_exact["ap"] > 0.5 and m_padded["ap"] > 0.5  # both learned protocols work
    assert delta < 0.3  # loose sanity bound; see docstring


def test_length_grouped_exact_eval_bitwise_vs_bs1(tmp_path, rng_np):
    """Length-grouped batched exact eval produces EXACTLY the bs=1 exact
    outputs (no padding, length-pure batches), with far fewer batches and
    one compile per distinct length."""
    import dataclasses

    from passt_tpu.data import HDF5AudioDataset
    from passt_tpu.data.prepare import pack_waveform_hdf5
    from passt_tpu.data.sampler import LengthGroupedBatchSampler
    from passt_tpu.experiments import EXPERIMENTS
    from passt_tpu.experiments.common import build_eval_loader

    # 12 clips over 3 distinct lengths
    lens = [8000, 12000, 8000, 16000, 12000, 8000, 16000, 8000, 12000, 8000, 16000, 12000]
    items = []
    for i, n in enumerate(lens):
        w = (rng_np.standard_normal(n) * 0.1).astype(np.float32)
        t = np.zeros(16)
        t[i % 16] = 1
        items.append((f"c{i:02d}.wav", w, t))
    path = str(tmp_path / "var.h5")
    pack_waveform_hdf5(path, items)

    ds = HDF5AudioDataset(path, classes_num=16, clip_length=None)
    np.testing.assert_array_equal(ds.item_lengths(), lens)

    base = EXPERIMENTS["fsd50k"].default_config
    cfg = dataclasses.replace(
        base,
        data=dataclasses.replace(
            base.data, eval_hdf5=path, num_classes=16, clip_length=None,
            eval_pad_multiple_s=0.0, eval_batch_size=4, packed_targets=True,
        ),
    )
    loader = build_eval_loader(cfg)
    batches = list(iter(loader))
    # length-pure batches: 5x8000 -> 2 chunks, 4x12000 -> 1, 3x16000 -> 1
    assert len(batches) == 4 == len(loader)
    # length-pure, unpadded: (batch size, width) multiset is exactly the
    # per-length chunking of the 5x8000 / 4x12000 / 3x16000 clip set
    sizes = sorted((len(b["name"]), int(b["wave"].shape[1])) for b in batches)
    assert sizes == [(1, 8000), (3, 16000), (4, 8000), (4, 12000)]
    by_name = {}
    for b in batches:
        for j, name in enumerate(b["name"]):
            by_name[name] = b["wave"][j]
    assert len(by_name) == 12  # unique names — nothing overwritten
    # bitwise equal to the bs=1 exact protocol (no padding anywhere)
    cfg1 = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, eval_batch_size=1)
    )
    for b in iter(build_eval_loader(cfg1)):
        (name,) = b["name"]
        np.testing.assert_array_equal(b["wave"][0], by_name[name])

    # rank-sharded: disjoint batch cover
    s0 = LengthGroupedBatchSampler(lens, 4, num_replicas=2, rank=0)
    s1 = LengthGroupedBatchSampler(lens, 4, num_replicas=2, rank=1)
    all_idx = [i for b in list(s0) + list(s1) for i in b]
    assert sorted(all_idx) == list(range(12))
