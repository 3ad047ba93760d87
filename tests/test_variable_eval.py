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
