"""Native batch assembly: the C++ host plane wired into the DataLoader.

The reference's training loader spends its time in native code outside
Python — PyAV decode + torch collate across 16 worker processes
(reference: ex_audioset.py:42-48; audioset/README.md:3 calls decode the
bottleneck). The equivalent here is :class:`NativeBatchBuilder`, a
``DataLoader(batch_builder=...)`` hook that replaces the per-item numpy
chain (HDF5AudioDataset -> RollDataset -> WavMixDataset -> collate) with

1. ONE fancy-indexed HDF5 read per column per batch (per-item h5py call
   overhead dominates raw-PCM loading otherwise),
2. one fused C++ pass per batch: int16 -> float32 + pad/head-or-random-crop
   + gain + circular roll (``hostplane_assemble_batch``),
3. C++ packbits-target unpacking (``hostplane_unpack_targets``),
4. C++ wave-mixup against a partner batch (``hostplane_wavmix``), with the
   (apply, partner, lambda) plan drawn host-side from the same
   per-(seed, index) streams as WavMixDataset.mix_plan.

Semantics mirror the numpy chain exactly; with augmentation off the two
paths are bit-identical (tested). With augmentation on, the C++ plane uses
its own xorshift RNG, so individual draws differ from numpy's PCG64 while
the distributions and the (seed, epoch)-determinism are the same.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from passt_tpu.data import native
from passt_tpu.data.datasets import (
    HDF5AudioDataset,
    epoch_seed,
    item_rng,
)

_WAVMIX_SALT = 0x5BF03635  # same stream id as WavMixDataset.mix_plan


class NativeBatchBuilder:
    """fn(indices) -> batch dict, fused in C++ (see module docstring)."""

    def __init__(
        self,
        dataset: HDF5AudioDataset,
        *,
        roll_shift_range: int = 0,
        wavmix: bool = False,
        wavmix_rate: float = 0.5,
        wavmix_beta: float = 2.0,
        merge_masks: bool = False,
        seed: int = 0,
        num_workers: int = 8,
    ):
        if not native.available():
            raise RuntimeError("libhostplane.so not built (make -C native)")
        if not isinstance(dataset, HDF5AudioDataset):
            raise TypeError("NativeBatchBuilder feeds on a plain HDF5AudioDataset")
        if dataset.audio_column == "mp3":
            if not native.mp3_available():
                raise RuntimeError(
                    "mp3 containers need the native plane with libmpg123 "
                    "(make -C native; libmpg123.so.0 on the loader path)"
                )
        elif dataset.audio_column != "raw_i16":
            raise ValueError(
                "native assembly needs an int16 PCM or mp3 column, got "
                f"{dataset.audio_column!r}"
            )
        if dataset.clip_samples is None:
            raise ValueError("native assembly needs a fixed clip_length")
        if dataset.sample_rate != dataset.source_rate:
            # C++ plane has no stride-resample; 16/8 kHz presets on 32 kHz
            # containers keep the numpy path
            raise ValueError(
                "native assembly needs sample_rate == container rate "
                f"({dataset.sample_rate} != {dataset.source_rate})"
            )
        self.dataset = dataset
        self.roll_shift_range = roll_shift_range
        self.wavmix = wavmix
        self.wavmix_rate = wavmix_rate
        self.wavmix_beta = wavmix_beta
        self.merge_masks = merge_masks
        self._base_seed = seed
        self._seed = seed
        self.num_workers = num_workers  # C++ pool width is set globally by
        # native.load(); kept for introspection

    def set_epoch(self, epoch: int) -> None:
        self._seed = epoch_seed(self._base_seed, epoch)

    # ------------------------------------------------------------------
    def _assemble(self, bufs, seed: int) -> np.ndarray:
        ds = self.dataset
        if ds.audio_column == "mp3":
            # fused decode(libmpg123)+pad/crop+gain+roll, pool-parallel —
            # the reference's 16 PyAV decode workers (ex_audioset.py:42-48)
            wave, rates, lens = native.assemble_mp3_batch(
                bufs,
                ds.clip_samples,
                gain_db=ds.gain_augment_db,
                roll_range=self.roll_shift_range,
                random_crop=ds.crop == "random",
                seed=seed,
            )
            bad = np.nonzero(lens < 0)[0]
            if bad.size:  # propagate like a torch worker exception
                raise ValueError(
                    f"mp3 decode failed for {bad.size} item(s) in batch "
                    f"(first error code {int(lens[bad[0]])})"
                )
            if (rates != ds.sample_rate).any():
                raise ValueError(
                    f"mp3 native rate {int(rates[0])} != dataset sample_rate "
                    f"{ds.sample_rate}"
                )
            return wave
        # zero-copy reinterpret of the vlen-uint8 rows (tobytes() would copy
        # the whole batch)
        pcm = [
            b.view(np.int16)
            if isinstance(b, np.ndarray) and b.flags.c_contiguous
            else np.frombuffer(bytes(b), dtype=np.int16)
            for b in bufs
        ]
        return native.assemble_batch(
            pcm,
            ds.clip_samples,
            gain_db=ds.gain_augment_db,
            roll_range=self.roll_shift_range,
            random_crop=ds.crop == "random",
            seed=seed,
        )

    def _targets(self, rows) -> np.ndarray:
        ds = self.dataset
        rows = np.asarray(rows)
        if ds.packed_targets:
            return native.unpack_targets(rows, ds.classes_num)
        return np.asarray(rows, dtype=np.float32)

    def __call__(self, idxs) -> Dict[str, np.ndarray]:
        idxs = list(idxs)
        bufs, names, rows = self.dataset.raw_batch(idxs)
        wave = self._assemble(bufs, self._seed)
        target = self._targets(rows)

        if self.wavmix:
            # (apply, partner, lambda) per item from the identical
            # per-(seed, index) streams as WavMixDataset.mix_plan.
            apply = np.zeros(len(idxs), np.uint8)
            partners = list(idxs)
            lam = np.ones(len(idxs), np.float32)
            for b, i in enumerate(idxs):
                rng = item_rng(self._seed ^ _WAVMIX_SALT, i)
                if rng.random() < self.wavmix_rate:
                    apply[b] = 1
                    partners[b] = int(rng.integers(0, len(self.dataset)))
                    l = rng.beta(self.wavmix_beta, self.wavmix_beta)
                    lam[b] = np.float32(max(l, 1.0 - l))
            if apply.any():
                bufs2, _, rows2 = self.dataset.raw_batch(partners)
                other = self._assemble(bufs2, self._seed ^ 0x9E3779B9)
                native.wavmix(wave, other, lam, apply)
                y2 = self._targets(rows2)
                if self.merge_masks:
                    k = target.shape[1] // 2
                    mixed_labels = target[:, :k] * lam[:, None] + y2[:, :k] * (
                        1.0 - lam[:, None]
                    )
                    merged_mask = ((target[:, k:] > 0.5) | (y2[:, k:] > 0.5)).astype(
                        np.float32
                    )
                    mixed = np.concatenate([mixed_labels, merged_mask], axis=1)
                else:
                    mixed = target * lam[:, None] + y2 * (1.0 - lam[:, None])
                target = np.where(apply[:, None] > 0, mixed, target)

        return {"wave": wave, "target": target, "name": names}


def maybe_native_builder(cfg) -> Optional[NativeBatchBuilder]:
    """A NativeBatchBuilder for the recipe's cfg-derived train chain, or
    None when the native plane is unavailable / the chain is ineligible
    (mp3/variable-length/resampled containers keep the numpy path).
    Callers with a custom dataset keep the numpy path — this builder is
    bound to the cfg-derived chain only."""
    d = cfg.data
    if not getattr(d, "native_loader", False) or not native.available():
        return None
    # the native path covers exactly one chain shape: single raw-PCM HDF5
    # (+ optional roll/wavmix); anything else falls back to numpy
    if d.train_hdf5_extra:
        return None
    try:
        from passt_tpu.experiments.common import build_base_train_dataset

        base = build_base_train_dataset(cfg, d.train_hdf5, d.seed)
        return NativeBatchBuilder(
            base,
            roll_shift_range=d.roll_shift_range if d.roll else 0,
            wavmix=d.wavmix,
            merge_masks=d.merge_mask_wavmix,
            seed=d.seed + 31,
            num_workers=d.num_workers,
        )
    except (TypeError, ValueError):
        return None
