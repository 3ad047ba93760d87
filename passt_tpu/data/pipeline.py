"""Batching and prefetch: the host data plane feeding the TPU.

The reference uses torch DataLoader with 16 decode workers per GPU
(ex_audioset.py:42-48). Here the loader is torch-free: a sampler drives
dataset reads, items are collated to dense numpy batches, and a
double-buffered background-thread prefetcher overlaps host IO/augmentation
with device steps. (The C++ native plane can plug in as a decoder /
collator backend; see native/.)
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import numpy as np

from passt_tpu.data.datasets import AudioDataset


def default_collate(items, pad_to_multiple: int = 0) -> Dict[str, np.ndarray]:
    """(waveform, name, target) items -> {'wave': [B, T], 'target': [B, C],
    'name': list}. Variable-length waveforms are zero-padded to the batch
    max (clip_length=None variable-length eval; the reference uses
    batch_size=1 there, fsd50k/dataset.py). ``pad_to_multiple`` (samples)
    additionally rounds the batch length up so the number of distinct padded
    shapes — and hence jit recompiles — stays bounded."""
    waves = [np.asarray(it[0]).reshape(-1) for it in items]
    names = [it[1] for it in items]
    targets = [np.asarray(it[2]) for it in items]
    t_max = max(len(w) for w in waves)
    if pad_to_multiple:
        t_max = -(-t_max // pad_to_multiple) * pad_to_multiple
    wave = np.zeros((len(waves), t_max), dtype=np.float32)
    for i, w in enumerate(waves):
        wave[i, : len(w)] = w
    return {
        "wave": wave,
        "target": np.stack(targets).astype(np.float32),
        "name": names,
    }


class DataLoader:
    """Sampler-driven batch iterator.

    ``set_epoch`` must be called per epoch to reseed epoch-dependent
    samplers (the reference sets ``reload_dataloaders_every_epoch=True``
    for exactly this purpose, ex_audioset.py:75).
    """

    def __init__(
        self,
        dataset: AudioDataset,
        batch_size: int,
        sampler,
        collate: Callable = default_collate,
        drop_last: bool = False,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.collate = collate
        self.drop_last = drop_last
        self.prefetch = prefetch

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _iter_batches(self) -> Iterator[Dict[str, np.ndarray]]:
        buf = []
        for idx in self.sampler:
            buf.append(self.dataset[idx])
            if len(buf) == self.batch_size:
                yield self.collate(buf)
                buf = []
        if buf and not self.drop_last:
            yield self.collate(buf)

    def __iter__(self):
        it = self._iter_batches()
        if self.prefetch > 0:
            return Prefetcher(it, depth=self.prefetch)
        return it


class Prefetcher:
    """Background-thread prefetch with a bounded queue.

    Call :meth:`stop` (or break out via a ``closing``-style pattern) when
    abandoning the iterator early — otherwise the worker thread would stay
    blocked on the bounded queue holding batches and file handles
    (limit_train_batches/limit_eval_batches break mid-stream every epoch)."""

    _DONE = object()

    def __init__(self, iterator: Iterator, depth: int = 2):
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self.error: Optional[BaseException] = None
        self._stopped = False

        def worker():
            try:
                for item in iterator:
                    while not self._stopped:
                        try:
                            self.q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if self._stopped:
                        return
            except BaseException as e:  # propagate into consumer
                self.error = e
            finally:
                # The DONE sentinel must reach the consumer even when the
                # bounded queue is full at error time — a put_nowait here
                # would silently drop it and deadlock the consumer on
                # q.get(). Retry with the same bounded loop used for items.
                while not self._stopped:
                    try:
                        self.q.put(self._DONE, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self.thread = threading.Thread(target=worker, daemon=True)
        self.thread.start()

    def stop(self) -> None:
        """Release the worker thread and drop queued batches."""
        self._stopped = True
        while True:
            try:
                self.q.get_nowait()
            except queue.Empty:
                break

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            try:
                item = self.q.get(timeout=5.0)
                break
            except queue.Empty:
                if not self.thread.is_alive():
                    # Worker exited without enqueueing DONE (can only happen
                    # if it was killed hard) — don't hang the consumer.
                    if self.error is not None:
                        raise self.error
                    raise StopIteration
        if item is self._DONE:
            if self.error is not None:
                raise self.error
            raise StopIteration
        return item
