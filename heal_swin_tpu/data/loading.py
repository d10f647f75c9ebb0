"""Host-side data loading: map-style datasets -> batched numpy iterators with
background-thread prefetch.

Replaces torch DataLoader workers (the reference uses 2-5 worker processes reading
pre-projected .npz per sample).  On TPU the input pipeline only has to keep one device
fed; a prefetch thread pool decoding into pinned numpy is enough, and the heavy
projection work is precomputed (or fused on device, see projection module).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np


def default_collate(samples):
    """Stack dict-of-arrays / tuple-of-arrays samples into batched numpy arrays."""
    first = samples[0]
    if isinstance(first, dict):
        out = {}
        for k in first:
            vals = [s[k] for s in samples]
            if isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]):
                out[k] = np.stack([np.asarray(v) for v in vals])
            else:
                out[k] = vals  # lists of strings / objects stay lists
        return out
    if isinstance(first, (tuple, list)):
        return tuple(default_collate([s[i] for s in samples]) for i in range(len(first)))
    return np.stack([np.asarray(s) for s in samples])


def pred_overfit_indices(train_dataset, train_indices, pred_dataset):
    """Predict-dataset indices matching the manual-overfit train subset by name
    (reference hp_datasets.py:297-307 ``get_pred_overfit_sampler``): with
    ``manual_overfit_batches`` the predict loader must rank/score exactly the
    overfit samples, not the whole train split."""
    train_names = list(train_dataset.names)
    pred_names = list(pred_dataset.names)
    idcs = [pred_names.index(train_names[int(i)]) for i in train_indices]
    assert len(idcs) == len(train_indices)
    return np.asarray(idcs, dtype=np.int64)


class DataLoader:
    """Deterministic, seedable batching over a map-style dataset.

    shuffle uses a per-epoch RandomState(seed + epoch); call set_epoch() before each
    epoch for reshuffling (like DistributedSampler.set_epoch).
    ``indices``: optional fixed subset (manual-overfit machinery).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        collate_fn: Optional[Callable] = None,
        indices: Optional[Sequence[int]] = None,
        prefetch: int = 2,
        num_threads: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.collate_fn = collate_fn or default_collate
        self.indices = np.asarray(indices) if indices is not None else None
        self.prefetch = prefetch
        self.num_threads = num_threads
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _order(self) -> np.ndarray:
        idx = self.indices if self.indices is not None else np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            idx = idx[rng.permutation(len(idx))]
        return idx

    def __len__(self):
        n = len(self.indices) if self.indices is not None else len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        order = self._order()
        n = len(order)
        batches = []
        for start in range(0, n, self.batch_size):
            chunk = order[start : start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            batches.append(chunk)

        if self.prefetch <= 0:
            for chunk in batches:
                yield self.collate_fn([self.dataset[int(i)] for i in chunk])
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that honors stop: a plain q.put() would park the worker
            # forever when the consumer abandons the iterator mid-epoch (early
            # break, exception in the train step) with the queue full — leaking
            # the thread and prefetch+1 collated batches per abandoned epoch
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    pass
            return False

        def worker():
            try:
                for chunk in batches:
                    if stop.is_set():
                        return
                    samples = [self.dataset[int(i)] for i in chunk]
                    if not put(self.collate_fn(samples)):
                        return
                put(None)
            except BaseException as e:  # propagate into consumer
                put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
