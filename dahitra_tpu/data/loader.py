"""Batch loader: host indexing + background prefetch onto the device mesh.

Replaces torch DataLoader worker processes (utils.py:78-80): the heavy work
(augmentation) happens on device, so the host stage is uint8 slicing — a
single prefetch thread keeps the device fed. Shuffle semantics follow the
reference: training loaders shuffle per epoch (utils.py:78), and the
standalone ``get_loader`` path never shuffles (utils.py:35 hardcodes
shuffle=False — preserved by default for eval).
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


class BatchLoader:
    def __init__(self, arrays: Dict[str, np.ndarray], batch_size: int,
                 shuffle: bool = False, seed: int = 0, drop_last: bool = False,
                 pad_to_multiple: Optional[int] = None):
        self.arrays = arrays
        n = len(next(iter(arrays.values())))
        assert all(len(v) == n for v in arrays.values())
        self.n = n
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_to_multiple = pad_to_multiple
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    def _epoch_batches(self) -> Iterator[Dict[str, np.ndarray]]:
        order = (self._rng.permutation(self.n) if self.shuffle
                 else np.arange(self.n))
        bs = self.batch_size
        stop = (self.n // bs) * bs if self.drop_last else self.n
        for start in range(0, stop, bs):
            idx = order[start:start + bs]
            batch = {k: v[idx] for k, v in self.arrays.items()}
            if self.pad_to_multiple:
                # Pad ragged batches by repeating the first sample. Padding
                # is marked two ways so no metric path can count it: the
                # CD 'label' key becomes the 255 ignore value, and a per-
                # sample 'valid' vector (1 real, 0 pad) rides along for
                # consumers without an ignore label (the xBD dice/F1 path).
                pad = (-len(idx)) % self.pad_to_multiple
                if pad:
                    for k, v in batch.items():
                        filler = np.repeat(v[:1], pad, axis=0)
                        if k == "label":
                            filler = np.full_like(filler, 255)
                        batch[k] = np.concatenate([v, filler], axis=0)
                batch["valid"] = np.concatenate(
                    [np.ones(len(idx), np.bool_), np.zeros(pad, np.bool_)])
            yield batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """Iterate one epoch with single-batch lookahead prefetch."""
        q: queue.Queue = queue.Queue(maxsize=2)
        sentinel = object()

        def worker():
            try:
                for b in self._epoch_batches():
                    q.put(b)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
