"""Host-side batching: collate + a simple deterministic DataLoader.

Replaces torch DataLoader + the fork's custom_collate_fn (reference
trainer.py:14-108): None/malformed samples are dropped, batches with inconsistent
view counts are cropped to the minimum so the stacked batch is rectangular, and a
failed batch collates to None (the trainer skips it).  The reference pins
num_workers=0 (trainer.py:196,206); loading here is synchronous numpy as well —
decode cost is trivial next to the render step, and staying single-process keeps
determinism for tests.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np

_STACK_KEYS = ("images", "poses", "masks", "bbox", "focal", "c")


def collate(samples: List[Optional[dict]]) -> Optional[dict]:
    """Stack per-object dicts into a batch dict; returns None if nothing valid."""
    samples = [
        s
        for s in samples
        if s is not None and isinstance(s, dict) and "images" in s
    ]
    if not samples:
        return None
    try:
        min_views = min(s["images"].shape[0] for s in samples)
        batch: dict = {}
        for key in samples[0]:
            vals = [s[key] for s in samples]
            if key in _STACK_KEYS and isinstance(vals[0], np.ndarray):
                if vals[0].ndim >= 1 and key in ("images", "poses", "masks", "bbox"):
                    vals = [v[:min_views] for v in vals]
                batch[key] = np.stack(vals)
            elif key in _STACK_KEYS and np.isscalar(vals[0]):
                batch[key] = np.asarray(vals)
            else:
                batch[key] = vals  # paths / ids stay as lists
        return batch
    except Exception:
        return None


class DataLoader:
    """Deterministic, optionally shuffled batch iterator over a dataset.

    ``cache_mb`` > 0 keeps decoded samples in a size-bounded cache keyed by
    dataset index.  On a single-core host the per-epoch PNG decode (e.g. 200
    images per 4-object SRN batch) otherwise dominates the train loop; cached
    epochs skip the decode entirely.  The cache FREEZES once full instead of
    evicting: shuffled epochs visit every index per epoch (LRU's worst case —
    eviction churn with a 0% hit rate once the dataset outgrows the cap),
    whereas a frozen cache still serves cap/total of accesses.  Samples are
    treated as immutable by all consumers (collate stacks, prepare_ray_batch
    derives new arrays)."""

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        cache_mb: float = 0.0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0
        self._cache: dict = {}
        self._cache_bytes = 0
        self._cache_cap = int(cache_mb * 1e6)

    @staticmethod
    def _sample_bytes(s) -> int:
        if not isinstance(s, dict):
            return 0
        return sum(
            v.nbytes for v in s.values() if isinstance(v, np.ndarray)
        )

    def _get(self, idx: int):
        if self._cache_cap <= 0:
            return self.dataset[idx]
        if idx in self._cache:
            return self._cache[idx]
        s = self.dataset[idx]
        nb = self._sample_bytes(s)
        if 0 < nb and self._cache_bytes + nb <= self._cache_cap:
            self._cache[idx] = s
            self._cache_bytes += nb
        return s

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 100003 + self.epoch)
            rng.shuffle(order)
        for start in range(0, n, self.batch_size):
            idxs = order[start : start + self.batch_size]
            if self.drop_last and len(idxs) < self.batch_size:
                return
            samples = []
            for i in idxs:
                try:
                    samples.append(self._get(int(i)))
                except Exception as e:  # bad-data tolerance (trainer.py:14-108)
                    print(f"Warning: skipping sample {i}: {e}")
                    samples.append(None)
            batch = collate(samples)
            if batch is not None:
                yield batch
