"""Grain-based host pipeline (multiprocess alternative to the thread loader).

The north-star design replaces the reference's torch DataLoader worker
processes with a grain pipeline (BASELINE.json).  This wraps the map-style
``EODataset`` in ``grain.MapDataset`` with shuffling, epoch slicing, batching
and multiprocess prefetch; it yields the same collated numpy batches as
``EOBatchLoader`` and shards per JAX process for multi-host training.
"""

from __future__ import annotations

import numpy as np

try:
    import grain

    HAS_GRAIN = True
except ImportError:  # pragma: no cover
    HAS_GRAIN = False


class GrainBatchLoader:
    """Iterable over collated numpy batches via grain (multiprocess)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 8,
        seed: int = 0,
        shard_index: int = 0,
        shard_count: int = 1,
    ) -> None:
        if not HAS_GRAIN:
            msg = "grain is not installed; use data.loader.EOBatchLoader."
            raise ImportError(msg)
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.seed = seed
        self.shard_index = shard_index
        self.shard_count = shard_count
        self._epoch = 0
        self.skip_batches = 0  # consumed by the next __iter__ (fast-forward)
        self._auto_epoch = True

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle epoch (deterministic across process restarts)."""
        self._epoch = epoch
        self._auto_epoch = False

    def __len__(self) -> int:
        n = len(self.dataset) // self.shard_count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        if hasattr(self.dataset, "set_epoch"):
            # workers pickle the dataset, so the epoch travels with it
            self.dataset.set_epoch(self._epoch)
        ds = grain.MapDataset.source(self.dataset)
        if self.shard_count > 1:
            ds = ds[self.shard_index :: self.shard_count]
        if self.shuffle:
            ds = ds.shuffle(seed=self.seed + self._epoch)
        if self.shard_count > 1:
            # strided shards differ by up to one sample; under drop_remainder
            # that can give hosts different batch counts and deadlock SPMD
            # collectives at epoch end. Truncate every host to the uniform
            # length (after the shuffle, so the dropped sample rotates).
            ds = ds[: len(self.dataset) // self.shard_count]
        if self._auto_epoch:
            self._epoch += 1
        if self.skip_batches:
            ds = ds[self.skip_batches * self.batch_size :]  # skip pre-decode
            self.skip_batches = 0
        ds = ds.batch(self.batch_size, drop_remainder=self.drop_last)
        it = ds.to_iter_dataset()
        if self.num_workers > 1:
            it = it.mp_prefetch(
                grain.MultiprocessingOptions(num_workers=self.num_workers),
            )
        for batch in it:
            # grain batches dict samples into dict-of-stacked-arrays already
            yield {k: np.asarray(v) for k, v in batch.items()}
