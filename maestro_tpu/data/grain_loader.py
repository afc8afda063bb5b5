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


class _Reindexed:
    """Map-style view ``dataset[order[i]]`` (picklable for mp_prefetch)."""

    def __init__(self, dataset, order) -> None:
        self.dataset, self.order = dataset, order

    def __len__(self) -> int:
        return len(self.order)

    def __getitem__(self, i):
        return self.dataset[int(self.order[i])]


class GrainBatchLoader:
    """Iterable over collated numpy batches via grain (multiprocess).

    Produces the IDENTICAL (shuffle-then-stride) sample partition as
    ``EOBatchLoader`` for the same (seed, epoch, shard), so the loader choice
    is pure performance and mixed-loader hosts can never desynchronize the
    sample streams.  The runtime still pins ONE loader per run (see
    ``data.loader.pin_loader``) and records it in checkpoint meta.
    """

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
        # global shuffle with the SAME rng derivation as EOBatchLoader._batches
        # (np rng seeded [seed, epoch]), THEN stride-shard — identical
        # partition, so threads<->grain is a pure performance choice
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng([self.seed, self._epoch]).shuffle(order)
        if self.shard_count > 1:
            order = order[self.shard_index :: self.shard_count]
        # truncate every host to the uniform batch count (strided shards
        # differ by up to one sample; unequal counts deadlock SPMD
        # collectives at epoch end) — same arithmetic as EOBatchLoader
        order = order[: len(self) * self.batch_size]
        if self._auto_epoch:
            self._epoch += 1
        if self.skip_batches:
            order = order[self.skip_batches * self.batch_size :]
            self.skip_batches = 0
        ds = grain.MapDataset.source(_Reindexed(self.dataset, order))
        ds = ds.batch(self.batch_size, drop_remainder=self.drop_last)
        it = ds.to_iter_dataset()
        if self.num_workers > 1:
            it = it.mp_prefetch(
                grain.MultiprocessingOptions(num_workers=self.num_workers),
            )
        for batch in it:
            # grain batches dict samples into dict-of-stacked-arrays already
            yield {k: np.asarray(v) for k, v in batch.items()}
