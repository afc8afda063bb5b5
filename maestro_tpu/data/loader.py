"""Host batch loader: parallel sample reads + numpy collation + prefetch.

Replaces the reference's torch DataLoader (12 worker processes,
/root/reference/maestro/train/data.py).  Raster decoding is numpy and releases
the GIL inside h5py/imageio, so a thread pool + double-buffered prefetch keeps
the TPU fed; a grain-based pipeline can be swapped in via the same interface.
All splits iterate shuffled with drop_last (reference data.py:38-44).
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def collate(samples: list[dict[str, np.ndarray]]) -> dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples], axis=0) for k in keys}


class EOBatchLoader:
    """Iterable over collated numpy batches with background prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 8,
        prefetch: int = 2,
        seed: int = 0,
        shard_index: int = 0,
        shard_count: int = 1,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.prefetch = prefetch
        self.seed = seed
        self.shard_index = shard_index
        self.shard_count = shard_count
        # per-epoch order is a pure function of (seed, epoch) so a restarted
        # process reproduces it exactly (mid-epoch preemption resume); the
        # runtime drives set_epoch, standalone use auto-increments per pass
        self.epoch = 0
        self.skip_batches = 0  # consumed by the next __iter__ (fast-forward)
        self._auto_epoch = True

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        self._auto_epoch = False

    def __len__(self) -> int:
        n = len(self.dataset) // self.shard_count
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> list[np.ndarray]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            # same (seed, epoch) on every host -> same order
            np.random.default_rng([self.seed, self.epoch]).shuffle(order)
        if self.shard_count > 1:
            order = order[self.shard_index :: self.shard_count]
        nb = len(self)
        return [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(nb)
        ]

    def __iter__(self):
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self.epoch)  # per-(epoch, idx) sample rng
        batches = self._batches()
        if self.skip_batches:
            batches = batches[self.skip_batches :]  # no decode for skipped
            self.skip_batches = 0
        if self._auto_epoch:
            self.epoch += 1
        out: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            """Blocking put that gives up once the consumer is gone — a
            producer parked in ``Queue.put`` on a full prefetch queue would
            otherwise leak its thread (and the pool) on early break."""
            while not stop.is_set():
                try:
                    out.put(item, timeout=0.2)
                except queue.Full:
                    continue
                return True
            return False

        def produce() -> None:
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for idxs in batches:
                        if stop.is_set():
                            return
                        batch = collate(
                            list(pool.map(self.dataset.__getitem__, idxs)),
                        )
                        if not put(batch):
                            return
                put(None)
            except BaseException as exc:  # noqa: BLE001 - a decode error must
                put(exc)  # reach the consumer, not hang it on out.get()

        worker = threading.Thread(target=produce, daemon=True)
        worker.start()
        try:
            while True:
                batch = out.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()


def resolve_loader(data_cfg) -> str:
    """Resolve ``data_cfg.loader``; "auto" picks what can feed the chip.

    The thread pool is GIL-bound on decode-heavy pipelines: on a 1-core host
    it peaks at ~17 samples/s vs ~353 for the grain multiprocess pipeline,
    while the device consumes ~226 (docs/PERFORMANCE.md "Input pipeline").
    Real TPU hosts have enough cores for threads to scale, so "auto" selects
    grain only when the host is core-starved relative to the configured
    worker count — and only for production-sized pools (small test pools keep
    the cheap in-process loader).  Falls back to threads if grain is absent.
    """
    if data_cfg.loader != "auto":
        return data_cfg.loader
    cores = os.cpu_count() or 1
    if data_cfg.num_workers >= 4 and cores < 2 * data_cfg.num_workers:
        try:
            import grain  # noqa: F401
        except ImportError:
            return "threads"
        return "grain"
    return "threads"


def pin_loader(data_cfg) -> str:
    """Resolve ``data_cfg.loader`` ONCE for the whole run and pin it.

    ``resolve_loader`` consults ``os.cpu_count()``, which differs across
    heterogeneous hosts — process 0's choice is broadcast so every host uses
    the same pipeline, and the concrete value is written back into
    ``data_cfg.loader`` so ``config_resolved.json`` and checkpoint meta
    record it (an interrupted run must resume under the same loader;
    fit_phase refuses otherwise).  Idempotent once pinned.
    """
    choice = resolve_loader(data_cfg)
    import jax

    if jax.process_count() > 1:
        import numpy as np
        from jax.experimental import multihost_utils

        code = np.asarray([1 if choice == "grain" else 0], np.int32)
        code = multihost_utils.broadcast_one_to_all(code)
        choice = "grain" if int(code[0]) else "threads"
    data_cfg.loader = choice
    return choice


def make_loader(
    datasets_cfg,
    data_cfg,
    stage: str,
    ssl_phase: str,
    batch_size: int,
    seed: int = 0,
    shard_index: int = 0,
    shard_count: int = 1,
):
    """Build (dataset, loader) for one (stage, phase), mirroring SSLDataModule.

    ``batch_size`` is the per-process batch; multi-host runs shard the sample
    order by (shard_index, shard_count) so every host reads a disjoint slice
    (reference: Lightning's DistributedSampler under num_nodes>1).
    ``data_cfg.loader`` selects the thread pool ("threads"), the grain
    multiprocess pipeline ("grain") for decode-bound datasets, or "auto"
    (see ``resolve_loader``).
    """
    from maestro_tpu.data.datasets import DATASET_CLASSES

    ds_cls = DATASET_CLASSES[datasets_cfg.name_dataset]
    root = (
        f"{datasets_cfg.root_dir}/{datasets_cfg.dataset.rel_dir}"
        if datasets_cfg.dataset.rel_dir
        else datasets_cfg.root_dir
    )
    dataset = ds_cls(
        datasets_cfg.dataset,
        root,
        stage,
        use_transform=data_cfg.use_transform and stage == "train",
        random_dates=data_cfg.random_dates,
        random_crop=data_cfg.random_crop,
        ssl_phase=ssl_phase,
        seed=seed,
    )
    if resolve_loader(data_cfg) == "grain":
        from maestro_tpu.data.grain_loader import GrainBatchLoader

        loader = GrainBatchLoader(
            dataset,
            batch_size=batch_size,
            shuffle=True,
            drop_last=True,
            num_workers=data_cfg.num_workers,
            seed=seed,
            shard_index=shard_index,
            shard_count=shard_count,
        )
    else:
        loader = EOBatchLoader(
            dataset,
            batch_size=batch_size,
            shuffle=True,
            drop_last=True,
            num_workers=data_cfg.num_workers,
            prefetch=data_cfg.prefetch,
            seed=seed,
            shard_index=shard_index,
            shard_count=shard_count,
        )
    return dataset, loader
