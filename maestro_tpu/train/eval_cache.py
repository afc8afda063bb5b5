"""Frozen-trunk val feature cache: device-resident tier + host spill.

In the probe phase the entire trunk — patch embeds, per-group encoders and
the shared inter trunk — is frozen (train/optim.py trains the 'head' role
only) and val loaders never advance their epoch rng (train/runtime.py calls
``set_epoch`` on the train loader only), so the trunk features of every val
batch are identical across epochs.  The first val eval therefore computes
them once through ``make_feature_step``; every later val eval re-runs only
the heads via ``make_head_eval_step`` — the trunk forward, and the raster
reads behind it, are skipped entirely (measured 4.5x per val batch on a
v5e: scripts/bench_eval_cache.py).

Two storage tiers, because device<->host bandwidth is the whole game:

- **device tier** (first ``trainer.probe_eval_cache_device_gb``): the
  feature arrays the feature step just produced are simply kept alive in
  HBM — zero copies in either direction.  This is the fast path; on a
  host-attached TPU VM the spill tier is fine too, but through a remote
  device tunnel a host round-trip of one FLAIR val batch (132 MB) costs
  seconds, so HBM residency is the default for as much as fits.
- **host spill** (up to ``trainer.probe_eval_cache_gb`` total): batches
  past the device budget are copied to host RAM (bf16) and ``device_put``
  back on replay.

Guard rails:

- crossing the TOTAL cap disables the cache for the phase (entries
  dropped, one warning) rather than growing without bound on a large val
  split;
- single-process only (the runtime gates on ``jax.process_count() == 1``):
  a multi-host val batch is not fully addressable, so a host copy would
  need a cross-host gather this cache does not attempt;
- frozen-trunk phases only: probe, and a ``model.freeze=True`` baseline
  finetune (there the EMA trunk is a fixed point of the EMA update, so the
  finetune EMA eval stays valid off cached features).  An unfrozen
  finetune updates the trunk every step, so its features are never
  reusable — the runtime gate keys off the optimizer's ``freeze_phase``.
  (Reference probe semantics — detached frozen features — are
  head.py:17-25; the reference recomputes them every epoch.)
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import numpy as np

log = logging.getLogger(__name__)


@dataclass
class CacheEntry:
    feats: Any            # device pytree (on_device) or host pytree
    labels: dict          # host label arrays (small)
    on_device: bool


@dataclass
class ProbeEvalCache:
    """Per-batch feature store + the two jitted steps that use it.

    Lifecycle inside ``Experiment._run_eval_epoch``: while ``not ready``,
    the val loop runs ``feature_step`` + ``head_step`` per batch and calls
    ``store``; once the epoch completes, ``seal`` flips ``ready`` and later
    epochs iterate ``entries`` without touching the loader.
    """

    feature_step: Callable  # (params, batch) -> encoded (device)
    head_step: Callable     # (state, encoded, labels, metrics) -> ...
    label_keys: tuple[str, ...]
    cap_bytes: int
    device_cap_bytes: int = 0
    entries: list[CacheEntry] = field(default_factory=list)
    nbytes: int = 0
    device_nbytes: int = 0
    ready: bool = False
    disabled: bool = False
    # observability: how many head-only evals ran off the cache
    hit_epochs: int = 0

    def store(self, encoded, np_labels: dict) -> None:
        """Stash one val batch: keep in HBM under the device budget, else
        copy to host."""
        if self.disabled:
            return
        feat_bytes = sum(x.nbytes for x in jax.tree.leaves(encoded))
        labels = {k: np.asarray(v) for k, v in np_labels.items()}
        self.nbytes += feat_bytes + sum(v.nbytes for v in labels.values())
        if self.nbytes > self.cap_bytes:
            self.disabled = True
            self.entries.clear()
            self.device_nbytes = 0
            log.warning(
                "frozen-trunk val feature cache exceeded its %.1f GiB cap - "
                "disabled for this phase (trainer.probe_eval_cache_gb "
                "raises it)", self.cap_bytes / 2**30,
            )
            return
        on_device = self.device_nbytes + feat_bytes <= self.device_cap_bytes
        if on_device:
            self.device_nbytes += feat_bytes
            feats = encoded  # keep the live device arrays - no copy at all
        else:
            feats = jax.device_get(encoded)
        self.entries.append(CacheEntry(feats, labels, on_device))

    def seal(self) -> None:
        """First full val pass done: later epochs replay from the cache."""
        if not self.disabled:
            self.ready = True
            spilled = sum(1 for e in self.entries if not e.on_device)
            if spilled:
                log.info(
                    "val feature cache: %d/%d batches HBM-resident "
                    "(%.2f GiB), %d spilled to host (%.2f GiB total)",
                    len(self.entries) - spilled, len(self.entries),
                    self.device_nbytes / 2**30, spilled,
                    self.nbytes / 2**30,
                )
