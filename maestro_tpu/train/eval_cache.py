"""Frozen-trunk val feature cache: device-resident tier + host spill.

In the probe phase the entire trunk — patch embeds, per-group encoders and
the shared inter trunk — is frozen (train/optim.py trains the 'head' role
only) and the runtime PINS val/test loaders to epoch 0
(``Experiment._run_eval_epoch`` calls ``set_epoch(0)`` before every eval
pass — without the pin, loaders auto-advance their epoch, which reshuffles
the drop_last remainder and re-rolls the per-(seed, epoch, idx) date-window
offsets, so val batches would NOT be epoch-constant).  With the pin, the
trunk features of every val batch are identical across epochs.  The first
val eval therefore computes them once through ``make_feature_step``; every
later val eval re-runs only the heads via ``make_head_eval_step`` — the
trunk forward, and the raster reads behind it, are skipped entirely
(measured 4.5x per val batch on a v5e: scripts/bench_eval_cache.py).
``verify_replay`` backstops the invariance assumption at runtime: on the
first replay epoch it recomputes batch 0's features through the real
loader and disables the cache (falling back to full eval) on mismatch.

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


def clamp_device_cap(cap_bytes: int) -> int:
    """Clamp the HBM-resident tier to at most half the currently-free HBM.

    ``trainer.probe_eval_cache_device_gb`` is a static config; on a tightly
    packed chip (large batch, no remat) the full 2 GiB default could OOM a
    phase that previously fit.  Training activations are not resident at
    cache-construction time, so only half of the free headroom is claimed;
    batches past the clamped tier spill to host, which is always correct.
    Backends without memory_stats (CPU tests) keep the configured cap.
    """
    try:
        stats = jax.local_devices()[0].memory_stats()
        free = int(stats["bytes_limit"]) - int(stats["bytes_in_use"])
    except Exception:  # noqa: BLE001 - stats are best-effort per backend
        return cap_bytes
    clamped = max(0, min(cap_bytes, free // 2))
    if clamped < cap_bytes:
        log.info(
            "val feature cache: device tier clamped %.2f -> %.2f GiB "
            "(half of free HBM); overflow spills to host",
            cap_bytes / 2**30, clamped / 2**30,
        )
    return clamped


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

    def verify_replay(self, params, loader, device_batch_fn) -> bool:
        """One-shot invariance guard, run before the FIRST cached replay.

        Recomputes the features of the val loader's batch 0 and compares
        them to the cached entry.  The runtime pins the loader to epoch 0,
        so a mismatch means the premise is broken anyway (a wrapper that
        drops ``set_epoch``, or sample randomness outside the epoch rng) —
        the cache is disabled and later epochs fall back to full eval.
        Cost: one batch read + one feature pass, once per phase.
        """
        if self.disabled or not self.ready or not self.entries:
            return not self.disabled
        np_batch = next(iter(loader), None)
        if np_batch is None:  # empty loader: nothing to compare
            return True
        fresh = self.feature_step(params, device_batch_fn(np_batch))
        cached = self.entries[0].feats
        fresh_h = jax.device_get(fresh)
        cached_h = (
            jax.device_get(cached) if self.entries[0].on_device else cached
        )
        flat_f, flat_c = jax.tree.leaves(fresh_h), jax.tree.leaves(cached_h)
        ok = len(flat_f) == len(flat_c) and all(
            a.shape == b.shape
            # identical params + identical batch through the same jitted fn
            # reproduce bitwise on one device; the loose band only absorbs
            # nondeterministic reductions on exotic backends
            and np.allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-3, atol=1e-4,
            )
            for a, b in zip(flat_f, flat_c)
        )
        if not ok:
            self.disabled = True
            self.ready = False
            self.entries.clear()
            self.device_nbytes = 0
            log.warning(
                "val feature cache replay guard: batch-0 features changed "
                "between epochs (val stream is not epoch-invariant here) - "
                "cache disabled, falling back to full per-epoch eval",
            )
        return ok
