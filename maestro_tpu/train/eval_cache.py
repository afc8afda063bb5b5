"""Host-RAM cache of frozen-trunk features for the probe val split.

In the probe phase the entire trunk — patch embeds, per-group encoders and
the shared inter trunk — is frozen (train/optim.py trains the 'head' role
only) and val loaders never advance their epoch rng (train/runtime.py calls
``set_epoch`` on the train loader only), so the trunk features of every val
batch are identical across epochs.  The first val eval therefore computes
them once through ``make_feature_step`` and stashes a host copy (bf16, plus
the per-target label arrays); every later val eval re-runs only the heads
via ``make_head_eval_step`` — the trunk forward, and the raster decode
behind it, are skipped entirely.

Guard rails:

- capped by ``trainer.probe_eval_cache_gb``: crossing the cap disables the
  cache for the phase (entries dropped, one warning) rather than growing
  without bound on a large val split;
- single-process only (the runtime gates on ``jax.process_count() == 1``):
  a multi-host val batch is not fully addressable, so a host copy would
  need a cross-host gather this cache does not attempt;
- frozen-trunk phases only: probe, and a ``model.freeze=True`` baseline
  finetune (there the EMA trunk is a fixed point of the EMA update, so the
  finetune EMA eval stays valid off cached features).  An unfrozen finetune
  updates the trunk every step, so its features are never reusable — the
  runtime gate keys off the optimizer's ``freeze_phase``.  (Reference probe
  semantics — detached frozen features — are head.py:17-25; the reference
  recomputes them every epoch.)
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import numpy as np

log = logging.getLogger(__name__)


@dataclass
class ProbeEvalCache:
    """Per-batch (features, labels) store + the two jitted steps that use it.

    Lifecycle inside ``Experiment._run_eval_epoch``: while ``not ready``,
    the val loop runs ``feature_step`` + ``head_step`` per batch and calls
    ``store``; once the epoch completes, ``seal`` flips ``ready`` and later
    epochs iterate ``entries`` without touching the loader.
    """

    feature_step: Callable  # (params, batch) -> encoded (device)
    head_step: Callable     # (state, encoded, labels, metrics) -> ...
    label_keys: tuple[str, ...]
    cap_bytes: int
    entries: list[tuple[Any, Any]] = field(default_factory=list)
    nbytes: int = 0
    ready: bool = False
    disabled: bool = False
    # observability: how many head-only evals ran off the cache
    hit_epochs: int = 0

    def store(self, encoded, np_labels: dict) -> None:
        """Stash one val batch: device features -> host, labels as-is."""
        if self.disabled:
            return
        feats = jax.device_get(encoded)
        labels = {k: np.asarray(v) for k, v in np_labels.items()}
        self.nbytes += sum(x.nbytes for x in jax.tree.leaves(feats))
        self.nbytes += sum(v.nbytes for v in labels.values())
        if self.nbytes > self.cap_bytes:
            self.disabled = True
            self.entries.clear()
            log.warning(
                "probe val feature cache exceeded its %.1f GiB cap - "
                "disabled for this phase (trainer.probe_eval_cache_gb "
                "raises it)", self.cap_bytes / 2**30,
            )
            return
        self.entries.append((feats, labels))

    def seal(self) -> None:
        """First full val pass done: later epochs replay from the cache."""
        if not self.disabled:
            self.ready = True
