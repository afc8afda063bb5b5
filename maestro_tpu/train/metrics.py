"""Confusion-matrix-based metrics as pure jnp accumulators.

Reference: /root/reference/maestro/train/metric.py.

MonoLabel (classif/segment): one CxC confusion matrix; OA, macro-F1 and mIoU
averaged over classes with support.  MultiLabel: per-label 2x2 confusion
matrix for (weighted) F1 — the TreeSatAI headline metric is ``weighted_f1`` —
plus per-label score histograms (fixed bins over sigmoid scores) from which
average precision is computed; the reference stores every prediction and
computes exact AP, here the PR curve is evaluated on a fine fixed-threshold
grid (4096 bins), which is the thresholds= variant torchmetrics also exposes.

Accumulator states are plain pytrees of integer arrays: adding them is the
cross-device reduction (``jax.lax.psum`` inside a step, or a host-side sum
across processes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NUM_AP_BINS = 4096


# --------------------------------------------------------------------------
# mono-label (classif / segment)
# --------------------------------------------------------------------------
# The confusion matrix accumulates per-pixel counts over a full epoch: a
# FLAIR-HUB train epoch is ~2e10 pixels, so a single int32 cell overflows
# (the reference's torchmetrics state is int64; TPU jax has no native int64
# without global x64).  Two int32 limbs keep counts exact to 2^51:
# ``lo`` holds < 2^LO_BITS per cell, the excess rolls into ``hi``.
LO_BITS = 20


def monolabel_init(num_classes: int) -> dict[str, jnp.ndarray]:
    z = jnp.zeros((num_classes, num_classes), dtype=jnp.int32)
    return {"hi": z, "lo": z}


def monolabel_cm(state: dict[str, jnp.ndarray]) -> np.ndarray:
    """Materialize the exact int64 confusion matrix on the host."""
    hi = np.asarray(state["hi"], dtype=np.int64)
    lo = np.asarray(state["lo"], dtype=np.int64)
    return (hi << LO_BITS) + lo


def monolabel_update(
    state: dict[str, jnp.ndarray],
    logits: jnp.ndarray | None,  # [N, C] (or None with precomputed preds)
    labels: jnp.ndarray,  # [N] int
    valid: jnp.ndarray,  # [N] bool
    preds: jnp.ndarray | None = None,  # [N] int argmax, skips the logits
) -> dict[str, jnp.ndarray]:
    num_classes = state["lo"].shape[0]
    if preds is None:
        preds = jnp.argmax(logits, axis=-1)
    labels = jnp.clip(labels, 0, num_classes - 1)
    # One-hot dot_general instead of cm.at[labels, preds].add: the pixel-level
    # scatter-add serializes on TPU (73 ms for one 8.4M-pixel FLAIR batch vs
    # <1 ms for the MXU dot; measured on v5e).  bf16 one-hots are exact and
    # fp32 accumulation is exact for counts < 2^24, guaranteed by chunking.
    cls = jnp.arange(num_classes, dtype=jnp.int32)
    chunk = 1 << 23
    lo = state["lo"]
    for off in range(0, labels.shape[0], chunk):
        la, pr, va = (x[off : off + chunk] for x in (labels, preds, valid))
        oh_t = ((la[:, None] == cls) & va[:, None]).astype(jnp.bfloat16)
        oh_p = (pr[:, None] == cls).astype(jnp.bfloat16)
        upd = jax.lax.dot_general(
            oh_t, oh_p, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        lo = lo + upd.astype(jnp.int32)
    # roll the excess into hi; lo stays < 2^LO_BITS (exact for any batch
    # size: lo < 2^LO_BITS + N_pixels << 2^31 before normalization)
    return {"hi": state["hi"] + (lo >> LO_BITS), "lo": lo & ((1 << LO_BITS) - 1)}


def monolabel_compute(state: dict[str, jnp.ndarray]) -> dict[str, jnp.ndarray]:
    # host-side, exact int64 -> float64 (called once per epoch)
    cm = monolabel_cm(state).astype(np.float64)
    tp = jnp.diag(cm)
    fp = cm.sum(axis=0) - tp
    fn = cm.sum(axis=1) - tp

    f1 = 2 * tp / jnp.maximum(2 * tp + fp + fn, 1e-12)
    iou = tp / jnp.maximum(tp + fp + fn, 1e-12)
    support = (tp + fn) > 0
    n_sup = jnp.maximum(support.sum(), 1)
    return {
        "overall_accuracy": jnp.trace(cm) / jnp.maximum(cm.sum(), 1e-12),
        "average_f1": jnp.sum(f1 * support) / n_sup,
        "average_iou": jnp.sum(iou * support) / n_sup,
    }


# --------------------------------------------------------------------------
# multi-label
# --------------------------------------------------------------------------
def multilabel_init(num_labels: int) -> dict[str, jnp.ndarray]:
    return {
        "cm": jnp.zeros((num_labels, 2, 2), dtype=jnp.int32),
        # score histograms per (label, class in {neg, pos})
        "hist": jnp.zeros((num_labels, 2, NUM_AP_BINS), dtype=jnp.int32),
    }


def multilabel_update(
    state: dict[str, jnp.ndarray],
    logits: jnp.ndarray,  # [N, K]
    labels: jnp.ndarray,  # [N, K] 0/1
    valid: jnp.ndarray,  # [N] bool
    threshold: float = 0.5,
) -> dict[str, jnp.ndarray]:
    scores = jnp.where(valid[:, None], 1.0 / (1.0 + jnp.exp(-logits)), -1.0)
    y = labels.astype(jnp.int32)
    w = valid.astype(jnp.int32)[:, None]

    pred = (scores > threshold).astype(jnp.int32)
    cm = state["cm"]
    for t in (0, 1):
        for p in (0, 1):
            inc = ((y == t) & (pred == p)).astype(jnp.int32) * w
            cm = cm.at[:, t, p].add(inc.sum(axis=0))

    bins = jnp.clip(
        (scores * NUM_AP_BINS).astype(jnp.int32), 0, NUM_AP_BINS - 1,
    )  # invalid rows have score -1 -> bin 0 with weight 0
    hist = state["hist"]
    k = logits.shape[1]
    label_idx = jnp.broadcast_to(jnp.arange(k)[None, :], bins.shape)
    hist = hist.at[label_idx, y, bins].add(w)
    return {"cm": cm, "hist": hist}


def multilabel_compute(state: dict[str, jnp.ndarray]) -> dict[str, jnp.ndarray]:
    cm = state["cm"].astype(jnp.float64)
    tp = cm[:, 1, 1]
    fp = cm[:, 0, 1]
    fn = cm[:, 1, 0]
    weights = (tp + fn) / jnp.maximum((tp + fn).sum(), 1e-12)
    f1 = 2 * tp / jnp.maximum(2 * tp + fp + fn, 1e-12)

    # AP from binned PR curve: descending-threshold cumulative counts
    hist = state["hist"].astype(jnp.float64)
    pos = jnp.cumsum(hist[:, 1, ::-1], axis=1)  # predicted-positive positives
    neg = jnp.cumsum(hist[:, 0, ::-1], axis=1)
    precision = pos / jnp.maximum(pos + neg, 1e-12)
    total_pos = jnp.maximum(hist[:, 1].sum(axis=1), 1e-12)
    recall = pos / total_pos[:, None]
    # AP = sum over thresholds of (recall_i - recall_{i-1}) * precision_i
    drecall = jnp.diff(recall, axis=1, prepend=0.0)
    ap = jnp.sum(drecall * precision, axis=1)

    has_support = (tp + fn) > 0
    n_sup = jnp.maximum(has_support.sum(), 1)
    return {
        "average_f1": jnp.sum(jnp.where(has_support, f1, 0.0)) / n_sup,
        "average_ap": jnp.sum(jnp.where(has_support, ap, 0.0)) / n_sup,
        "weighted_f1": jnp.sum(jnp.where(has_support, f1 * weights, 0.0)),
        "weighted_ap": jnp.sum(jnp.where(has_support, ap * weights, 0.0)),
    }


# --------------------------------------------------------------------------
# dispatch by target type
# --------------------------------------------------------------------------
def metric_init(type_target: str, num_classes: int):
    if type_target == "multilabel_classif":
        return multilabel_init(num_classes)
    return monolabel_init(num_classes)


def metric_update(type_target: str, state, aux: dict):
    if type_target == "multilabel_classif":
        return multilabel_update(state, aux["logits"], aux["labels"], aux["valid"])
    return monolabel_update(
        state, aux.get("logits"), aux["labels"], aux["valid"],
        preds=aux.get("preds"),
    )


def metric_compute(type_target: str, state) -> dict[str, jnp.ndarray]:
    if type_target == "multilabel_classif":
        return multilabel_compute(state)
    return monolabel_compute(state)
