"""Training losses.

Reconstruction loss with patch-group-wise target normalization
(reference /root/reference/maestro/train/model.py:195-247) and prediction
losses with missing-value filtering (/root/reference/maestro/train/base.py:
98-151).  Everything is a pure jnp function over static shapes — the
masked-mean replaces the reference's ``masked_select`` (dynamic shapes) with a
sum/count formulation XLA fuses into the surrounding graph.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from maestro_tpu.models.mae import HeadSpec
from maestro_tpu.specs.fusion import FusionPlan

_EPS_NORM = 1.0e-6
_EPS_COUNT = 1.0e-8


def _loss_elem(loss_type: str) -> tuple[Callable, bool]:
    match loss_type:
        case "l1":
            return jnp.abs, False
        case "l2":
            return jnp.square, False
        case "l1_norm":
            return jnp.abs, True
        case "l2_norm":
            return jnp.square, True
    msg = f"Invalid loss {loss_type!r}."
    raise ValueError(msg)


def patch_group_normalize(
    target: jnp.ndarray,  # [B, D, C, H, W]
    patch: int,
    norm_groups: tuple[int, ...],
) -> jnp.ndarray:
    """Normalize each patch per band group: zero mean, unit variance.

    The patch-group-wise normalization of reconstruction targets is one of the
    reference's two headline contributions (README.md:49-51); statistics are
    computed over (patch pixels x channels of the group) for every
    (sample, date, patch location, band group) independently.  Variance is
    UNBIASED (ddof=1): the reference's ``target_group.var(dim=(-2,-1))``
    (model.py:228) uses torch's correction=1 default — for the smallest
    groups (S1/S2 p=2, n=4..16 elements) the biased estimator would scale
    normalized targets by a real 3-7%.
    """
    b, d, c, hh, ww = target.shape
    g = hh // patch
    # -> [B, D, G_spatial^2, p*p, C]
    x = target.reshape(b, d, c, g, patch, g, patch)
    x = x.transpose(0, 1, 3, 5, 4, 6, 2).reshape(b, d, g * g, patch * patch, c)

    parts = []
    off = 0
    for chans in norm_groups:
        grp = x[..., off : off + chans]
        off += chans
        mean = grp.mean(axis=(-2, -1), keepdims=True)
        var = grp.var(axis=(-2, -1), keepdims=True, ddof=1)
        parts.append((grp - mean) / jnp.sqrt(var + _EPS_NORM))
    x = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]

    x = x.reshape(b, d, g, g, patch, patch, c).transpose(0, 1, 6, 2, 4, 3, 5)
    return x.reshape(b, d, c, hh, ww)


def reconstruction_loss(
    plan: FusionPlan,
    targets: dict[str, jnp.ndarray],
    pixels_rec: dict[str, jnp.ndarray],
    mask_pixels: dict[str, jnp.ndarray],
    loss_type: str = "l1_norm",
) -> jnp.ndarray:
    """Masked reconstruction loss, weighted per modality by D * grid^2."""
    loss_fn, norm_pix = _loss_elem(loss_type)

    total, weights = 0.0, 0.0
    for name, spec in plan.mod_specs.items():
        target = targets[name].astype(jnp.float32)
        if norm_pix:
            target = patch_group_normalize(
                target, spec.patch_size, spec.norm_groups,
            )
        err = loss_fn(target - pixels_rec[name].astype(jnp.float32))
        m = mask_pixels[name].astype(jnp.float32)
        mod_loss = jnp.sum(err * m) / (jnp.sum(m) + _EPS_COUNT)
        weight = spec.num_dates * spec.tokens_per_date
        total = total + weight * mod_loss
        weights = weights + weight
    return total / weights


def prediction_losses(
    head_specs: tuple[HeadSpec, ...],
    batch: dict[str, jnp.ndarray],
    logits: dict[str, jnp.ndarray],
) -> tuple[jnp.ndarray, dict[str, dict]]:
    """Sum of per-target losses + per-target (logits, labels, valid) aux.

    Rows whose label equals ``missing_val`` are excluded by masking; when a
    batch has no valid rows the loss falls back to ``0 * logits.mean()`` so
    gradients stay defined (reference base.py:147-148).
    """
    total = 0.0
    aux: dict[str, dict] = {}
    for hs in head_specs:
        lg = logits[hs.name].astype(jnp.float32)
        y = batch[hs.name]

        if hs.type_target == "segment":
            # logits [B, 1, C, H, W], target [B, 1, 1, H, W].  The CE keeps
            # the class axis OUT of the minor (lane) dimension: a flattened
            # [B*H*W, C] fp32 tensor lane-pads C=15 -> 128 on TPU (~8.5x, a
            # 4 GB temp at FLAIR finetune scale); over [B, C, H, W] the
            # (H, W) tile carries the layout and C stays a batch dim.
            lgc = lg[:, 0]  # [B, C, H, W] fp32
            y2 = y[:, 0, 0].astype(jnp.int32)  # [B, H, W]
            valid = y2 != hs.missing_val
            y_safe = jnp.clip(y2, 0, hs.num_classes - 1)
            lse = jax.scipy.special.logsumexp(lgc, axis=1)  # [B, H, W]
            # select-reduce over the class axis instead of take_along_axis:
            # the per-pixel gather runs at ~1.5 GB/s on TPU (130 ms/step at
            # FLAIR finetune scale) while this re-read of lgc fuses into the
            # logsumexp pass; its VJP is a select, not a scatter.
            cls = jnp.arange(hs.num_classes, dtype=jnp.int32)[None, :, None, None]
            picked = jnp.sum(
                jnp.where(y_safe[:, None] == cls, lgc, 0.0), axis=1,
            )
            ce = (lse - picked).reshape(-1)
            valid = valid.reshape(-1)
            loss = _masked_mean(ce, valid, lg)
            # metrics only need the argmax for the confusion matrix — the
            # full per-pixel logit matrix is never materialized
            aux[hs.name] = {
                "preds": jnp.argmax(lgc, axis=1).reshape(-1),
                "labels": y2.reshape(-1),
                "valid": valid,
            }
        elif hs.type_target == "multilabel_classif":
            yf = y.astype(jnp.float32)
            valid = jnp.all(y != hs.missing_val, axis=1)
            bce = jnp.maximum(lg, 0) - lg * yf + jnp.log1p(jnp.exp(-jnp.abs(lg)))
            bce = bce.mean(axis=1)
            loss = _masked_mean(bce, valid, lg)
            aux[hs.name] = {"logits": lg, "labels": y, "valid": valid}
        else:  # classif
            y1 = y.reshape(-1).astype(jnp.int32)
            valid = y1 != hs.missing_val
            y_safe = jnp.clip(y1, 0, hs.num_classes - 1)
            ce = -jnp.take_along_axis(
                jax.nn.log_softmax(lg, axis=-1), y_safe[:, None], axis=1,
            )[:, 0]
            loss = _masked_mean(ce, valid, lg)
            aux[hs.name] = {"logits": lg, "labels": y1, "valid": valid}

        total = total + loss
    return total, aux


def _masked_mean(
    per_row: jnp.ndarray, valid: jnp.ndarray, logits: jnp.ndarray,
) -> jnp.ndarray:
    count = jnp.sum(valid)
    mean = jnp.sum(per_row * valid) / jnp.maximum(count, 1)
    return jnp.where(count > 0, mean, 0.0 * logits.mean())
