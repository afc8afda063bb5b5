"""Fused patch-group-norm + masked reconstruction loss (Pallas TPU kernel).

The BASELINE.json north star names this fusion: per-patch normalization of
reconstruction targets within band groups + elementwise loss + token-masked
reduction, in a single pass over HBM instead of the XLA path's materialized
normalize -> unpatchify -> subtract -> mask -> reduce chain.

Layout: patches are rows [N, F] with N = B*D*L tokens and F = C*p*p features
in (C, ph, pw) order, so each norm group is a contiguous column slice.  The
kernel computes, per row tile:
    t_norm = (t - mean_g) * rsqrt(var_g + 1e-6)    per norm group g
    err    = |t_norm - r|  (or squared)
    out   += sum(err * row_mask),  count += row_mask * F
A custom VJP recomputes the normalization in the backward kernel and emits
d_rec = -g * sign(t_norm - r) * mask (or -2g*(t_norm - r)*mask); targets and
masks get no gradient.

Falls back to pure-XLA for small feature widths (< 128 lanes), multi-band-
group masks, or non-TPU backends.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_EPS = 1.0e-6
_TILE_ROWS = 256


def _group_stats(t, start, size):
    """Per-row mean + UNBIASED variance over one norm-group column slice
    (torch ``.var()`` correction=1 default, reference model.py:228)."""
    grp = t[:, start : start + size]
    mean = jnp.mean(grp, axis=1, keepdims=True)
    var = jnp.sum((grp - mean) ** 2, axis=1, keepdims=True) / max(size - 1, 1)
    return grp, mean, var


def _norm_err(t, r, norm_slices, square: bool):
    errs = []
    for start, size in norm_slices:
        grp, mean, var = _group_stats(t, start, size)
        tn = (grp - mean) * jax.lax.rsqrt(var + _EPS)
        diff = tn - r[:, start : start + size]
        errs.append(diff * diff if square else jnp.abs(diff))
    return jnp.concatenate(errs, axis=1) if len(errs) > 1 else errs[0]


def _fwd_kernel(t_ref, r_ref, m_ref, out_ref, *, norm_slices, square):
    """Accumulates (sum_err, count) into one (8, 128) block across the grid."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    t = t_ref[:].astype(jnp.float32)
    r = r_ref[:].astype(jnp.float32)
    m = m_ref[:].astype(jnp.float32)  # [TILE, 128] (mask broadcast on lanes)
    mcol = m[:, :1]
    err = _norm_err(t, r, norm_slices, square)
    s = jnp.sum(err * mcol)
    c = jnp.sum(mcol) * t.shape[1]
    # place scalars at (0,0) and (1,0) without scatter (unsupported on TPU)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    acc = jnp.where((row == 0) & (col == 0), s, 0.0)
    acc = acc + jnp.where((row == 1) & (col == 0), c, 0.0)
    out_ref[:] += acc


def _bwd_kernel(t_ref, r_ref, m_ref, g_ref, dr_ref, *, norm_slices, square):
    t = t_ref[:].astype(jnp.float32)
    r = r_ref[:].astype(jnp.float32)
    m = m_ref[:, :1].astype(jnp.float32)
    g = g_ref[0, 0]
    parts = []
    for start, size in norm_slices:
        grp, mean, var = _group_stats(t, start, size)
        tn = (grp - mean) * jax.lax.rsqrt(var + _EPS)
        diff = tn - r[:, start : start + size]
        d = -2.0 * diff if square else -jnp.sign(diff)
        parts.append(d)
    d = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    dr_ref[:] = (g * d * m).astype(dr_ref.dtype)


def _pallas_fwd(t, r, m, norm_slices, square):
    n, f = t.shape
    tiles = n // _TILE_ROWS
    m128 = jnp.broadcast_to(m, (n, 128))
    out = pl.pallas_call(
        partial(_fwd_kernel, norm_slices=norm_slices, square=square),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((_TILE_ROWS, f), lambda i: (i, 0)),
            pl.BlockSpec((_TILE_ROWS, f), lambda i: (i, 0)),
            pl.BlockSpec((_TILE_ROWS, 128), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(t, r, m128)
    return out[0, 0], out[1, 0]


def _pallas_bwd(t, r, m, g, norm_slices, square):
    n, f = t.shape
    tiles = n // _TILE_ROWS
    m128 = jnp.broadcast_to(m, (n, 128))
    g2 = jnp.broadcast_to(g.reshape(1, 1).astype(jnp.float32), (8, 128))
    return pl.pallas_call(
        partial(_bwd_kernel, norm_slices=norm_slices, square=square),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((_TILE_ROWS, f), lambda i: (i, 0)),
            pl.BlockSpec((_TILE_ROWS, f), lambda i: (i, 0)),
            pl.BlockSpec((_TILE_ROWS, 128), lambda i: (i, 0)),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_TILE_ROWS, f), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, f), r.dtype),
    )(t, r, m128, g2)


# --------------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def masked_patchnorm_sums(t, r, m, norm_slices, square):
    """(sum_err, count) with patch-group-norm targets; Pallas on TPU."""
    return _impl(t, r, m, norm_slices, square)


def _impl(t, r, m, norm_slices, square):
    n, f = t.shape
    if _use_pallas(n, f):
        return _pallas_fwd(t, r, m, norm_slices, square)
    err = _norm_err(t.astype(jnp.float32), r.astype(jnp.float32),
                    norm_slices, square)
    mf = m.astype(jnp.float32)
    return jnp.sum(err * mf), jnp.sum(mf) * f


def _fwd(t, r, m, norm_slices, square):
    out = _impl(t, r, m, norm_slices, square)
    return out, (t, r, m)


def _bwd(norm_slices, square, res, cot):
    t, r, m = res
    g_sum, _ = cot  # count has no gradient path we care about
    n, f = t.shape
    if _use_pallas(n, f):
        dr = _pallas_bwd(t, r, m, g_sum, norm_slices, square)
    else:
        tn_err = []
        tf, rf = t.astype(jnp.float32), r.astype(jnp.float32)
        for start, size in norm_slices:
            grp, mean, var = _group_stats(tf, start, size)
            tn = (grp - mean) * jax.lax.rsqrt(var + _EPS)
            diff = tn - rf[:, start : start + size]
            tn_err.append(-2.0 * diff if square else -jnp.sign(diff))
        d = jnp.concatenate(tn_err, axis=1) if len(tn_err) > 1 else tn_err[0]
        dr = (g_sum * d * m.astype(jnp.float32)).astype(r.dtype)
    return jnp.zeros_like(t), dr, jnp.zeros_like(m)


masked_patchnorm_sums.defvjp(_fwd, _bwd)


def _use_pallas(n: int, f: int) -> bool:
    return (
        jax.default_backend() == "tpu"
        and f >= 128
        and n % _TILE_ROWS == 0
    )


# --------------------------------------------------------------------------
def fused_reconstruction_loss(plan, targets, rec, masks,
                              loss_type: str = "l1_norm",
                              stage_dtype=None) -> jnp.ndarray:
    """Drop-in for train.losses.reconstruction_loss using the fused kernel.

    Accepts per modality either a token-space reconstruction
    ([B, D, L, C*p*p], token mask [B, D, L] — the model's
    ``return_pixels=False`` hot path, no pixel grid ever materialized) or the
    pixel-space form ([B, D, C, H, W] + pixel mask), which is re-patchified
    here.  Requires a ``_norm`` loss variant and single-band-group modalities
    (all four reference datasets); falls back to the XLA pixel loss per
    modality otherwise.  ``stage_dtype`` (default bf16 on TPU) is the dtype of
    the patchified staging buffers — normalization statistics are always
    computed in fp32 inside the kernel.
    """
    from maestro_tpu.ops.patch import patchify_pixels
    from maestro_tpu.train.losses import (
        _EPS_COUNT,
        _loss_elem,
        patch_group_normalize,
        reconstruction_loss,
    )

    if not loss_type.endswith("_norm"):
        return reconstruction_loss(plan, targets, rec, masks, loss_type)
    square = loss_type.startswith("l2")
    if stage_dtype is None:
        stage_dtype = (
            jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        )

    total, weights = 0.0, 0.0
    for name, spec in plan.mod_specs.items():
        weight = spec.num_dates * spec.tokens_per_date
        weights = weights + weight
        p = spec.patch_size

        if spec.len_bands != 1:  # pixel-space XLA fallback for this modality
            loss_fn, _ = _loss_elem(loss_type)
            target = patch_group_normalize(
                targets[name].astype(jnp.float32), p, spec.norm_groups,
            )
            err = loss_fn(target - rec[name].astype(jnp.float32))
            m = masks[name].astype(jnp.float32)
            total = total + weight * jnp.sum(err * m) / (jnp.sum(m) + _EPS_COUNT)
            continue

        t = patchify_pixels(targets[name].astype(stage_dtype), p)
        b, d, l, f = t.shape
        t = t.reshape(b * d * l, f)
        if rec[name].ndim == 4:  # token-space reconstruction
            r = rec[name].astype(stage_dtype).reshape(b * d * l, f)
            m = masks[name].reshape(b * d * l, 1)
        else:
            r = patchify_pixels(rec[name].astype(stage_dtype), p)
            r = r.reshape(b * d * l, f)
            # one band group -> pixel mask constant over the patch
            m = masks[name][:, :, 0, ::p, ::p].reshape(b * d * l, 1)

        # column slices per norm group in (C, ph, pw) feature order
        slices, off = [], 0
        for chans in spec.norm_groups:
            slices.append((off * p * p, chans * p * p))
            off += chans
        s, c = masked_patchnorm_sums(
            t, r, m.astype(jnp.float32), tuple(slices), square,
        )
        total = total + weight * s / jnp.maximum(c, 1e-8)
    return total / weights
