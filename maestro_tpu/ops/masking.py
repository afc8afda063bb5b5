"""Structured + random token masking.

Reference semantics: /root/reference/maestro/ssl/mae.py:178-287.

Three pieces:
  1. ``structural_mask`` — per-sample Bernoulli masking at modality /
     band-group / date / location granularity, OR-combined, with per-
     (sample, stream) redraws while any stream would be masked entirely.
     The reference does this with a host-synced Python loop on CPU tensors
     (mae.py:189: ``while any(...)``); here it is a bounded on-device
     ``lax.while_loop`` over static shapes — no host round-trips.
  2. ``shuffle_mask`` — MAE random masking biased by the structural mask
     (structurally-masked tokens sort first and are preferentially masked);
     the masked count per stream is a static Python int.
  3. ``unmask`` — scatter-free re-expansion of encoded tokens to the full
     sequence via a cumulative-rank gather, filling masked slots with the
     (position-dependent) mask token.
"""

from __future__ import annotations

import jax
from jax import numpy as jnp

from maestro_tpu.specs.fusion import FusionPlan

_MAX_REDRAWS = 1000


def structural_mask(
    plan: FusionPlan,
    key: jax.Array,
    batch_size: int,
) -> dict[str, jnp.ndarray]:
    """Draw the structural mask: dict[stream] -> [B, L_stream] bool.

    For batch-flattened fusion modes structural masking is disabled and the
    mask is all-False (batch axis is ``B * date_axis`` per stream).
    """
    if plan.batch_flattened or not any(
        plan.struct_masks[m].enabled for m in plan.mods
    ):
        return {
            name: jnp.zeros(
                (batch_size * s.batch_factor, s.seq_len), dtype=bool,
            )
            for name, s in plan.streams.items()
        }

    stream_names = tuple(plan.streams)

    def draw(key: jax.Array) -> dict[str, jnp.ndarray]:
        masks_mod = {}
        for name in plan.mods:
            spec = plan.mod_specs[name]
            sm = plan.struct_masks[name]
            b, g, d, l = batch_size, spec.len_bands, spec.num_dates, spec.tokens_per_date
            m = jnp.zeros((b, g, d, l), dtype=bool)
            probs = (
                (sm.p_mod, (b, 1, 1, 1)),
                (sm.p_bands, (b, g, 1, 1)),
                (sm.p_dates, (b, 1, d, 1)),
                (sm.p_loc, (b, 1, 1, l)),
            )
            for p, shape in probs:
                if p:
                    key, sub = jax.random.split(key)
                    m = m | (jax.random.uniform(sub, shape) < p)
            masks_mod[name] = m.reshape(b, g * d, l)
        return plan.group(masks_mod)

    def fully_masked(masks: tuple[jnp.ndarray, ...]) -> jnp.ndarray:
        return jnp.stack([m.all(axis=1).any() for m in masks]).any()

    def cond(carry):
        key, it, masks = carry
        return jnp.logical_and(fully_masked(masks), it < _MAX_REDRAWS)

    def body(carry):
        key, it, masks = carry
        key, sub = jax.random.split(key)
        fresh = draw(sub)
        new_masks = tuple(
            jnp.where(
                masks[i].all(axis=1, keepdims=True),
                fresh[stream_names[i]],
                masks[i],
            )
            for i in range(len(stream_names))
        )
        return key, it + 1, new_masks

    init = tuple(
        jnp.ones((batch_size, plan.streams[n].seq_len), dtype=bool)
        for n in stream_names
    )
    _, _, masks = jax.lax.while_loop(cond, body, (key, jnp.int32(0), init))
    return dict(zip(stream_names, masks))


def shuffle_mask(
    key: jax.Array,
    x: jnp.ndarray,  # [B, L, C]
    struct: jnp.ndarray,  # [B, L] bool structural mask (bias)
    num_masked: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Biased MAE shuffle masking for one stream.

    Returns (x_kept [B, L-k, C], mask_rec [B, L] bool, ids_keep [B, L-k]).
    Structurally-masked tokens get their noise scaled to ~0 so they sort
    first and are masked preferentially (reference mae.py:239-253).
    """
    b, l, _ = x.shape
    noise = jax.random.uniform(key, (b, l))
    noise = noise * (1.0 - struct.astype(noise.dtype))
    ids_shuffle = jnp.argsort(noise, axis=1)  # masked candidates first
    # rank via scatter (cheaper than a second full argsort on TPU)
    iota = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32), (b, l))
    rank = jnp.zeros((b, l), jnp.int32).at[
        jnp.arange(b)[:, None], ids_shuffle
    ].set(iota, unique_indices=True, indices_are_sorted=False)
    mask_rec = rank < num_masked

    ids_keep = jnp.sort(ids_shuffle[:, num_masked:], axis=1)
    x_kept = jnp.take_along_axis(x, ids_keep[..., None], axis=1)
    return x_kept, mask_rec, ids_keep


def unmask(
    x_enc: jnp.ndarray,  # [B, L_enc, C] encoded (kept) tokens, original order
    mask_token_full: jnp.ndarray,  # [B, L, C] per-position mask token
    mask_rec: jnp.ndarray,  # [B, L] bool
) -> jnp.ndarray:
    """Re-expand to the full sequence, filling masked slots with mask tokens.

    Pure-gather formulation: position i (unmasked) fetches encoded row
    ``cumsum(~mask)[i] - 1``; masked positions read a dummy row and are
    overwritten by the mask token via ``where``.  Equivalent to the
    reference's sorted scatter (mae.py:266-287) because both the gather in
    ``shuffle_mask`` and this expansion preserve ascending position order.
    """
    keep_rank = jnp.cumsum(~mask_rec, axis=1) - 1
    idx = jnp.where(mask_rec, x_enc.shape[1], keep_rank)
    x_pad = jnp.concatenate([x_enc, jnp.zeros_like(x_enc[:, :1])], axis=1)
    x_full = jnp.take_along_axis(x_pad, idx[..., None], axis=1)
    return jnp.where(
        mask_rec[..., None], mask_token_full.astype(x_full.dtype), x_full,
    )
