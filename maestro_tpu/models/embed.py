"""Patch embedding / pixel reconstruction modules.

Reference: /root/reference/maestro/layers/embed.py (Patchify/Pixelify).
Convs are expressed as block-reshape + dense matmuls (see ops/patch.py), one
dense per band group, with GroupNorm(1) over each (sample, date) token grid.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from maestro_tpu.ops.patch import (
    expand_token_mask_to_pixels,
    patchify_pixels,
    unpatchify_pixels,
)

Dtype = Any


class PatchEmbed(nn.Module):
    """[B, D, C, H, W] -> [B, G*D, L, E] tokens (band-group-major date axis)."""

    band_groups: tuple[int, ...]
    patch_size: int
    embed_dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        outs = []
        offset = 0
        for g, chans in enumerate(self.band_groups):
            xg = x[:, :, offset : offset + chans]
            offset += chans
            tokens = patchify_pixels(xg.astype(self.dtype), self.patch_size)
            tokens = nn.Dense(self.embed_dim, dtype=self.dtype, name=f"proj{g}")(tokens)
            # GroupNorm(1): normalize over (L, E) per (b, d), per-channel affine
            scale = self.param(
                f"norm{g}_scale", nn.initializers.ones, (self.embed_dim,), jnp.float32,
            )
            bias = self.param(
                f"norm{g}_bias", nn.initializers.zeros, (self.embed_dim,), jnp.float32,
            )
            stats = tokens.astype(jnp.float32)
            mean = jnp.mean(stats, axis=(-2, -1), keepdims=True)
            var = jnp.var(stats, axis=(-2, -1), keepdims=True)
            tokens = ((stats - mean) * lax.rsqrt(var + 1e-5)).astype(self.dtype)
            tokens = tokens * scale.astype(self.dtype) + bias.astype(self.dtype)
            outs.append(tokens)
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


class Pixelify(nn.Module):
    """[B, G*D, L, C_dec] -> pixels [B, D, C, H, W] (+ pixel mask expansion)."""

    band_groups: tuple[int, ...]
    patch_size: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: jnp.ndarray | None = None,  # [B, G*D, L] bool token mask
        tokens_only: bool = False,
    ) -> tuple[jnp.ndarray, jnp.ndarray | None]:
        num_groups = len(self.band_groups)
        b, gd, l, _ = x.shape
        d = gd // num_groups
        x = x.reshape(b, num_groups, d, l, x.shape[-1])
        if mask is not None:
            mask = mask.reshape(b, num_groups, d, l)

        if tokens_only:
            # token-space reconstruction [B, D, L, C*p*p] in (C, ph, pw)
            # feature order + per-token mask; skips the pixel shuffle so the
            # loss never materializes / re-patchifies the full pixel grid
            if num_groups != 1:
                msg = "tokens_only requires a single band group."
                raise ValueError(msg)
            y = nn.Dense(
                self.band_groups[0] * self.patch_size**2, dtype=self.dtype,
                name="proj0",
            )(x[:, 0])
            return y, (mask[:, 0] if mask is not None else None)

        pix, pix_mask = [], []
        for g, chans in enumerate(self.band_groups):
            y = nn.Dense(
                chans * self.patch_size**2, dtype=self.dtype, name=f"proj{g}",
            )(x[:, g])
            pix.append(unpatchify_pixels(y, self.patch_size, chans))
            if mask is not None:
                pix_mask.append(
                    expand_token_mask_to_pixels(mask[:, g], self.patch_size, chans),
                )

        pixels = pix[0] if num_groups == 1 else jnp.concatenate(pix, axis=2)
        if mask is None:
            return pixels, None
        m = pix_mask[0] if num_groups == 1 else jnp.concatenate(pix_mask, axis=2)
        return pixels, m
