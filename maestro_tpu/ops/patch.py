"""Patchify / pixelify as reshape + matmul (MXU-friendly).

The reference implements patch embedding as strided Conv2d + GroupNorm(1)
(/root/reference/maestro/layers/embed.py:37-66) and pixel reconstruction as a
1x1 conv + pixel shuffle (:123-160).  On TPU a stride-p conv with kernel p is
exactly a block reshape followed by a dense matmul, which XLA maps straight
onto the MXU; we implement it that way, with feature order (C, ph, pw) chosen
to match the torch conv-kernel layout for checkpoint porting.
"""

from __future__ import annotations

from jax import numpy as jnp


def patchify_pixels(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, D, C, H, W] -> [B, D, L, C*p*p] with feature order (C, ph, pw)."""
    b, d, c, hh, ww = x.shape
    h, w = hh // patch, ww // patch
    x = x.reshape(b, d, c, h, patch, w, patch)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6)  # [B, D, h, w, C, p, p]
    return x.reshape(b, d, h * w, c * patch * patch)


def unpatchify_pixels(x: jnp.ndarray, patch: int, channels: int) -> jnp.ndarray:
    """[B, D, L, C*p*p] (feature order (C, ph, pw)) -> [B, D, C, H, W].

    Exact inverse of :func:`patchify_pixels` — one feature convention for all
    token-space tensors, so the token-space reconstruction loss can compare
    decoder outputs against patchified targets without any permutation.  The
    reference's pixel-shuffle order "(p1 p2 c) h w -> c (h p1) (w p2)"
    (embed.py:154-160) is handled at checkpoint-port time by permuting the
    1x1-conv output features (port/torch_port.py).
    """
    b, d, l, _ = x.shape
    h = round(l**0.5)
    x = x.reshape(b, d, h, h, channels, patch, patch)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6)  # [B, D, C, h, p, w, p]
    return x.reshape(b, d, channels, h * patch, h * patch)


def group_norm_tokens(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                      eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm(1) over token layout: normalize over (L, C) per (B, D) slice.

    Equivalent to torch GroupNorm(1, C) on the [B*D, C, h, w] activation map
    (normalizes jointly over channels and spatial dims), with per-channel
    affine.
    """
    mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
    var = jnp.var(x, axis=(-2, -1), keepdims=True)
    x = (x - mean) * jax_rsqrt(var + eps)
    return x * scale + bias


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    from jax import lax

    return lax.rsqrt(x)


def expand_token_mask_to_pixels(
    mask: jnp.ndarray,  # [B, D, L] or [B, D, L, 1] bool token mask (one group)
    patch: int,
    channels: int,
) -> jnp.ndarray:
    """Expand a per-token mask to the pixel grid: -> [B, D, C, H, W]."""
    if mask.ndim == 4:
        mask = mask[..., 0]
    b, d, l = mask.shape
    h = round(l**0.5)
    m = mask.reshape(b, d, 1, h, 1, h, 1)
    m = jnp.broadcast_to(m, (b, d, channels, h, patch, h, patch))
    return m.reshape(b, d, channels, h * patch, h * patch)
