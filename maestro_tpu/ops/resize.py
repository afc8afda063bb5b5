"""Image resize helpers (jax.image wrappers with torch-style mode names)."""

from __future__ import annotations

from jax import image as jax_image
from jax import numpy as jnp

_MODE_MAP = {
    "nearest": "nearest",
    "bilinear": "linear",
    "bicubic": "cubic",
    "linear": "linear",
    "cubic": "cubic",
}


# antialias=False throughout: torch's F.interpolate (the reference's resize,
# mim.py:362/:428) never antialiases, and jax.image.resize defaults to a
# triangle prefilter when DOWNsampling — a measured 7e-2 logits divergence on
# PASTIS, where the spot token grid downsamples to the s2 ref grid
# (tests/test_full_forward_parity.py::test_full_segmentation_forward_parity).


def resize_spatial(x: jnp.ndarray, size: int, mode: str) -> jnp.ndarray:
    """Resize the trailing two (H, W) dims of [..., H, W] to (size, size)."""
    if x.shape[-1] == size and x.shape[-2] == size:
        return x
    method = _MODE_MAP[mode]
    out_shape = x.shape[:-2] + (size, size)
    return jax_image.resize(x, out_shape, method, antialias=False)


def resize_token_grid(x: jnp.ndarray, out_grid: int, mode: str = "bilinear") -> jnp.ndarray:
    """Resize token features [B, D, L, C] (L = g*g) to a new grid -> [B, D, L', C]."""
    b, d, l, c = x.shape
    g = round(l**0.5)
    if g == out_grid:
        return x
    xg = x.reshape(b, d, g, g, c)
    xg = jax_image.resize(xg, (b, d, out_grid, out_grid, c), _MODE_MAP[mode],
                          antialias=False)
    return xg.reshape(b, d, out_grid * out_grid, c)
