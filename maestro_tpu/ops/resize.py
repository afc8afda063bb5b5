"""Image resize helpers matching torch ``F.interpolate`` semantics exactly.

The reference resizes with ``F.interpolate`` (mim.py:428, baselines/base.py:
208); three of its modes differ from ``jax.image.resize`` in ways that break
numeric parity (each measured, see tests):

* ``nearest``  — torch uses the legacy asymmetric mapping
  ``src = floor(dst * in/out)``; jax rounds half-pixel centers.
* ``bilinear`` — identical kernels, but jax silently antialiases on
  DOWNsample (7e-2 logit divergence on PASTIS before antialias=False).
* ``bicubic``  — torch's Keys kernel uses A=-0.75, jax's A=-0.5 (~10%).

So: nearest is an exact integer gather, linear is jax with antialias off,
and cubic applies the exact torch kernel as a separable matrix.
"""

from __future__ import annotations

import numpy as np
from jax import image as jax_image
from jax import numpy as jnp


def bicubic_matrix_np(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] 1-D torch-bicubic weights (A=-0.75, half-pixel centers,
    border-replicated, no antialias) — ``F.interpolate(mode="bicubic",
    align_corners=False)`` exactly."""
    A = -0.75

    def w(x: float) -> float:
        x = abs(x)
        if x <= 1:
            return (A + 2) * x**3 - (A + 3) * x**2 + 1
        if x < 2:
            return A * x**3 - 5 * A * x**2 + 8 * A * x - 4 * A
        return 0.0

    scale = in_size / out_size
    mat = np.zeros((out_size, in_size), np.float32)
    for o in range(out_size):
        src = (o + 0.5) * scale - 0.5
        base = int(np.floor(src))
        for tap in range(-1, 3):
            idx = min(max(base + tap, 0), in_size - 1)
            mat[o, idx] += w(src - (base + tap))
    return mat


def _nearest_idx(in_size: int, out_size: int) -> np.ndarray:
    # torch legacy nearest: src = floor(dst * in/out)
    return (np.arange(out_size) * in_size) // out_size


def _resize_hw(x: jnp.ndarray, size: int, mode: str) -> jnp.ndarray:
    """Resize trailing (H, W) dims with torch semantics for one mode."""
    if mode == "nearest":
        idx_r = _nearest_idx(x.shape[-2], size)
        idx_c = _nearest_idx(x.shape[-1], size)
        return x[..., idx_r, :][..., idx_c]
    if mode in ("bilinear", "linear"):
        out_shape = x.shape[:-2] + (size, size)
        return jax_image.resize(x, out_shape, "linear", antialias=False)
    if mode in ("bicubic", "cubic"):
        a_r = jnp.asarray(bicubic_matrix_np(x.shape[-2], size))
        a_c = jnp.asarray(bicubic_matrix_np(x.shape[-1], size))
        # separable: contract H -> [..., W, R], then W -> [..., R, S]
        y = jnp.tensordot(x.astype(jnp.float32), a_r.T, axes=((-2,), (0,)))
        y = jnp.tensordot(y, a_c.T, axes=((-2,), (0,)))
        return y.astype(x.dtype)
    msg = f"unknown interpolate mode {mode!r}"
    raise ValueError(msg)


def resize_spatial(x: jnp.ndarray, size: int, mode: str) -> jnp.ndarray:
    """Resize the trailing two (H, W) dims of [..., H, W] to (size, size)."""
    if x.shape[-1] == size and x.shape[-2] == size:
        return x
    return _resize_hw(x, size, mode)


def resize_token_grid(x: jnp.ndarray, out_grid: int, mode: str = "bilinear") -> jnp.ndarray:
    """Resize token features [B, D, L, C] (L = g*g) to a new grid -> [B, D, L', C]."""
    b, d, l, c = x.shape
    g = round(l**0.5)
    if g == out_grid:
        return x
    xg = x.reshape(b, d, g, g, c).transpose(0, 1, 4, 2, 3)  # [..., H, W]
    xg = _resize_hw(xg, out_grid, mode)
    return xg.transpose(0, 1, 3, 4, 2).reshape(b, d, out_grid * out_grid, c)
