"""Downstream heads (classification / dense segmentation).

Reference: /root/reference/maestro/layers/head.py:66-130.  Probe-phase feature
detaching (head.py:17-25) is done with ``lax.stop_gradient`` at the call site.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from maestro_tpu.models.vit import AttentiveReduce
from maestro_tpu.ops.patch import unpatchify_pixels

Dtype = Any


class ClassificationHead(nn.Module):
    """[B, N, C] -> [B, num_classes] via mean or attentive pooling."""

    type_head: str  # "linear" (mean pooling) | "attentive"
    dim: int
    num_classes: int
    heads: int = 8
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.type_head == "attentive":
            pooled = AttentiveReduce(
                self.dim, heads=self.heads, dtype=self.dtype, name="reduce",
            )(x)
        else:
            pooled = jnp.mean(x, axis=1)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="linear")(
            pooled.astype(jnp.float32),
        )
        return logits


class PixelifyHead(nn.Module):
    """[B, D, L, C] -> dense logits [B, 1, num_classes, H, W].

    Attentive (or mean) reduction over the date axis per location, then a
    dense pixel-shuffle upsampling to the target grid.
    """

    type_head: str
    dim: int
    num_classes: int
    patch_size: int  # upsampling factor: target pixels per ref-grid token
    heads: int = 8
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, d, l, c = x.shape
        if self.type_head == "attentive":
            y = x.transpose(0, 2, 1, 3).reshape(b * l, d, c)
            y = AttentiveReduce(
                self.dim, heads=self.heads, dtype=self.dtype, name="reduce",
            )(y)
            y = y.reshape(b, 1, l, self.dim)
        else:
            y = jnp.mean(x, axis=1, keepdims=True)
        y = nn.Dense(
            self.num_classes * self.patch_size**2, dtype=jnp.float32, name="proj",
        )(y.astype(jnp.float32))
        return unpatchify_pixels(y, self.patch_size, self.num_classes)
