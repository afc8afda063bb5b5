"""Generic ViT backbone for baseline FM adapters.

One configurable pre-LN ViT covering the architectural variants the five
adapters need (reference vendored copies: baselines/dinov2.py via HF modules,
satmae.py:93+, dofa.py timm blocks):
  - CLS token (optional) + learned positional embeddings with bilinear
    interpolation to the input grid (CLS-aware)
  - qkv with bias, LayerScale (DINOv2), standard MLP with exact GELU
  - arbitrary prefix tokens (e.g. SatMAE timestamp embeddings are added by
    the caller before the encoder)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


from maestro_tpu.ops.resize import bicubic_matrix_np as _bicubic_matrix_np


def interpolate_pos_embed(
    pos: jnp.ndarray,  # [1, L(+1), C] learned positions (optionally with CLS)
    grid: int,
    has_cls: bool,
) -> jnp.ndarray:
    """CLS-aware bicubic resize of learned position embeddings.

    Reference: baselines/utils.py:148-196 (interpolate_pos_encoding) —
    fp32 ``F.interpolate(mode="bicubic", align_corners=False)``; separable,
    so applied as A @ P @ A.T with the exact torch kernel matrix.
    """
    cls_pos, patch_pos = None, pos
    if has_cls:
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    src = round(patch_pos.shape[1] ** 0.5)
    if src != grid:
        c = patch_pos.shape[-1]
        p = patch_pos.reshape(src, src, c).astype(jnp.float32)
        a = jnp.asarray(_bicubic_matrix_np(src, grid))
        p = jnp.einsum("rg,ghc,sh->rsc", a, p, a)
        patch_pos = p.reshape(1, grid * grid, c).astype(pos.dtype)
    if has_cls:
        return jnp.concatenate([cls_pos, patch_pos], axis=1)
    return patch_pos


class EncoderBlock(nn.Module):
    """Pre-LN block with optional LayerScale (DINOv2-style)."""

    dim: int
    heads: int
    mlp_ratio: float = 4.0
    layerscale: bool = False
    qkv_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dh = self.dim // self.heads
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(
            self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv",
        )(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, l, _ = x.shape
        shape = (b, l, self.heads, dh)

        from maestro_tpu.ops.attention import mha_blhd

        # head-packed dispatch: Pallas kernel for 128-1535-token sequences
        # (e.g. FLAIR aerial grids under FM patch sizes), XLA einsum below
        out = mha_blhd(
            q.reshape(shape), k.reshape(shape), v.reshape(shape),
            sm_scale=dh**-0.5,
        ).reshape(b, l, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        if self.layerscale:
            g1 = self.param(
                "ls1", nn.initializers.constant(1e-5), (self.dim,), jnp.float32,
            )
            out = out * g1.astype(self.dtype)
        x = x + out

        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        if self.layerscale:
            g2 = self.param(
                "ls2", nn.initializers.constant(1e-5), (self.dim,), jnp.float32,
            )
            y = y * g2.astype(self.dtype)
        return x + y


class ViTBackbone(nn.Module):
    """Patch conv + CLS + learned positions + encoder stack (+ final LN)."""

    dim: int
    depth: int
    heads: int
    in_chans: int
    patch_size: int
    pos_grid: int  # grid the learned positions were trained at
    mlp_ratio: float = 4.0
    use_cls: bool = True
    layerscale: bool = False
    keep_norm: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, C, H, W] pixels -> [B, L, dim] patch features (CLS removed)."""
        b, c, hh, ww = x.shape
        p = self.patch_size
        grid = hh // p
        # strided conv as reshape+matmul, feature order (C, ph, pw)
        xp = x.reshape(b, c, grid, p, grid, p)
        xp = xp.transpose(0, 2, 4, 1, 3, 5).reshape(b, grid * grid, c * p * p)
        tokens = nn.Dense(self.dim, dtype=self.dtype, name="patch_proj")(
            xp.astype(self.dtype),
        )

        num_pos = self.pos_grid**2 + (1 if self.use_cls else 0)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, num_pos, self.dim),
            jnp.float32,
        )
        pos = interpolate_pos_embed(pos, grid, self.use_cls)

        if self.use_cls:
            cls = self.param(
                "cls_token", nn.initializers.zeros, (1, 1, self.dim), jnp.float32,
            )
            cls = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.dim))
            tokens = jnp.concatenate([cls, tokens], axis=1)

        tokens = tokens + pos.astype(self.dtype)

        for i in range(self.depth):
            tokens = EncoderBlock(
                self.dim, self.heads, self.mlp_ratio,
                layerscale=self.layerscale, dtype=self.dtype, name=f"block{i}",
            )(tokens)
        if self.keep_norm:
            tokens = nn.LayerNorm(dtype=self.dtype, name="norm")(tokens)
        if self.use_cls:
            tokens = tokens[:, 1:]
        return tokens
