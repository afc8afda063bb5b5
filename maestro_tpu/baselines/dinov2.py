"""DINOv2 baseline adapter.

Reference: /root/reference/maestro/baselines/dinov2.py:27-424.  Per-modality
patch embeddings (channel-padded with N(0, 0.01^2) beyond RGB), a weight-shared
("shared") or per-modality ("monotemp") DINOv2 encoder (LayerScale ViT), final
LayerNorm, optional date encodings, and the common probe/finetune heads.

Weight sources: "imagenat" (facebook/dinov2-<size>, patch 14, pos grid 37) or
"sat" (satellite-adapted large, patch 16, pos grid 14); porting from torch
state dicts is in baselines/porting.py.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from maestro_tpu.baselines.backbone import ViTBackbone
from maestro_tpu.baselines.base import BaselineShell, build_baseline_plan
from maestro_tpu.conf.core import BaselineConfig
from maestro_tpu.conf.datasets import DatasetsConfig

Dtype = Any

DINOV2_ARCHS = {
    # "micro" is a test-only size for fast CPU CI; not a DINOv2 release
    "micro": (64, 2, 2),
    "small": (384, 12, 6),
    "base": (768, 12, 12),
    "large": (1024, 24, 16),
    "huge": (1280, 32, 16),
}


class Dinov2Baseline(BaselineShell):
    """DINOv2 adapter: per-mod patch embed, shared/per-mod encoder."""

    backbone_size: str = "small"
    weight_source: str = "imagenat"  # "imagenat" | "sat"
    keep_norm: bool = True

    def setup(self) -> None:
        dim, depth, heads = DINOV2_ARCHS[self.backbone_size]
        # imagenat: patch 14 trained at 518px -> 37x37 grid; sat: 16 @ 224 -> 14
        pos_grid = 37 if self.weight_source == "imagenat" else 14
        patch = 14 if self.weight_source == "imagenat" else 16

        # one full backbone per encoder name; per-modality patch embeds are
        # realized by instantiating a backbone per mod but sharing encoder
        # weights is structural: "shared" mode = one encoder name.
        self.patch_projs = {
            name: nn.Dense(dim, dtype=self.dtype)
            for name in self.plan.mods
        }
        self.cls_tokens = {
            name: self.param(
                f"cls_{name}", nn.initializers.zeros, (1, 1, dim), jnp.float32,
            )
            for name in self.plan.mods
        }
        self.pos_embeds = {
            name: self.param(
                f"pos_{name}", nn.initializers.normal(0.02),
                (1, pos_grid**2 + 1, dim), jnp.float32,
            )
            for name in self.plan.mods
        }
        self.encoders = {
            name: ViTBackboneEncoderOnly(
                dim=dim, depth=depth, heads=heads, layerscale=True,
                dtype=self.dtype,
            )
            for name in self.plan.encoder_names
        }
        if self.keep_norm:
            self.final_norm = nn.LayerNorm(dtype=self.dtype)
        self.heads = self.make_heads()
        self._patch = patch
        self._pos_grid = pos_grid
        self._dim = dim

    def encode_for_heads(self, batch: dict) -> dict:
        from maestro_tpu.baselines.backbone import interpolate_pos_embed

        batch = self.resize_and_rescale(batch)
        pixels = self.plan.group(
            {name: batch[name] for name in self.plan.mods},
        )  # [B*DG, C, H, W] per stream (shared/monotemp are batch-flattened)

        feats = {}
        for name, spec in self.plan.mod_specs.items():
            x = pixels[name].astype(self.dtype)
            b, c, hh, ww = x.shape
            p, grid = self._patch, spec.grid
            xp = x[:, :, : grid * p, : grid * p]
            xp = xp.reshape(b, c, grid, p, grid, p)
            xp = xp.transpose(0, 2, 4, 1, 3, 5).reshape(b, grid * grid, c * p * p)
            tokens = self.patch_projs[name](xp)

            pos = interpolate_pos_embed(self.pos_embeds[name], grid, has_cls=True)
            cls = jnp.broadcast_to(
                self.cls_tokens[name].astype(self.dtype), (b, 1, self._dim),
            )
            tokens = jnp.concatenate([cls, tokens], axis=1) + pos.astype(self.dtype)

            encoder = self.encoders[self.plan.streams[name].encoder]
            tokens = encoder(tokens)
            if self.keep_norm:
                tokens = self.final_norm(tokens)
            feats[name] = tokens[:, 1:]  # drop CLS

        if self.add_date_enc:
            feats = self.add_date_encodings(feats, batch)
        return feats


class ViTBackboneEncoderOnly(nn.Module):
    """Encoder stack only (patch embed + pos handled by the adapter)."""

    dim: int
    depth: int
    heads: int
    mlp_ratio: float = 4.0
    layerscale: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        from maestro_tpu.baselines.backbone import EncoderBlock

        for i in range(self.depth):
            tokens = EncoderBlock(
                self.dim, self.heads, self.mlp_ratio,
                layerscale=self.layerscale, dtype=self.dtype, name=f"block{i}",
            )(tokens)
        return tokens


def build_dinov2(
    datasets: DatasetsConfig,
    cfg: BaselineConfig,
    dtype: Dtype = jnp.bfloat16,
) -> Dinov2Baseline:
    if cfg.fusion_mode not in ("shared", "monotemp"):
        msg = f"DINOv2 supports shared/monotemp fusion, got {cfg.fusion_mode!r}."
        raise ValueError(msg)
    model_key = f"dinov2_{cfg.weight_source}"
    plan, head_specs = build_baseline_plan(datasets, cfg.fusion_mode, model_key)
    dim = DINOV2_ARCHS[cfg.model_size][0]
    return Dinov2Baseline(
        plan=plan,
        head_specs=head_specs,
        embed_dim=dim,
        type_head=cfg.type_head,
        interpolate=cfg.interpolate,
        seg_chunk_rows=cfg.seg_chunk_rows,
        seg_unroll=cfg.seg_unroll,
        ref_input=datasets.dataset.ref_input,
        add_date_enc=cfg.add_date_enc,
        backbone_size=cfg.model_size,
        weight_source=cfg.weight_source,
        keep_norm=cfg.keep_norm,
        dtype=dtype,
    )
