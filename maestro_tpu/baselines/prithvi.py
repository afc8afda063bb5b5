"""Prithvi-EO baseline adapter (S2-only, 3-D patch embedding).

Reference: /root/reference/maestro/baselines/prithvi.py:16-260 (terratorch
backbone reimplemented here).  Conv3d patch embed with tubelet size 1 over the
date axis (equivalent to a per-date 2-D patch embed with shared weights), 3-D
sincos positional embeddings over (T, H, W), optional temporal encoding from
(year, day-of-year) coords (the v2 "_tl" variant), CLS token, plain ViT
blocks.  Channel surgery maps the HLS-pretrained 6-band patch kernel onto the
dataset's S2 bands (ORIG_BANDS = (0, 1, 2, 6, 8, 9), prithvi.py:13).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from maestro_tpu.baselines.backbone import EncoderBlock
from maestro_tpu.baselines.base import BaselineShell, build_baseline_plan
from maestro_tpu.baselines.satmae import sincos_1d, sincos_2d_grid
from maestro_tpu.conf.core import BaselineConfig
from maestro_tpu.conf.datasets import DatasetsConfig

Dtype = Any

PRITHVI_ARCHS = {
    # "micro" is a test-only size for fast CPU CI; not a Prithvi release
    "micro": (64, 2, 2),
    "base": (768, 12, 12),  # v1 / 100M
    "large": (1024, 24, 16),  # v2 / 300M
}
ORIG_BANDS = (0, 1, 2, 6, 8, 9)


def sincos_3d(dim: int, t: int, grid: int) -> np.ndarray:
    """[T*L, dim] 3-D sincos: 1/4 of dims on time, 3/4 on space."""
    t_dim = dim // 4
    s_dim = dim - t_dim
    spatial = sincos_2d_grid(s_dim, grid)  # [L, s_dim]
    omega = np.arange(t_dim // 2, dtype=np.float64) / (t_dim / 2.0)
    omega = 1.0 / 10000.0**omega
    out = np.einsum("m,d->md", np.arange(t, dtype=np.float64), omega)
    temporal = np.concatenate([np.sin(out), np.cos(out)], axis=1)  # [T, t_dim]
    full = np.concatenate(
        [
            np.repeat(temporal[:, None], grid * grid, axis=1),
            np.repeat(spatial[None], t, axis=0),
        ],
        axis=-1,
    )
    return full.reshape(t * grid * grid, dim).astype(np.float32)


class PrithviBaseline(BaselineShell):
    """Prithvi adapter (fusion_mode='mod', S2 series only)."""

    backbone_size: str = "large"
    temporal_encoding: bool = True  # v2 "_tl" variant
    keep_norm: bool = True

    def setup(self) -> None:
        dim, depth, heads = PRITHVI_ARCHS[self.backbone_size]
        self._dim = dim
        self.patch_proj = nn.Dense(dim, dtype=self.dtype)
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, dim), jnp.float32,
        )
        self.blocks = [
            EncoderBlock(dim, heads, 4.0, dtype=self.dtype) for _ in range(depth)
        ]
        if self.temporal_encoding:
            # terratorch temporal encoder: linear maps of year/doy sincos
            self.temp_proj = nn.Dense(dim, dtype=self.dtype)
        if self.keep_norm:
            self.final_norm = nn.LayerNorm(dtype=self.dtype)
        self.heads = self.make_heads()

    def encode_for_heads(self, batch: dict) -> dict:
        batch = self.resize_and_rescale(batch)
        spec = self.plan.mod_specs["s2"]
        x = batch["s2"].astype(self.dtype)  # [B, D, C, H, W]
        b, d, c, hh, ww = x.shape
        p, grid = spec.patch_size, spec.grid
        l = grid * grid

        xp = x.reshape(b, d, c, grid, p, grid, p)
        xp = xp.transpose(0, 1, 3, 5, 2, 4, 6).reshape(b, d * l, c * p * p)
        tokens = self.patch_proj(xp)

        pos = jnp.asarray(sincos_3d(self._dim, d, grid))
        tokens = tokens + pos[None].astype(self.dtype)

        if self.temporal_encoding:
            dates = batch["s2_dates"].astype(jnp.float32)
            year = dates[:, :, 0]
            doy = dates[:, :, 1] / 365.25
            coords = jnp.concatenate(
                [
                    sincos_1d(self._dim // 2, year).reshape(b, d, -1),
                    sincos_1d(self._dim // 2, doy).reshape(b, d, -1),
                ],
                axis=-1,
            )
            temp = self.temp_proj(coords.astype(self.dtype))  # [B, D, dim]
            temp = jnp.broadcast_to(temp[:, :, None], (b, d, l, self._dim))
            tokens = tokens + temp.reshape(b, d * l, self._dim)

        cls = jnp.broadcast_to(
            self.cls_token.astype(self.dtype), (b, 1, self._dim),
        )
        tokens = jnp.concatenate([cls, tokens], axis=1)
        for block in self.blocks:
            tokens = block(tokens)
        if self.keep_norm:
            tokens = self.final_norm(tokens)
        tokens = tokens[:, 1:]

        return {"s2": tokens}


def build_prithvi(
    datasets: DatasetsConfig,
    cfg: BaselineConfig,
    dtype: Dtype = jnp.bfloat16,
) -> PrithviBaseline:
    if cfg.fusion_mode != "mod":
        msg = f"Prithvi requires fusion_mode='mod', got {cfg.fusion_mode!r}."
        raise ValueError(msg)
    if list(datasets.dataset.inputs) != ["s2"]:
        msg = (
            "Prithvi consumes only the S2 series; set "
            "datasets.<ds>.filter_inputs=[\"s2\"]."
        )
        raise ValueError(msg)
    version = cfg.version or ("v2" if cfg.model_size == "large" else "v1")
    allowed = {("base", "v1", False), ("large", "v2", False), ("large", "v2", True)}
    if cfg.model_size == "micro":  # test-only size: any combo
        allowed = {("micro", version, cfg.add_date_enc)}
    if (cfg.model_size, version, cfg.add_date_enc) not in allowed:
        msg = (
            f"Unsupported Prithvi combo size={cfg.model_size} version={version} "
            f"temporal={cfg.add_date_enc}; supported: {sorted(allowed)}."
        )
        raise ValueError(msg)
    plan, head_specs = build_baseline_plan(datasets, "mod", "prithvi")
    dim = PRITHVI_ARCHS[cfg.model_size][0]
    return PrithviBaseline(
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
        temporal_encoding=cfg.add_date_enc,
        keep_norm=cfg.keep_norm,
        dtype=dtype,
    )
