"""SatMAE baseline adapter (S2-only, timestamp positional embeddings).

Reference: /root/reference/maestro/baselines/satmae.py:26-519.  ViT encoder
whose positions reserve 384 channels for three 128-d sincos timestamp
embeddings (year, day-of-year slot, hour — the reference feeds doy into the
"month" slot, kept for parity) concatenated per date with a 2-D sincos grid
embedding over the remaining ``dim - 384`` channels; all dates of the S2
series are concatenated on the sequence axis ("mod" fusion); CLS prepended
and dropped after the final norm.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from maestro_tpu.baselines.backbone import EncoderBlock
from maestro_tpu.baselines.base import BaselineShell, build_baseline_plan
from maestro_tpu.conf.core import BaselineConfig
from maestro_tpu.conf.datasets import DatasetsConfig

Dtype = Any

SATMAE_ARCHS = {
    # "micro" is a test-only size for fast CPU CI (dim must exceed the
    # 3x128 reserved timestamp channels); not a SatMAE release
    "micro": (448, 2, 8),
    "base": (768, 12, 12),
    "large": (1024, 24, 16),
}
TS_DIM = 128  # per-component timestamp embedding width


def sincos_1d(dim: int, pos: jnp.ndarray) -> jnp.ndarray:
    """[M] -> [M, dim] (reference satmae.py:454-470)."""
    omega = jnp.arange(dim // 2, dtype=jnp.float32) / (dim / 2.0)
    omega = 1.0 / 10000.0**omega
    out = jnp.einsum("m,d->md", pos.reshape(-1).astype(jnp.float32), omega)
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)


def sincos_2d_grid(dim: int, grid: int) -> np.ndarray:
    """[grid*grid, dim] 2-D sincos (half for y, half for x)."""
    half = dim // 2
    omega = np.arange(half // 2, dtype=np.float64) / (half / 2.0)
    omega = 1.0 / 10000.0**omega
    ys, xs = np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij")

    def emb(p):
        out = np.einsum("m,d->md", p.ravel().astype(np.float64), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    return np.concatenate([emb(ys), emb(xs)], axis=1).astype(np.float32)


class SatMAEBaseline(BaselineShell):
    """SatMAE adapter (fusion_mode='mod', S2 time series only)."""

    backbone_size: str = "base"
    keep_norm: bool = True

    def setup(self) -> None:
        dim, depth, heads = SATMAE_ARCHS[self.backbone_size]
        self._dim = dim
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, dim), jnp.float32,
        )
        self.blocks = [
            EncoderBlock(dim, heads, 4.0, dtype=self.dtype) for _ in range(depth)
        ]
        self.patch_proj = nn.Dense(dim, dtype=self.dtype)
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

        # positions: [2D sincos (dim-384) | year | doy-slot | hour (3 x 128)]
        pos2d = jnp.asarray(sincos_2d_grid(self._dim - 3 * TS_DIM, grid))
        dates = batch["s2_dates"].astype(jnp.float32)  # [B, D, 3]
        ts = jnp.concatenate(
            [
                sincos_1d(TS_DIM, dates[:, :, 0]),
                sincos_1d(TS_DIM, dates[:, :, 1]),
                sincos_1d(TS_DIM, dates[:, :, 2]),
            ],
            axis=1,
        ).reshape(b, d, 1, 3 * TS_DIM)
        ts = jnp.broadcast_to(ts, (b, d, l, 3 * TS_DIM))
        pos = jnp.concatenate(
            [jnp.broadcast_to(pos2d[None, None], (b, d, l, pos2d.shape[-1])), ts],
            axis=-1,
        ).reshape(b, d * l, self._dim)
        tokens = tokens + pos.astype(self.dtype)

        cls = jnp.broadcast_to(
            self.cls_token.astype(self.dtype), (b, 1, self._dim),
        )
        tokens = jnp.concatenate([cls, tokens], axis=1)
        for block in self.blocks:
            tokens = block(tokens)
        if self.keep_norm:
            tokens = self.final_norm(tokens)
        tokens = tokens[:, 1:]

        return {"s2": tokens}  # [B, D*L, C] == grouped "mod" layout


def build_satmae(
    datasets: DatasetsConfig,
    cfg: BaselineConfig,
    dtype: Dtype = jnp.bfloat16,
) -> SatMAEBaseline:
    if cfg.fusion_mode != "mod":
        msg = f"SatMAE requires fusion_mode='mod', got {cfg.fusion_mode!r}."
        raise ValueError(msg)
    if list(datasets.dataset.inputs) != ["s2"]:
        msg = (
            "SatMAE consumes only the S2 series; set "
            "datasets.<ds>.filter_inputs=[\"s2\"]."
        )
        raise ValueError(msg)
    plan, head_specs = build_baseline_plan(datasets, "mod", "satmae")
    dim = SATMAE_ARCHS[cfg.model_size][0]
    return SatMAEBaseline(
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
        keep_norm=cfg.keep_norm,
        dtype=dtype,
    )
