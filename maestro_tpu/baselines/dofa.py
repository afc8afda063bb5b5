"""DOFA baseline adapter (wavelength-conditioned dynamic patch embedding).

Reference: /root/reference/maestro/baselines/dofa.py:22-678.  Each modality's
patch-embed conv weights are *generated* from sin/cos embeddings of its band
center wavelengths (um) by a small transformer ("TransformerWeightGenerator"):
128 learned weight tokens + per-band wavelength tokens + 1 bias token run
through a post-LN encoder layer; band-token outputs map to per-band conv
kernels, the bias token to the conv bias, both scaled by 0.01.  The dynamic
conv uses stride=patch and padding=1 (kept as-is for weight parity).  A plain
CLS+pos ViT encodes the tokens; fusion is shared/monotemp.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from maestro_tpu.baselines.backbone import EncoderBlock, interpolate_pos_embed
from maestro_tpu.baselines.base import BaselineShell, build_baseline_plan
from maestro_tpu.conf.core import BaselineConfig
from maestro_tpu.conf.datasets import DatasetsConfig

Dtype = Any

DOFA_ARCHS = {
    # "micro" is a test-only size for fast CPU CI; not a DOFA release
    "micro": (64, 2, 2),
    "base": (768, 12, 12),
    "large": (1024, 24, 16),
}

# per-modality band center wavelengths in micrometers (reference dofa.py:114-131)
DOFA_WAVELENGTHS = {
    "aerial": (0.64, 0.56, 0.48, 0.81),
    "spot": (0.66, 0.56, 0.48),
    "s2": (0.665, 0.560, 0.490, 0.842, 0.705, 0.740, 0.783, 0.865, 1.610, 2.190),
    "s1_asc": (5.405, 5.405),
    "s1_des": (5.405, 5.405),
    "s1": (5.405, 5.405),
    "dem": (0.0, 0.0),  # elevation has no wavelength; zeros as neutral input
    "landsat": (0.443, 0.482, 0.561, 0.655, 0.865, 1.609, 2.201, 0.590, 1.373,
                10.9, 12.0),
}


def wave_position_embedding(dim: int, pos: jnp.ndarray) -> jnp.ndarray:
    """1-D sin/cos embedding of wavelengths*1000 (reference dofa.py:429-461)."""
    omega = jnp.arange(dim // 2, dtype=jnp.float32) / (dim / 2.0)
    omega = 1.0 / 10000.0**omega
    out = jnp.einsum("m,d->md", pos.reshape(-1), omega)
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)


class PostLNEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer(norm_first=False) semantics."""

    dim: int
    heads: int = 4
    ffn_dim: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        l, c = x.shape
        dh = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(l, self.heads, dh).transpose(1, 0, 2)
        k = k.reshape(l, self.heads, dh).transpose(1, 0, 2)
        v = v.reshape(l, self.heads, dh).transpose(1, 0, 2)
        logits = jnp.einsum("hqd,hkd->hqk", q, k) * dh**-0.5
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("hqk,hkd->hqd", attn, v)
        out = out.transpose(1, 0, 2).reshape(l, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x + out)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x + y)


class DOFAEmbedding(nn.Module):
    """Wavelength -> dynamic conv patch embedding."""

    wave_dim: int  # 128
    patch_size: int
    embed_dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, wavelengths: jnp.ndarray) -> jnp.ndarray:
        """[B, C, H, W] -> [B, L, embed_dim] via generated conv weights."""
        num_bands = wavelengths.shape[0]
        waves = wave_position_embedding(self.wave_dim, wavelengths * 1000.0)
        # FCResLayer: two ReLU-activated linears with residual
        y = nn.relu(nn.Dense(self.wave_dim, name="fcres_w1")(waves))
        y = nn.relu(nn.Dense(self.wave_dim, name="fcres_w2")(y))
        waves = waves + y

        # weight-generator transformer over [128 weight tokens | bands | bias]
        wt = self.param(
            "weight_tokens", nn.initializers.normal(0.02),
            (128, self.wave_dim), jnp.float32,
        )
        bt = self.param(
            "bias_token", nn.initializers.normal(0.02), (1, self.wave_dim),
            jnp.float32,
        )
        seq = jnp.concatenate([wt, waves, bt], axis=0)
        seq = PostLNEncoderLayer(self.wave_dim, name="weight_gen")(seq)

        kernel_feats = self.patch_size * self.patch_size * self.embed_dim
        weight = nn.Dense(kernel_feats, name="fc_weight")(
            seq[128 : 128 + num_bands] + waves,
        )
        bias = nn.Dense(self.embed_dim, name="fc_bias")(seq[-1]) * 0.01
        # [num_bands, p, p, embed] -> conv kernel [p, p, C_in, C_out]
        kernel = weight.reshape(
            num_bands, self.patch_size, self.patch_size, self.embed_dim,
        ).transpose(1, 2, 0, 3) * 0.01

        out = jax.lax.conv_general_dilated(
            x.astype(jnp.float32),
            kernel,
            window_strides=(self.patch_size, self.patch_size),
            padding=((1, 1), (1, 1)),  # reference quirk: padding=1
            dimension_numbers=("NCHW", "HWIO", "NHWC"),
        )
        out = out + bias
        b, gh, gw, c = out.shape
        return out.reshape(b, gh * gw, c).astype(self.dtype)


class DOFABaseline(BaselineShell):
    """DOFA adapter: dynamic patch embed + shared/per-mod ViT encoder."""

    backbone_size: str = "base"
    keep_norm: bool = True

    def setup(self) -> None:
        dim, depth, heads = DOFA_ARCHS[self.backbone_size]
        self.embedders = {
            name: DOFAEmbedding(
                wave_dim=128, patch_size=spec.patch_size, embed_dim=dim,
                dtype=self.dtype,
            )
            for name, spec in self.plan.mod_specs.items()
        }
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, dim), jnp.float32,
        )
        # positions trained at 224px/p16 -> grid 14 (+CLS)
        self.pos_embeds = {
            name: self.param(
                f"pos_{name}", nn.initializers.normal(0.02), (1, 14 * 14 + 1, dim),
                jnp.float32,
            )
            for name in self.plan.mods
        }
        self.blocks = {
            enc: [
                EncoderBlock(dim, heads, 4.0, dtype=self.dtype)
                for _ in range(depth)
            ]
            for enc in self.plan.encoder_names
        }
        if self.keep_norm:
            self.final_norm = nn.LayerNorm(dtype=self.dtype)
        self.heads = self.make_heads()
        self._dim = dim

    def encode_for_heads(self, batch: dict) -> dict:
        batch = self.resize_and_rescale(batch)
        pixels = self.plan.group({name: batch[name] for name in self.plan.mods})

        feats = {}
        for name, spec in self.plan.mod_specs.items():
            waves = jnp.asarray(DOFA_WAVELENGTHS[name][: spec.num_channels])
            tokens = self.embedders[name](pixels[name], waves)
            grid = round(tokens.shape[1] ** 0.5)

            pos = interpolate_pos_embed(self.pos_embeds[name], grid, has_cls=True)
            cls = self.cls_token.astype(self.dtype) + pos[:, :1].astype(self.dtype)
            cls = jnp.broadcast_to(cls, (tokens.shape[0], 1, self._dim))
            tokens = tokens + pos[:, 1:].astype(self.dtype)
            tokens = jnp.concatenate([cls, tokens], axis=1)

            for block in self.blocks[self.plan.streams[name].encoder]:
                tokens = block(tokens)
            if self.keep_norm:
                tokens = self.final_norm(tokens)
            tokens = tokens[:, 1:]
            # padding quirk can change the grid by one row/col: resize back
            if grid != spec.grid:
                from maestro_tpu.ops.resize import resize_token_grid

                tokens = resize_token_grid(
                    tokens[:, None], spec.grid, "bilinear",
                )[:, 0]
            feats[name] = tokens

        if self.add_date_enc:
            feats = self.add_date_encodings(feats, batch)
        return feats


def build_dofa(
    datasets: DatasetsConfig,
    cfg: BaselineConfig,
    dtype: Dtype = jnp.bfloat16,
) -> DOFABaseline:
    if cfg.fusion_mode not in ("shared", "monotemp"):
        msg = f"DOFA supports shared/monotemp fusion, got {cfg.fusion_mode!r}."
        raise ValueError(msg)
    for name in datasets.dataset.inputs:
        if name not in DOFA_WAVELENGTHS:
            msg = f"No DOFA wavelength table for modality {name!r}."
            raise ValueError(msg)
    plan, head_specs = build_baseline_plan(datasets, cfg.fusion_mode, "dofa")
    dim = DOFA_ARCHS[cfg.model_size][0]
    return DOFABaseline(
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
