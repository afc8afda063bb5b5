"""CROMA baseline adapter (dual SAR/optical encoders + cross-attention).

Reference: /root/reference/maestro/baselines/croma.py:19-775.  Patch-8 ViTs
with a 2-D ALiBi attention bias (distance-based, per-head slopes): the S2
encoder at full depth over 12 optical channels (the dataset's 10 S2 bands are
expanded by duplicating band 9 twice, croma.py:289), the S1 encoder at half
depth over 2 SAR channels with ascending+descending stacks concatenated on
the date axis (croma.py:284), and a half-depth cross-attention joint encoder.
Fusion modes: "late-croma" (per-modality features) and "inter-croma" (joint
tokens appended as a pseudo-modality).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from maestro_tpu.baselines.base import BaselineShell, build_baseline_plan
from maestro_tpu.conf.core import BaselineConfig
from maestro_tpu.conf.datasets import DatasetsConfig
from maestro_tpu.ops.posenc import encode_dates

Dtype = Any

CROMA_ARCHS = {
    # "micro" is a test-only size for fast CPU CI; not a CROMA release
    "micro": (64, 2, 2),
    "base": (768, 12, 16),
    "large": (1024, 24, 16),
}


def alibi_slopes(num_heads: int) -> list[float]:
    def power_of_2(n: int) -> list[float]:
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * start**i for i in range(n)]

    if math.log2(num_heads).is_integer():
        return power_of_2(num_heads)
    closest = 2 ** math.floor(math.log2(num_heads))
    return (
        power_of_2(closest)
        + alibi_slopes(2 * closest)[0::2][: num_heads - closest]
    )


def get_2d_alibi(num_heads: int, grid: int) -> np.ndarray:
    """[1, H, L, L] negative-distance bias (reference croma.py:480-511)."""
    ys, xs = np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij")
    pts = np.stack([ys.ravel(), xs.ravel()], axis=1).astype(np.float64)
    dist = np.sqrt(((pts[:, None] - pts[None, :]) ** 2).sum(-1))
    slopes = np.asarray(alibi_slopes(num_heads))[:, None, None]
    return (-dist[None] * slopes)[None].astype(np.float32)


class BiasedSelfAttention(nn.Module):
    """Pre-LN self-attention with additive attention bias, qkv bias-free."""

    dim: int
    heads: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
        b, l, _ = x.shape
        dh = self.dim // self.heads
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(self.dim * 3, use_bias=False, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, self.heads, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, self.heads, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, l, self.heads, dh).transpose(0, 2, 1, 3)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32,
        ) * dh**-0.5
        attn = jax.nn.softmax(logits + bias, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(out)


class BiasedCrossAttention(nn.Module):
    dim: int
    heads: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context, bias):
        b, l, _ = x.shape
        dh = self.dim // self.heads
        norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        xq, ctx = norm(x), norm(context)
        q = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_q")(xq)
        k = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        q = q.reshape(b, l, self.heads, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, self.heads, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, -1, self.heads, dh).transpose(0, 2, 1, 3)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32,
        ) * dh**-0.5
        attn = jax.nn.softmax(logits + bias, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(out)


class CromaFFN(nn.Module):
    dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        y = nn.Dense(self.dim * 4, dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)


class CromaViT(nn.Module):
    """Patch-8 linear embed + ALiBi transformer (no CLS, no pos embed)."""

    dim: int
    depth: int
    heads: int
    patch_size: int = 8
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
        b, c, hh, ww = x.shape
        p = self.patch_size
        g = hh // p
        xp = x.reshape(b, c, g, p, g, p).transpose(0, 2, 4, 1, 3, 5)
        xp = xp.reshape(b, g * g, c * p * p)
        tokens = nn.Dense(self.dim, dtype=self.dtype, name="embed")(
            xp.astype(self.dtype),
        )
        for i in range(self.depth):
            tokens = tokens + BiasedSelfAttention(
                self.dim, self.heads, dtype=self.dtype, name=f"attn{i}",
            )(tokens, bias)
            tokens = tokens + CromaFFN(self.dim, dtype=self.dtype, name=f"ffn{i}")(
                tokens,
            )
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(tokens)


class CromaBaseline(BaselineShell):
    """CROMA adapter with late / inter fusion."""

    backbone_size: str = "base"
    fusion_mode_croma: str = "inter-croma"

    def setup(self) -> None:
        dim, depth, heads = CROMA_ARCHS[self.backbone_size]
        self._dim, self._heads = dim, heads
        self.has_s2 = "s2" in self.plan.mods
        self.has_s1 = any(m.startswith("s1") for m in self.plan.mods)
        if self.has_s1:
            self.s1_encoder = CromaViT(dim, depth // 2, heads, dtype=self.dtype)
        if self.has_s2:
            self.s2_encoder = CromaViT(dim, depth, heads, dtype=self.dtype)
        if self.has_s1 and self.has_s2:
            # joint encoder layers: self-attn -> cross-attn -> ffn
            # (reference croma.py BaseTransformerCrossAttn)
            self.joint_self_attns = [
                BiasedSelfAttention(dim, heads, dtype=self.dtype)
                for _ in range(depth // 2)
            ]
            self.cross_attns = [
                BiasedCrossAttention(dim, heads, dtype=self.dtype)
                for _ in range(depth // 2)
            ]
            self.cross_ffns = [
                CromaFFN(dim, dtype=self.dtype) for _ in range(depth // 2)
            ]
            self.cross_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self._has_joint = (
            self.has_s1 and self.has_s2
            and self.fusion_mode_croma == "inter-croma"
        )
        # CROMA encodes only S1/S2 (other plan modalities are ignored, like
        # the reference which raises on neither and never consumes extras,
        # croma.py:121-131); joint tokens live on the shared encoder grid
        # (the grid the 2-D ALiBi bias is built for) and the segmentation
        # head treats them as one extra stream after the encoded modalities
        self._streams = tuple(
            m for m in self.plan.mods if m == "s2" or m.startswith("s1")
        )
        grids = tuple(self.plan.mod_specs[m].grid for m in self._streams)
        if self._has_joint:
            s1_mods = [m for m in self._streams if m.startswith("s1")]
            shared = (
                self.plan.mod_specs.get("s2")
                or self.plan.mod_specs[s1_mods[0]]
            )
            grids = grids + (shared.grid,)
        self.heads = self.make_heads(stream_grids=grids)

    def encode_for_heads(self, batch: dict) -> tuple:
        """Backbone features: (per-modality feats dict, joint tokens or None).

        The tuple (a pytree) is what ``logits_from_features`` consumes —
        CROMA's inter-croma joint stream rides along as the second element.
        """
        batch = self.resize_and_rescale(batch)
        plan = self.plan

        # SAR: asc + des concatenated on the date axis; single combined "s1"
        s1_mods = [m for m in plan.mods if m.startswith("s1")]
        s2_spec = plan.mod_specs.get("s2")
        grid = (s2_spec or plan.mod_specs[s1_mods[0]]).grid
        bias = jnp.asarray(get_2d_alibi(self._heads, grid))

        sar_tokens = opt_tokens = None
        if self.has_s1:
            s1_stack = jnp.concatenate([batch[m] for m in s1_mods], axis=1)
            bs, ds = s1_stack.shape[:2]
            sar = s1_stack.reshape((bs * ds,) + s1_stack.shape[2:])
            sar_tokens = self.s1_encoder(sar, bias)
        if self.has_s2:
            s2 = batch["s2"]
            # 10 -> 12 channels: duplicate band 9 twice (croma.py:289)
            s2 = jnp.concatenate([s2, s2[:, :, 9:10], s2[:, :, 9:10]], axis=2)
            bo, do = s2.shape[:2]
            opt = s2.reshape((bo * do,) + s2.shape[2:])
            opt_tokens = self.s2_encoder(opt, bias)

        feats = {}
        if opt_tokens is not None:
            feats["s2"] = opt_tokens.reshape(bo, do, -1, self._dim)
        if sar_tokens is not None:
            sar4 = sar_tokens.reshape(bs, ds, -1, self._dim)
            off = 0
            for m in s1_mods:
                d_m = plan.mod_specs[m].num_dates
                feats[m] = sar4[:, off : off + d_m]
                off += d_m

        joint = None
        if self.has_s1 and self.has_s2 and self.fusion_mode_croma == "inter-croma":
            # joint encoder pairs SAR/optical of matching date counts; the
            # adapter uses the first min(ds, do) date slices of each
            dj = min(ds, do)
            x = sar_tokens.reshape(bs, ds, -1, self._dim)[:, :dj]
            ctx = opt_tokens.reshape(bo, do, -1, self._dim)[:, :dj]
            x = x.reshape(bs * dj, -1, self._dim)
            ctx = ctx.reshape(bo * dj, -1, self._dim)
            for sattn, xattn, ffn in zip(
                self.joint_self_attns, self.cross_attns, self.cross_ffns,
            ):
                x = x + sattn(x, bias)
                x = x + xattn(x, ctx, bias)
                x = x + ffn(x)
            joint = self.cross_norm(x).reshape(bs, dj, -1, self._dim)

        if self.add_date_enc:
            for name in feats:
                spec = plan.mod_specs[name]
                feats[name] = feats[name] + encode_dates(
                    batch[f"{name}_dates"], batch["ref_date"],
                    dim=self._dim, date_dim=self.date_dim,
                    fac_date_enc=self.fac_date_enc,
                    num_tokens=feats[name].shape[2], len_bands=1,
                    dtype=feats[name].dtype,
                )

        return feats, joint

    def logits_from_features(self, fj: tuple, phase: str) -> dict:
        feats, joint = fj
        return self._logits(feats, joint, phase)

    def _seg_logits(self, xs: tuple, name: str) -> jnp.ndarray:
        """Chunked segmentation over native-grid streams (joint appended) —
        ChunkedSegHead does the per-chunk bilinear resize to the ref grid, so
        the [B, sum(dates), ref_grid^2, E] tensor is never materialized
        (same path as BaselineShell.compute_logits; reference semantics
        croma.py:116-119,300-301 + base.py:19-217)."""
        return self.heads[name](xs)

    def _logits(self, feats: dict, joint, phase: str) -> dict:
        # stream order must match setup's mod_grids: S1/S2 in plan order,
        # joint last
        streams = [feats[m] for m in self._streams]
        if joint is not None:
            streams.append(joint)
        x_cat = jnp.concatenate(
            [s.reshape(s.shape[0], -1, self._dim) for s in streams], axis=1,
        )
        seg_fn = nn.remat(CromaBaseline._seg_logits, static_argnums=(2,))
        logits = {}
        for hs in self.head_specs:
            if hs.type_target == "segment":
                f = tuple(streams)
                if phase == "probe":
                    f = jax.tree.map(jax.lax.stop_gradient, f)
                logits[hs.name] = seg_fn(self, f, hs.name)
            else:
                f = x_cat
                if phase == "probe":
                    f = jax.lax.stop_gradient(f)
                logits[hs.name] = self.heads[hs.name](f)
        return logits


def build_croma(
    datasets: DatasetsConfig,
    cfg: BaselineConfig,
    dtype: Dtype = jnp.bfloat16,
) -> CromaBaseline:
    if cfg.fusion_mode not in ("late-croma", "inter-croma"):
        msg = f"CROMA supports late-croma/inter-croma, got {cfg.fusion_mode!r}."
        raise ValueError(msg)
    plan, head_specs = build_baseline_plan(datasets, cfg.fusion_mode, "croma")
    dim = CROMA_ARCHS[cfg.model_size][0]
    return CromaBaseline(
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
        fusion_mode_croma=cfg.fusion_mode,
        dtype=dtype,
    )
