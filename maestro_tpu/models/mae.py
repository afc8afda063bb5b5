"""MAESTRO multimodal masked autoencoder (TPU-native).

Functional re-design of the reference model stack
(/root/reference/maestro/ssl/mim.py:26-505 + ssl/mae.py:15-307): the dynamic
dict-of-modules wiring becomes a static :class:`FusionPlan` closed over by one
flax module, so each (dataset, fusion_mode, phase) is a single fixed-shape XLA
graph.  Dates/band-groups are compiled into token layouts; masking is the
on-device biased shuffle of ops/masking.py; encoders/decoders are per-stream
ViTs with an optional shared inter-modality trunk.

Size variants (reference mae.py:309-378): tiny d192x12L, small d384x12L,
medium/base d768x12L mlp*4, large d1024x24L; decoder d512, depth 1/2/3/4.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from maestro_tpu.conf.core import MaskConfig, ModelConfig
from maestro_tpu.conf.dataset.base import DatasetConfig, RasterConfig
from maestro_tpu.conf.datasets import DatasetsConfig
from maestro_tpu.models.embed import PatchEmbed, Pixelify
from maestro_tpu.models.heads import ChunkedSegHead, ClassificationHead
from maestro_tpu.models.vit import Transformer
from maestro_tpu.ops.masking import shuffle_mask, structural_mask, unmask
from maestro_tpu.ops.posenc import build_pos_encoding, encode_dates
from maestro_tpu.ops.resize import resize_spatial
from maestro_tpu.specs.fusion import FusionPlan, build_fusion_plan

Dtype = Any
PHASES = ("pretrain", "probe", "finetune")


@dataclass(frozen=True)
class MAEArch:
    """Architecture hyper-parameters for one size variant."""

    embed_dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_ratio: int
    decoder_dim: int
    decoder_depth: int
    decoder_heads: int
    decoder_dim_head: int
    decoder_mlp_ratio: int


MAE_ARCHS: dict[str, MAEArch] = {
    # Head splits are TPU-native: 128-dim heads (same inner width, parameter
    # shapes, and FLOPs as the reference's 64/32-dim splits,
    # /root/reference/maestro/ssl/mae.py:345-360) fill the MXU's 128
    # reduction lanes in the attention score matmuls; 64/32-dim heads run
    # them at 50%/25% utilization (measured: 46.0% -> 47.7% MFU from the
    # encoder split alone). Reference checkpoints ported with the torch
    # splits set ModelConfig.{encoder,decoder}_heads/_dim_head — reference
    # values: encoder 3/6/12/16 x 64 (tiny/small/medium/large), decoder
    # 16 x 32. tiny keeps 3 x 64 (192 lanes cannot pack into 128-blocks).
    # "micro" is a test-only size for fast CPU CI; not a reference variant.
    "micro": MAEArch(64, 2, 2, 32, 2, 48, 1, 2, 24, 2),
    "tiny": MAEArch(192, 12, 3, 64, 2, 512, 1, 4, 128, 4),
    "small": MAEArch(384, 12, 3, 128, 2, 512, 2, 4, 128, 4),
    "medium": MAEArch(768, 12, 6, 128, 4, 512, 3, 4, 128, 4),
    "base": MAEArch(768, 12, 6, 128, 4, 512, 3, 4, 128, 4),
    "large": MAEArch(1024, 24, 8, 128, 4, 512, 4, 4, 128, 4),
}


@dataclass(frozen=True)
class HeadSpec:
    """Static description of one downstream target head."""

    name: str
    type_target: str
    num_classes: int
    missing_val: int
    pixel_patch: int = 1  # segment: target pixels per ref-grid token


def build_head_specs(dataset: DatasetConfig, plan: FusionPlan) -> tuple[HeadSpec, ...]:
    specs = []
    for name, target in dataset.targets.items():
        if isinstance(target, RasterConfig):
            if dataset.ref_input is None:
                msg = f"ref_input must be set for raster target {name!r}."
                raise ValueError(msg)
            target_size = round(dataset.crop_meters / target.resolution_meters)
            ref_grid = plan.mod_specs[dataset.ref_input].grid
            if target_size % ref_grid:
                msg = (
                    f"Target size {target_size} of {name!r} is not a multiple "
                    f"of the ref-input grid {ref_grid}."
                )
                raise ValueError(msg)
            specs.append(
                HeadSpec(name, target.type_target, target.num_classes,
                         target.missing_val, target_size // ref_grid),
            )
        else:
            specs.append(
                HeadSpec(name, target.type_target, target.num_classes,
                         target.missing_val),
            )
    return tuple(specs)


class MaestroMAE(nn.Module):
    """Multimodal MAE over a static FusionPlan."""

    plan: FusionPlan
    arch: MAEArch
    head_specs: tuple[HeadSpec, ...]
    inter_depth: int = 0
    interpolate: str = "nearest"
    type_head: str = "attentive"
    ref_input: str | None = None
    fac_abs_enc: float = 1.0
    fac_date_enc: float = 1.0
    date_dim: int = 8
    seg_chunk_rows: int = 2
    seg_unroll: int = 1
    dtype: Dtype = jnp.bfloat16
    remat: Any = False  # False | True/"full" | "dots" | "mlp" (models/vit.py)

    def setup(self) -> None:
        plan, arch = self.plan, self.arch

        # --- patch embed / pixelify, shared across mods by name_embed
        embed_specs = {}
        for spec in plan.mod_specs.values():
            prev = embed_specs.get(spec.name_embed)
            if prev is not None:
                if (prev.band_groups, prev.patch_size) != (
                    spec.band_groups, spec.patch_size,
                ):
                    msg = (
                        f"Modalities sharing name_embed {spec.name_embed!r} "
                        "must agree on band groups and patch size."
                    )
                    raise ValueError(msg)
                continue
            embed_specs[spec.name_embed] = spec
        self.patch_embed = {
            name: PatchEmbed(
                band_groups=spec.band_groups,
                patch_size=spec.patch_size,
                embed_dim=arch.embed_dim,
                dtype=self.dtype,
            )
            for name, spec in embed_specs.items()
        }
        self.pixelify = {
            name: Pixelify(
                band_groups=spec.band_groups,
                patch_size=spec.patch_size,
                dtype=self.dtype,
            )
            for name, spec in embed_specs.items()
        }

        # --- learnable mask token per modality: [1, G, 1, 1, dec_dim]
        self.mask_tokens = {
            name: self.param(
                f"mask_token_{name}",
                nn.initializers.normal(1.0),
                (1, spec.len_bands, 1, 1, arch.decoder_dim),
                jnp.float32,
            )
            for name, spec in plan.mod_specs.items()
        }

        # --- static positional encodings per modality (enc + dec widths)
        self._pos_enc = {
            name: jnp.asarray(
                build_pos_encoding(
                    plan.grid_pos_enc, spec.grid, arch.embed_dim, self.date_dim,
                    fac=self.fac_abs_enc,
                ),
            )
            for name, spec in plan.mod_specs.items()
        }
        self._pos_dec = {
            name: jnp.asarray(
                build_pos_encoding(
                    plan.grid_pos_enc, spec.grid, arch.decoder_dim, self.date_dim,
                ),
            )
            for name, spec in plan.mod_specs.items()
        }

        # --- per-stream encoders / decoders (+ optional shared trunk)
        enc_depth = arch.depth - self.inter_depth
        self.encoders = {
            name: Transformer(
                dim=arch.embed_dim, depth=enc_depth, heads=arch.heads,
                dim_head=arch.dim_head, mlp_dim=arch.embed_dim * arch.mlp_ratio,
                dtype=self.dtype, remat=self.remat,
            )
            for name in plan.encoder_names
        }
        self.enc_to_dec = {
            name: nn.Dense(arch.decoder_dim, dtype=self.dtype)
            for name in plan.encoder_names
        }
        self.decoders = {
            name: Transformer(
                dim=arch.decoder_dim, depth=arch.decoder_depth,
                heads=arch.decoder_heads, dim_head=arch.decoder_dim_head,
                # quirk kept from reference mae.py:162: decoder MLP width is
                # embed_dim * decoder_mlp_ratio, not decoder_dim * ratio
                mlp_dim=arch.embed_dim * arch.decoder_mlp_ratio,
                dtype=self.dtype, remat=self.remat,
            )
            for name in plan.encoder_names
        }
        if self.inter_depth:
            self.encoder_inter = Transformer(
                dim=arch.embed_dim, depth=self.inter_depth, heads=arch.heads,
                dim_head=arch.dim_head, mlp_dim=arch.embed_dim * arch.mlp_ratio,
                dtype=self.dtype, remat=self.remat,
            )

        # --- downstream heads
        heads = {}
        for hs in self.head_specs:
            if hs.type_target == "segment":
                heads[hs.name] = ChunkedSegHead(
                    type_head=self.type_head, dim=arch.embed_dim,
                    num_classes=hs.num_classes, patch_size=hs.pixel_patch,
                    ref_grid=plan.mod_specs[self.ref_input].grid,
                    mod_grids=tuple(
                        plan.mod_specs[m].grid for m in plan.mods
                    ),
                    chunk_rows=self.seg_chunk_rows,
                    unroll=self.seg_unroll,
                    dtype=self.dtype,
                )
            else:
                heads[hs.name] = ClassificationHead(
                    type_head=self.type_head, dim=arch.embed_dim,
                    num_classes=hs.num_classes, dtype=self.dtype,
                )
        self.heads = heads

    # ------------------------------------------------------------------
    def resize_and_rescale(self, batch: dict) -> dict:
        """Resize inputs to configured image sizes; DEM -> (DSM - DTM) * 30."""
        out = dict(batch)
        for name, spec in self.plan.mod_specs.items():
            x = batch[name]
            x = resize_spatial(x, spec.image_size, self.interpolate)
            if spec.rescale_elev:
                x = jnp.concatenate(
                    [x[:, :, :1], 30.0 * (x[:, :, :1] - x[:, :, 1:])], axis=2,
                )
            out[name] = x
        return out

    def embed_tokens(self, batch: dict) -> dict[str, jnp.ndarray]:
        """Patch-embed each modality and add positional + date encodings."""
        tokens = {}
        for name, spec in self.plan.mod_specs.items():
            t = self.patch_embed[spec.name_embed](batch[name])
            pos = self._pos_enc[name].astype(self.dtype)
            date = encode_dates(
                batch[f"{name}_dates"], batch["ref_date"],
                dim=self.arch.embed_dim, date_dim=self.date_dim,
                fac_date_enc=self.fac_date_enc,
                num_tokens=spec.tokens_per_date, len_bands=spec.len_bands,
                dtype=self.dtype,
            )
            tokens[name] = t + pos + date
        return tokens

    def mask_token_full(self, batch_size: int) -> dict[str, jnp.ndarray]:
        """Broadcast per-mod mask tokens to the full token layout."""
        out = {}
        for name, spec in self.plan.mod_specs.items():
            tok = self.mask_tokens[name].astype(self.dtype)
            tok = jnp.broadcast_to(
                tok,
                (batch_size, spec.len_bands, spec.num_dates, spec.tokens_per_date,
                 self.arch.decoder_dim),
            )
            out[name] = tok.reshape(
                batch_size, spec.date_axis, spec.tokens_per_date,
                self.arch.decoder_dim,
            )
        return out

    def encode_streams(self, streams: dict[str, jnp.ndarray]) -> dict[str, jnp.ndarray]:
        """Per-stream encoders, then the shared inter-modality trunk."""
        x = {
            name: self.encoders[self.plan.streams[name].encoder](xs)
            for name, xs in streams.items()
        }
        if self.inter_depth:
            sizes = {name: xs.shape[1] for name, xs in x.items()}
            trunk_in = jnp.concatenate([x[n] for n in self.plan.streams], axis=1)
            trunk_out = self.encoder_inter(trunk_in)
            x = self.plan.split_streams_sizes(trunk_out, sizes)
        return x

    def add_dec_encodings(self, streams: dict, batch: dict) -> dict:
        """Decoder-width positional + date encodings (post-unmask)."""
        x = self.plan.ungroup(streams)
        for name, spec in self.plan.mod_specs.items():
            pos = self._pos_dec[name].astype(self.dtype)
            date = encode_dates(
                batch[f"{name}_dates"], batch["ref_date"],
                dim=self.arch.decoder_dim, date_dim=self.date_dim,
                fac_date_enc=self.fac_date_enc,
                num_tokens=spec.tokens_per_date, len_bands=spec.len_bands,
                dtype=self.dtype,
            )
            x[name] = x[name] + pos + date
        return self.plan.group(x)

    def _seg_logits(self, x: dict, name: str) -> jnp.ndarray:
        """Segmentation logits via the chunked head (models/heads.py):
        ref-grid resize + date-stack + reduce run per row chunk, so the
        [B, sum(date_axis), ref_grid^2, E] tensor — several GB at FLAIR
        scale, the term that made medium finetune exceed v5e HBM — is never
        materialized.  Memory across fwd->bwd is bounded by the head itself
        (remat'd scan body; the fused pool kernel's custom VJP saves only
        its input + [B,L,H] softmax stats), so no outer ``nn.remat`` wraps
        this call — an earlier one recomputed the entire head forward
        (resize einsums + LN + kv projections) a second time in the
        backward pass for no memory benefit.
        """
        return self.heads[name](tuple(x[m] for m in self.plan.mods))

    def encode_for_heads(self, batch: dict) -> dict[str, jnp.ndarray]:
        """Frozen-trunk features for the downstream heads (grouped streams).

        Exactly the downstream forward up to (and including)
        ``encode_streams`` — everything ``compute_logits`` consumes.  In the
        probe phase this whole prefix is frozen (train/optim.py trains the
        'head' role only) and val/test loaders never call ``set_epoch``, so
        these features are constant across epochs: the runtime caches them on
        the host and re-runs only the heads for later val evals
        (train/eval_cache.py; reference probe semantics = detached features,
        head.py:17-25).
        """
        batch = self.resize_and_rescale(batch)
        tokens = self.embed_tokens(batch)
        streams = self.plan.group(tokens)
        return self.encode_streams(streams)

    def logits_from_features(self, feats: dict, phase: str) -> dict:
        """Heads over precomputed trunk features (probe eval cache protocol —
        the same method name BaselineShell exposes)."""
        return self.compute_logits(feats, phase)

    def compute_logits(self, encoded: dict, phase: str) -> dict[str, jnp.ndarray]:
        """Downstream logits: per-target heads over (resized) token grids."""
        x = self.plan.ungroup(encoded)

        x_cat = jnp.concatenate(
            [
                x[name].reshape(
                    x[name].shape[0], -1, x[name].shape[-1],
                )
                for name in self.plan.mods
            ],
            axis=1,
        )

        seg_fn = MaestroMAE._seg_logits
        logits = {}
        for hs in self.head_specs:
            if hs.type_target == "segment":
                feats = x
                if phase == "probe":
                    feats = jax.tree.map(jax.lax.stop_gradient, feats)
                logits[hs.name] = seg_fn(self, feats, hs.name)
            else:
                feats = x_cat
                if phase == "probe":
                    feats = jax.lax.stop_gradient(feats)
                logits[hs.name] = self.heads[hs.name](feats)
        return logits

    # ------------------------------------------------------------------
    def __call__(self, batch: dict, phase: str = "pretrain",
                 return_pixels: bool = True):
        """Forward pass.

        pretrain -> (rec, mask, targets) dicts per modality, where ``targets``
        are the resized/rescaled inputs the reconstruction loss compares
        against; probe/finetune -> logits dict per target.

        ``return_pixels=False`` (pretrain only) keeps the reconstruction in
        token space — rec[name] is [B, D, L, C*p*p] in (C, ph, pw) feature
        order with a [B, D, L] token mask — skipping the pixel shuffle and the
        full-resolution pixel-mask materialization the loss would immediately
        undo.  The hot train step uses this; visualization/eval use pixels.
        """
        if phase not in PHASES:
            msg = f"Invalid phase {phase!r}; expected {PHASES}."
            raise ValueError(msg)
        plan = self.plan
        batch = self.resize_and_rescale(batch)
        tokens = self.embed_tokens(batch)
        batch_size = next(iter(tokens.values())).shape[0]
        streams = plan.group(tokens)

        if phase != "pretrain":
            encoded = self.encode_streams(streams)
            return self.compute_logits(encoded, phase)

        # --- pretrain: structural + random masking, encode kept tokens
        key = self.make_rng("mask")
        key_struct, key_shuffle = jax.random.split(key)
        struct = structural_mask(plan, key_struct, batch_size)

        kept, mask_rec = {}, {}
        shuffle_keys = jax.random.split(key_shuffle, len(plan.streams))
        for i, (name, stream) in enumerate(plan.streams.items()):
            kept[name], mask_rec[name], _ = shuffle_mask(
                shuffle_keys[i], streams[name], struct[name], stream.num_masked,
            )

        encoded = self.encode_streams(kept)

        # --- decode: project, re-expand with mask tokens, add dec encodings
        dec_in = {
            name: self.enc_to_dec[plan.streams[name].encoder](xs)
            for name, xs in encoded.items()
        }
        mask_tok = plan.group(self.mask_token_full(batch_size))
        full = {
            name: unmask(dec_in[name], mask_tok[name], mask_rec[name])
            for name in plan.streams
        }
        full = self.add_dec_encodings(full, batch)
        decoded = {
            name: self.decoders[plan.streams[name].encoder](xs)
            for name, xs in full.items()
        }

        # --- reconstruct per modality (token space or pixels)
        x_mod = plan.ungroup(decoded)
        mask_mod = plan.ungroup(mask_rec)
        pixels_rec, mask_pixels = {}, {}
        for name, spec in plan.mod_specs.items():
            tokens_only = not return_pixels and spec.len_bands == 1
            pix, pmask = self.pixelify[spec.name_embed](
                x_mod[name], mask_mod[name], tokens_only=tokens_only,
            )
            # keep compute dtype: the loss paths cast as needed (fp32 stats)
            pixels_rec[name] = pix
            mask_pixels[name] = pmask
        targets = {name: batch[name] for name in plan.mod_specs}
        return pixels_rec, mask_pixels, targets


def build_model(
    datasets: DatasetsConfig,
    mask: MaskConfig,
    model_cfg: ModelConfig,
    dtype: Dtype = jnp.bfloat16,
    remat: Any = False,
) -> tuple[MaestroMAE, FusionPlan]:
    """Build the flagship MAE for a dataset + model config."""
    if model_cfg.model != "mae":
        msg = f"Unknown model {model_cfg.model!r}."
        raise ValueError(msg)
    if model_cfg.model_size not in MAE_ARCHS:
        msg = (
            f"Invalid model size {model_cfg.model_size!r}; "
            f"expected one of {tuple(MAE_ARCHS)}."
        )
        raise ValueError(msg)
    if model_cfg.inter_depth and model_cfg.fusion_mode not in ("mod", "group"):
        msg = (
            "inter_depth (shared trunk) requires fusion_mode 'mod' or 'group', "
            f"got {model_cfg.fusion_mode!r}."
        )
        raise ValueError(msg)

    dataset = datasets.dataset
    plan = build_fusion_plan(dataset, mask, model_cfg.fusion_mode, model="mae")
    head_specs = build_head_specs(dataset, plan)
    arch = MAE_ARCHS[model_cfg.model_size]
    for part in ("encoder", "decoder"):
        pfx = "" if part == "encoder" else "decoder_"
        cfg_heads = getattr(model_cfg, f"{part}_heads")
        cfg_dim = getattr(model_cfg, f"{part}_dim_head")
        if not (cfg_heads or cfg_dim):
            continue
        heads = cfg_heads or getattr(arch, f"{pfx}heads")
        dim_head = cfg_dim or getattr(arch, f"{pfx}dim_head")
        inner = getattr(arch, f"{pfx}heads") * getattr(arch, f"{pfx}dim_head")
        if heads * dim_head != inner:
            msg = (
                f"{part}_heads*{part}_dim_head ({heads}*{dim_head}) must keep "
                f"the {inner} inner width so parameter shapes stay "
                "port-compatible."
            )
            raise ValueError(msg)
        arch = replace(
            arch, **{f"{pfx}heads": heads, f"{pfx}dim_head": dim_head},
        )
    module = MaestroMAE(
        plan=plan,
        arch=arch,
        head_specs=head_specs,
        inter_depth=model_cfg.inter_depth,
        interpolate=model_cfg.interpolate,
        type_head=model_cfg.type_head,
        ref_input=dataset.ref_input,
        fac_abs_enc=1.0,
        fac_date_enc=1.0 if model_cfg.use_date_enc else 0.0,
        seg_chunk_rows=model_cfg.seg_chunk_rows,
        dtype=dtype,
        remat=remat,
    )
    return module, plan
