"""Shared shell for baseline foundation-model adapters.

Reference: /root/reference/maestro/baselines/base.py:19-217.  The adapters let
the same probe/finetune harness evaluate competitor checkpoints (DINOv2, DOFA,
CROMA, SatMAE, Prithvi-EO) on MAESTRO's datasets: every modality is resized to
its configured image size, patch-embedded with the FM's own patch size (floor
grid), run through the (optionally frozen) backbone, optionally augmented with
date encodings, and pooled by the same classification/segmentation heads as
the flagship model.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from maestro_tpu.conf.datasets import DatasetsConfig
from maestro_tpu.models.heads import ChunkedSegHead, ClassificationHead
from maestro_tpu.models.mae import HeadSpec, build_head_specs
from maestro_tpu.ops.posenc import encode_dates
from maestro_tpu.ops.resize import resize_spatial
from maestro_tpu.specs.fusion import FusionPlan, build_fusion_plan

Dtype = Any


def build_baseline_plan(
    datasets: DatasetsConfig,
    fusion_mode: str,
    model: str,
) -> tuple[FusionPlan, tuple[HeadSpec, ...]]:
    """FusionPlan + head specs for a baseline FM (floor-grid patching)."""
    plan_mode = "shared" if fusion_mode in ("late-croma", "inter-croma") else fusion_mode
    plan = build_fusion_plan(
        datasets.dataset, None, plan_mode, model=model, floor_grid=True,
    )
    for name, spec in plan.mod_specs.items():
        if spec.grid == 0:
            msg = (
                f"Modality {name!r} image_size {spec.image_size} is smaller than "
                f"the {model} patch size {spec.patch_size}; override "
                f"datasets.<ds>.{name}.image_size on the CLI."
            )
            raise ValueError(msg)
    # baseline heads consume grid = image_size // fm_patch (stride 1)
    head_specs = build_head_specs(datasets.dataset, plan)
    return plan, head_specs


class BaselineShell(nn.Module):
    """Mixin-style base: heads, date encodings and logits over a FusionPlan.

    Subclasses implement ``backbone_features(batch_grouped) -> dict[stream]``
    returning per-stream token features [B', L, C] (CLS removed).
    """

    plan: FusionPlan
    head_specs: tuple[HeadSpec, ...]
    embed_dim: int = 768
    type_head: str = "attentive"
    interpolate: str = "nearest"
    ref_input: str | None = None
    add_date_enc: bool = True
    fac_date_enc: float = 1.0
    date_dim: int = 8
    seg_chunk_rows: int = 2
    seg_unroll: int = 1
    dtype: Dtype = jnp.bfloat16

    def make_heads(
        self, stream_grids: tuple[int, ...] | None = None,
    ) -> dict[str, nn.Module]:
        """Heads per target.  ``stream_grids`` overrides the native token
        grid per feature stream for the segmentation head when the adapter's
        streams differ from ``plan.mods`` (CROMA: S1/S2 only, plus the joint
        tokens as an extra stream; reference croma.py:116-119)."""
        if stream_grids is None:
            stream_grids = tuple(
                self.plan.mod_specs[m].grid for m in self.plan.mods
            )
        heads = {}
        for hs in self.head_specs:
            if hs.type_target == "segment":
                heads[hs.name] = ChunkedSegHead(
                    type_head=self.type_head, dim=self.embed_dim,
                    num_classes=hs.num_classes, patch_size=hs.pixel_patch,
                    ref_grid=self.plan.mod_specs[self.ref_input].grid,
                    mod_grids=stream_grids,
                    chunk_rows=self.seg_chunk_rows,
                    unroll=self.seg_unroll,
                    dtype=self.dtype,
                )
            else:
                heads[hs.name] = ClassificationHead(
                    type_head=self.type_head, dim=self.embed_dim,
                    num_classes=hs.num_classes, dtype=self.dtype,
                )
        return heads

    def resize_and_rescale(self, batch: dict) -> dict:
        out = dict(batch)
        for name, spec in self.plan.mod_specs.items():
            x = resize_spatial(batch[name], spec.image_size, self.interpolate)
            if spec.rescale_elev:
                x = jnp.concatenate(
                    [x[:, :, :1], 30.0 * (x[:, :, :1] - x[:, :, 1:])], axis=2,
                )
            # floor grid: crop the right/bottom remainder (strided-conv drop)
            crop = spec.grid * spec.patch_size
            out[name] = x[..., :crop, :crop]
        return out

    def add_date_encodings(self, feats: dict, batch: dict) -> dict:
        """Add date encodings per modality (ungrouped layout)."""
        x = self.plan.ungroup(feats)
        for name, spec in self.plan.mod_specs.items():
            date = encode_dates(
                batch[f"{name}_dates"], batch["ref_date"],
                dim=self.embed_dim, date_dim=self.date_dim,
                fac_date_enc=self.fac_date_enc,
                num_tokens=spec.tokens_per_date, len_bands=spec.len_bands,
                dtype=x[name].dtype,
            )
            x[name] = x[name] + date
        return self.plan.group(x)

    def _seg_logits(self, x: dict, name: str) -> jnp.ndarray:
        """Checkpointed chunked segmentation path (see MaestroMAE._seg_logits):
        the date-stacked ref-grid tensor is never materialized."""
        return self.heads[name](tuple(x[m] for m in self.plan.mods))

    def __call__(self, batch: dict, phase: str = "finetune") -> dict:
        """Adapters implement ``encode_for_heads``; the head pass is shared.

        The split mirrors MaestroMAE: ``encode_for_heads`` is the (frozen in
        probe) backbone + date-encoding prefix, ``logits_from_features`` the
        trainable heads — which lets the probe val feature cache
        (train/eval_cache.py) skip the backbone on repeat val epochs.
        """
        return self.logits_from_features(self.encode_for_heads(batch), phase)

    def logits_from_features(self, feats, phase: str) -> dict:
        """Heads over precomputed backbone features (see ``__call__``)."""
        return self.compute_logits(feats, phase, self.heads)

    def compute_logits(self, feats: dict, phase: str, heads: dict) -> dict:
        x = self.plan.ungroup(feats)
        x_cat = jnp.concatenate(
            [x[m].reshape(x[m].shape[0], -1, x[m].shape[-1]) for m in self.plan.mods],
            axis=1,
        )
        seg_fn = nn.remat(BaselineShell._seg_logits, static_argnums=(2,))
        logits = {}
        for hs in self.head_specs:
            if hs.type_target == "segment":
                f = x
                if phase == "probe":
                    f = jax.tree.map(jax.lax.stop_gradient, f)
                logits[hs.name] = seg_fn(self, f, hs.name)
            else:
                f = x_cat
                if phase == "probe":
                    f = jax.lax.stop_gradient(f)
                logits[hs.name] = heads[hs.name](f)
        return logits
