"""Build the experiment's model (MAE or baseline adapter) from configs.

Single construction point shared by the training runtime and the serving
export CLI, mirroring the reference's instantiate-by-config dispatch
(/root/reference/maestro/run_experiment.py:33-52).
"""

from __future__ import annotations

import jax.numpy as jnp

from maestro_tpu.conf.core import BaselineConfig, ExperimentConfig
from maestro_tpu.models.mae import build_model


def is_baseline_config(cfg: ExperimentConfig) -> bool:
    from maestro_tpu.baselines import BASELINE_MODELS

    return cfg.model.model in BASELINE_MODELS


def build_experiment_model(datasets, cfg: ExperimentConfig, dtype=None):
    """Returns (model, plan, is_baseline) for the experiment config."""
    if dtype is None:
        dtype = (
            jnp.bfloat16
            if cfg.trainer.compute_dtype == "bfloat16"
            else jnp.float32
        )
    if is_baseline_config(cfg):
        from maestro_tpu.baselines import build_baseline

        bcfg = BaselineConfig(
            interpolate=cfg.model.interpolate,
            fusion_mode=cfg.model.fusion_mode,
            model=cfg.model.model,
            model_size=cfg.model.model_size,
            type_head=cfg.model.type_head,
            freeze=cfg.model.freeze,
            weight_source=cfg.model.weight_source,
            pretrained_path=cfg.model.pretrained_path,
            keep_norm=cfg.model.keep_norm,
            add_date_enc=cfg.model.add_date_enc,
            use_ema=cfg.model.use_ema,
            version=cfg.model.version,
            seg_chunk_rows=cfg.model.seg_chunk_rows,
            seg_unroll=cfg.model.seg_unroll,
        )
        model = build_baseline(datasets, bcfg, dtype=dtype)
        return model, model.plan, True
    model, plan = build_model(
        datasets, cfg.mask, cfg.model, dtype=dtype, remat=cfg.trainer.remat,
    )
    return model, plan, False
