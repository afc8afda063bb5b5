"""Baseline foundation-model adapters (DINOv2, DOFA, CROMA, SatMAE, Prithvi).

These run competitor checkpoints through the same probe/finetune harness as
the flagship MAE (reference /root/reference/maestro/baselines/).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from maestro_tpu.conf.core import BaselineConfig
from maestro_tpu.conf.datasets import DatasetsConfig

BASELINE_MODELS = ("dinov2", "dofa", "croma", "satmae", "prithvi")


def build_baseline(
    datasets: DatasetsConfig,
    cfg: BaselineConfig,
    dtype: Any = jnp.bfloat16,
):
    """Build a baseline adapter by name (cfg.model)."""
    match cfg.model:
        case "dinov2":
            from maestro_tpu.baselines.dinov2 import build_dinov2

            return build_dinov2(datasets, cfg, dtype)
        case "dofa":
            from maestro_tpu.baselines.dofa import build_dofa

            return build_dofa(datasets, cfg, dtype)
        case "croma":
            from maestro_tpu.baselines.croma import build_croma

            return build_croma(datasets, cfg, dtype)
        case "satmae":
            from maestro_tpu.baselines.satmae import build_satmae

            return build_satmae(datasets, cfg, dtype)
        case "prithvi":
            from maestro_tpu.baselines.prithvi import build_prithvi

            return build_prithvi(datasets, cfg, dtype)
    msg = f"Unknown baseline model {cfg.model!r}; expected {BASELINE_MODELS}."
    raise ValueError(msg)
