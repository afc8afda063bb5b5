"""Every baseline FM adapter on segmentation datasets (PASTIS-HD + FLAIR).

Round-3 review reproduced a crash in the CROMA segmentation path (the
reference's Table-2 CROMA/PASTIS cell, /root/reference/README.md:120-129):
baseline adapters had test coverage on TreeSatAI classification only.  This
module runs all five adapters through probe AND finetune supervised steps on
PASTIS-HD (seg target on the S2 ref grid) and forward passes on FLAIR
(seg target on the aerial ref grid), asserting finite losses and exact logit
shapes.

SatMAE and Prithvi are S2-only adapters (reference satmae.py / prithvi.py
reject multimodal inputs), so on PASTIS they run with filter_inputs=["s2"];
FLAIR's segmentation target lives on the aerial grid, which those two
adapters cannot consume (ref_input must be an encoded modality), matching
the reference's support matrix.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maestro_tpu.baselines import build_baseline
from maestro_tpu.conf import (
    BaselineConfig,
    DatasetsConfig,
    OptFinetuneConfig,
    OptProbeConfig,
)
from maestro_tpu.train import metrics as M
from maestro_tpu.train.optim import make_optimizer
from maestro_tpu.train.state import TrainState
from maestro_tpu.train.steps import make_supervised_step
from maestro_tpu.utils.testing import make_synthetic_batch

PASTIS_CASES = [
    ("dinov2", BaselineConfig(model="dinov2", model_size="micro",
                              fusion_mode="shared")),
    ("dofa", BaselineConfig(model="dofa", model_size="micro",
                            fusion_mode="shared")),
    ("croma-late", BaselineConfig(model="croma", model_size="micro",
                                  fusion_mode="late-croma")),
    ("croma-inter", BaselineConfig(model="croma", model_size="micro",
                                   fusion_mode="inter-croma")),
    ("satmae", BaselineConfig(model="satmae", model_size="micro",
                              fusion_mode="mod")),
    ("prithvi", BaselineConfig(model="prithvi", model_size="micro",
                               fusion_mode="mod", version="v2")),
]


def _pastis_for(model: str) -> DatasetsConfig:
    ds = DatasetsConfig(name_dataset="pastis_hd")
    if model in ("satmae", "prithvi"):
        # S2-only adapters; keep ref_input="s2" (the seg target's grid)
        ds.pastis_hd.filter_inputs = ["s2"]
        ds.pastis_hd.__post_init__()
    return ds


def _init_and_logits(model, batch, phase):
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda b: model.init({"params": key}, b, phase))(batch)
    logits = jax.jit(
        lambda p, b: model.apply(p, b, phase), static_argnums=(),
    )(params, batch)
    return params, logits


@pytest.mark.parametrize("name,cfg", PASTIS_CASES,
                         ids=[c[0] for c in PASTIS_CASES])
def test_pastis_segmentation_probe_and_finetune(name, cfg):
    """One probe step + one finetune step per adapter: finite loss_pred,
    seg logits [B, 1, K, 16, 16] on the S2 ref grid."""
    ds = _pastis_for(cfg.model)
    model = build_baseline(ds, cfg, dtype=jnp.float32)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(ds.dataset, 2).items()
    }
    params, logits = _init_and_logits(model, batch, "finetune")
    num_classes = next(
        hs.num_classes for hs in model.head_specs
        if hs.type_target == "segment"
    )
    assert logits["pastis_seg"].shape == (2, 1, num_classes, 16, 16)
    assert np.isfinite(np.asarray(logits["pastis_seg"])).all()

    metric_states = {
        hs.name: M.metric_init(hs.type_target, hs.num_classes)
        for hs in model.head_specs
    }
    for phase, opt in (
        ("probe", OptProbeConfig(batch_size=2)),
        ("finetune", OptFinetuneConfig(batch_size=2)),
    ):
        tx = make_optimizer(opt, phase, total_steps=4, params=params,
                            num_devices=1)
        state = TrainState.create(params, tx)
        step = make_supervised_step(model, phase, tx, donate=False)
        state, _, logs = step(state, batch, dict(metric_states))
        loss = float(logs["loss_pred"])
        assert np.isfinite(loss), f"{name} {phase}: non-finite loss {loss}"


FLAIR_CASES = [
    ("dinov2", BaselineConfig(model="dinov2", model_size="micro",
                              fusion_mode="shared")),
    ("dofa", BaselineConfig(model="dofa", model_size="micro",
                            fusion_mode="shared")),
    ("croma-inter", BaselineConfig(model="croma", model_size="micro",
                                   fusion_mode="inter-croma")),
]


def _flair_for(model: str) -> DatasetsConfig:
    ds = DatasetsConfig(name_dataset="flair")
    fl = ds.flair
    # drop DEM (2-band elevation has no DOFA wavelengths / DINOv2 RGB prior,
    # and full-res 512 px dem dominates CPU time); keep the seg ref modality
    fl.filter_inputs = ["aerial", "spot", "s2", "s1_asc", "s1_des"]
    if model == "dinov2":
        fl.aerial.image_size = 448  # patch 14 -> grid 32, 512 % 32 == 0
        fl.spot.image_size = 56
        for m in ("s2", "s1_asc", "s1_des"):
            getattr(fl, m).image_size = 28
    elif model == "dofa":
        # no spot: the (reference's) DOFA wavelength table has 3 entries for
        # spot while FLAIR spot carries 4 bands (reference dofa.py:114-131 vs
        # conf/dataset/flair.py:64-71) — DOFA on FLAIR runs without it
        fl.filter_inputs = ["aerial", "s2", "s1_asc", "s1_des"]
        fl.aerial.image_size = 256  # patch 16 -> grid 16, 512 % 16 == 0
        for m in ("s2", "s1_asc", "s1_des"):
            getattr(fl, m).image_size = 32
    elif model == "croma":
        # CROMA encodes S1/S2 only; aerial stays the seg ref grid
        fl.aerial.image_size = 128  # patch 8 -> ref grid 16
        for m in ("s2", "s1_asc", "s1_des"):
            getattr(fl, m).image_size = 16
    fl.__post_init__()
    return ds


@pytest.mark.parametrize("name,cfg", FLAIR_CASES,
                         ids=[c[0] for c in FLAIR_CASES])
def test_flair_segmentation_forward(name, cfg):
    """Finetune + probe forward on FLAIR: seg logits on the aerial ref grid
    at the 512-px COSIA target size, finite everywhere."""
    ds = _flair_for(cfg.model)
    model = build_baseline(ds, cfg, dtype=jnp.float32)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(ds.dataset, 1).items()
    }
    for phase in ("finetune", "probe"):
        _, logits = _init_and_logits(model, batch, phase)
        num_classes = next(
            hs.num_classes for hs in model.head_specs
            if hs.type_target == "segment"
        )
        assert logits["cosia"].shape == (1, 1, num_classes, 512, 512)
        assert np.isfinite(np.asarray(logits["cosia"])).all()
