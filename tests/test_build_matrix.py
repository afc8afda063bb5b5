"""Shape-level smoke matrix: every (dataset, fusion_mode, phase) builds.

The reference exercises this matrix operationally through its experiment
configs (README.md:163-213); here ``jax.eval_shape`` traces init + forward
for each combination without any FLOPs, so latent static-shape bugs in the
FusionPlan/token-layout compiler surface in seconds.  ``group`` additionally
traces with the shared inter-modality trunk (inter_depth, the flagship
config); per-phase logits must cover every declared head.
"""

import jax
import pytest

from maestro_tpu.conf import DatasetsConfig, MaskConfig, ModelConfig
from maestro_tpu.models.mae import build_model
from maestro_tpu.utils.testing import make_synthetic_batch

DATASETS = ["treesatai_ts", "pastis_hd", "flair", "s2_naip"]
FUSIONS = ["shared", "monotemp", "mod", "group"]


@pytest.mark.parametrize("name", DATASETS)
@pytest.mark.parametrize("fusion", FUSIONS)
def test_build_and_trace_all_phases(name, fusion):
    ds = DatasetsConfig(name_dataset=name)
    inter = 1 if fusion == "group" else 0
    cfg = ModelConfig(model_size="micro", fusion_mode=fusion,
                      inter_depth=inter)
    model, plan = build_model(ds, MaskConfig(), cfg)
    batch = {
        k: jax.numpy.asarray(v)
        for k, v in make_synthetic_batch(ds.dataset, 2).items()
    }
    key = jax.random.PRNGKey(0)

    phases = ["pretrain"]
    if ds.dataset.targets:  # S2-NAIP is pretrain-only
        # probe differs from finetune only by stop_gradient / trainability,
        # not by shapes -- tracing finetune covers both topologies
        phases += ["finetune"]
    for phase in phases:
        variables = jax.eval_shape(
            lambda b, _p=phase: model.init(
                {"params": key, "mask": key}, b, _p,
            ),
            batch,
        )
        out = jax.eval_shape(
            lambda v, b, _p=phase: model.apply(
                v, b, _p, rngs={"mask": key},
            ),
            variables, batch,
        )
        if phase == "pretrain":
            rec, mask, targets = out
            assert set(rec) == set(plan.mods)
        else:
            assert set(out) == {hs.name for hs in model.head_specs}
            for hs in model.head_specs:
                assert out[hs.name].shape[0] == 2
