"""Baseline FM adapter tests: construction + forward on synthetic batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maestro_tpu.conf import BaselineConfig, DatasetsConfig
from maestro_tpu.baselines import build_baseline
from maestro_tpu.utils.testing import make_synthetic_batch


def _treesat_for(model: str) -> DatasetsConfig:
    ds = DatasetsConfig(name_dataset="treesatai_ts")
    if model in ("dinov2", "dofa"):
        # coarse modalities need image_size >= FM patch
        for m in ("s2", "s1_asc", "s1_des"):
            getattr(ds.treesatai_ts, m).image_size = 32
        ds.treesatai_ts.aerial.image_size = 224
    if model == "croma":
        for m in ("s2", "s1_asc", "s1_des"):
            getattr(ds.treesatai_ts, m).image_size = 24
    if model in ("satmae", "prithvi"):
        ds.treesatai_ts.filter_inputs = ["s2"]
        ds.treesatai_ts.s2.image_size = 32
        ds.treesatai_ts.__post_init__()
    return ds


def _run(model_name: str, cfg: BaselineConfig, batch_size: int = 2):
    ds = _treesat_for(model_name)
    model = build_baseline(ds, cfg, dtype=jnp.float32)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(ds.dataset, batch_size).items()
    }
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda b: model.init({"params": key}, b, "finetune"))(batch)
    logits = jax.jit(lambda p, b: model.apply(p, b, "finetune"))(params, batch)
    return logits


@pytest.mark.parametrize("fusion_mode", ["shared", "monotemp"])
def test_dinov2(fusion_mode):
    cfg = BaselineConfig(model="dinov2", model_size="micro",
                         fusion_mode=fusion_mode)
    logits = _run("dinov2", cfg)
    assert logits["treesat_mlc_thresh"].shape == (2, 15)
    assert np.isfinite(np.asarray(logits["treesat_mlc_thresh"])).all()


def test_dofa():
    cfg = BaselineConfig(model="dofa", model_size="micro", fusion_mode="shared")
    logits = _run("dofa", cfg)
    assert logits["treesat_mlc_thresh"].shape == (2, 15)
    assert np.isfinite(np.asarray(logits["treesat_mlc_thresh"])).all()


@pytest.mark.parametrize("fusion_mode", ["late-croma", "inter-croma"])
def test_croma(fusion_mode):
    cfg = BaselineConfig(model="croma", model_size="micro",
                         fusion_mode=fusion_mode)
    logits = _run("croma", cfg)
    assert logits["treesat_mlc_thresh"].shape == (2, 15)
    assert np.isfinite(np.asarray(logits["treesat_mlc_thresh"])).all()


def test_satmae():
    cfg = BaselineConfig(model="satmae", model_size="micro", fusion_mode="mod")
    logits = _run("satmae", cfg)
    assert logits["treesat_mlc_thresh"].shape == (2, 15)


def test_prithvi():
    cfg = BaselineConfig(model="prithvi", model_size="large", fusion_mode="mod",
                         add_date_enc=True, version="v2")
    logits = _run("prithvi", cfg)
    assert logits["treesat_mlc_thresh"].shape == (2, 15)


def test_satmae_rejects_multimodal():
    ds = DatasetsConfig(name_dataset="treesatai_ts")
    cfg = BaselineConfig(model="satmae", fusion_mode="mod")
    with pytest.raises(ValueError, match="S2"):
        build_baseline(ds, cfg)


def test_unknown_baseline():
    ds = DatasetsConfig(name_dataset="treesatai_ts")
    with pytest.raises(ValueError, match="Unknown baseline"):
        build_baseline(ds, BaselineConfig(model="clip"))
