"""Baseline adapters through the full training runtime (probe + finetune)."""

import numpy as np
import pytest

from maestro_tpu.conf import (
    DataConfig,
    DatasetsConfig,
    ExperimentConfig,
    ModelConfig,
    OptFinetuneConfig,
    OptPretrainConfig,
    OptProbeConfig,
    RunConfig,
    TrainerConfig,
)
from maestro_tpu.train.runtime import run_experiment
from tests.fixtures import write_treesat_fixture


@pytest.fixture(scope="module")
def treesat_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("treesat_baseline")
    write_treesat_fixture(root, num_tiles=2)
    return root


def test_dinov2_probe_finetune(treesat_root, tmp_path):
    datasets = DatasetsConfig(root_dir=str(treesat_root), name_dataset="treesatai_ts")
    ds = datasets.treesatai_ts
    ds.rel_dir = ""
    for m in ("s2", "s1_asc", "s1_des"):
        getattr(ds, m).image_size = 28
    ds.aerial.image_size = 224
    ds.__post_init__()

    cfg = ExperimentConfig(
        run=RunConfig(exp_dir=str(tmp_path), exp_name="dinov2", seed=0),
        opt_pretrain=OptPretrainConfig(epochs=1, batch_size=2),  # skipped
        opt_probe=OptProbeConfig(epochs=1, batch_size=2),
        opt_finetune=OptFinetuneConfig(epochs=1, batch_size=2, lw_decay=0.75),
        data=DataConfig(num_workers=2),
        model=ModelConfig(
            model="dinov2", model_size="micro", fusion_mode="shared",
            use_ema=False,
        ),
        trainer=TrainerConfig(mesh_data=1, compute_dtype="float32"),
    )
    results = run_experiment(cfg, datasets, tmp_path / "work")
    assert "pretrain" not in results  # baselines skip pretraining
    assert set(results) == {"probe", "finetune"}
    wf1 = results["finetune"].val_metrics["treesat_mlc_thresh/weighted_f1"]
    assert 0.0 <= wf1 <= 1.0
    assert np.isfinite(results["probe"].val_metrics["loss_pred"])
