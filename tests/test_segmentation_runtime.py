"""Segmentation through the runtime: PASTIS-HD micro probe with mIoU metrics."""

import numpy as np
import pytest

from maestro_tpu.conf import (
    DataConfig,
    DatasetsConfig,
    MaskConfig,
    ModelConfig,
    OptProbeConfig,
    ExperimentConfig,
    RunConfig,
    TrainerConfig,
)
from maestro_tpu.data.datasets import PASTISHDDataset
from maestro_tpu.data.loader import EOBatchLoader
from maestro_tpu.train.runtime import Experiment
from tests.fixtures import write_pastis_fixture


class Subset:
    def __init__(self, ds, n):
        self.ds, self.n = ds, n

    def __getitem__(self, i):
        return self.ds[i % self.n]

    def __len__(self):
        return self.n


@pytest.fixture(scope="module")
def pastis_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pastis_rt")
    write_pastis_fixture(root, num_tiles=1)
    return root


def test_pastis_probe_with_segmentation(pastis_root, tmp_path):
    datasets = DatasetsConfig(root_dir=str(pastis_root), name_dataset="pastis_hd")
    cfg = ExperimentConfig(
        run=RunConfig(exp_dir=str(tmp_path), exp_name="pastis", seed=0,
                      logged_images_per_epoch=1),
        opt_probe=OptProbeConfig(epochs=1, batch_size=2),
        data=DataConfig(num_workers=2),
        mask=MaskConfig(),
        model=ModelConfig(model_size="micro", fusion_mode="group",
                          inter_depth=1, use_ema=False),
        trainer=TrainerConfig(mesh_data=1, compute_dtype="float32"),
    )
    exp = Experiment(cfg, datasets, tmp_path / "work")

    ds = PASTISHDDataset(datasets.dataset, pastis_root, "train",
                         ssl_phase="probe")
    loader = EOBatchLoader(Subset(ds, 4), batch_size=2, num_workers=2, seed=0)
    result = exp.fit_phase("probe", cfg.opt_probe, loader, loader, None)

    m = result.val_metrics
    assert "pastis_seg/average_iou" in m
    assert 0.0 <= m["pastis_seg/average_iou"] <= 1.0
    assert 0.0 <= m["pastis_seg/overall_accuracy"] <= 1.0
    assert np.isfinite(m["loss_pred"])
    # segmentation overlays logged without error (writer may be a no-op)
    assert result.epochs_run == 1
