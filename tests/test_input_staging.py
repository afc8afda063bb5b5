"""Input staging dtype (trainer.input_dtype, runtime._device_batch).

"auto" stages float image streams in bf16 for supervised phases under a
bf16 compute policy (halves host->device transfer; the in-step cast moves
to the host) while pretrain keeps fp32 — its inputs double as the
patch-group-norm reconstruction targets.  Integer arrays are never cast.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from maestro_tpu.conf import (
    DatasetsConfig,
    ExperimentConfig,
    ModelConfig,
    OptProbeConfig,
    RunConfig,
    TrainerConfig,
)
from maestro_tpu.data.loader import EOBatchLoader
from maestro_tpu.train.runtime import Experiment
from maestro_tpu.utils.testing import make_synthetic_batch
from tests.fixtures import write_treesat_fixture


def _exp(tmp_path, **trainer_kw):
    datasets = DatasetsConfig(name_dataset="treesatai_ts")
    cfg = ExperimentConfig(
        run=RunConfig(exp_dir=str(tmp_path), exp_name="stage", seed=0),
        model=ModelConfig(model_size="micro", fusion_mode="group",
                          inter_depth=1, use_ema=False),
        trainer=TrainerConfig(mesh_data=1, **trainer_kw),
    )
    return Experiment(cfg, datasets, tmp_path / "work"), datasets


@pytest.mark.parametrize(
    ("input_dtype", "compute", "phase", "expect_bf16"),
    [
        ("auto", "bfloat16", "finetune", True),
        ("auto", "bfloat16", "probe", True),
        ("auto", "bfloat16", "pretrain", False),  # inputs are loss targets
        ("auto", "float32", "finetune", False),
        ("float32", "bfloat16", "finetune", False),
        ("bfloat16", "bfloat16", "pretrain", True),  # explicit forces it
    ],
)
def test_staging_dtype_matrix(tmp_path, input_dtype, compute, phase,
                              expect_bf16):
    exp, datasets = _exp(tmp_path, compute_dtype=compute,
                         input_dtype=input_dtype)
    exp._staging_phase = phase
    batch = make_synthetic_batch(datasets.dataset, 2)
    out = exp._device_batch(batch)
    want = jnp.bfloat16 if expect_bf16 else jnp.float32
    floats = ints = 0
    for k, v in batch.items():
        if np.asarray(v).dtype == np.float32:
            floats += 1
            assert out[k].dtype == want, k
        else:
            ints += 1
            assert out[k].dtype == np.asarray(v).dtype, k
    assert floats > 0 and ints > 0  # the matrix exercised both kinds


def test_bf16_staged_probe_trains_finite(tmp_path, tmp_path_factory):
    """End to end: a bf16-compute probe epoch off bf16-staged inputs yields
    finite losses/metrics (the dtype reaches the jitted step intact)."""
    root = tmp_path_factory.mktemp("treesat_stage")
    write_treesat_fixture(root, num_tiles=4)
    datasets = DatasetsConfig(root_dir=str(root), name_dataset="treesatai_ts")
    datasets.treesatai_ts.rel_dir = ""
    cfg = ExperimentConfig(
        run=RunConfig(exp_dir=str(tmp_path), exp_name="bf16probe", seed=0),
        opt_probe=OptProbeConfig(epochs=1, batch_size=2),
        model=ModelConfig(model_size="micro", fusion_mode="group",
                          inter_depth=1, use_ema=False),
        trainer=TrainerConfig(mesh_data=1, compute_dtype="bfloat16",
                              input_dtype="auto"),
    )
    exp = Experiment(cfg, datasets, tmp_path / "bf16probe")
    from maestro_tpu.data.datasets import TreeSatAITSDataset

    ds = TreeSatAITSDataset(datasets.dataset, root, "train",
                            ssl_phase="probe")
    train = EOBatchLoader(ds, batch_size=2, num_workers=2, seed=0)
    val = EOBatchLoader(ds, batch_size=2, num_workers=2, seed=0)
    result = exp.fit_phase("probe", cfg.opt_probe, train, val, None)
    assert result.history
    assert all(
        np.isfinite(v) for v in result.val_metrics.values()
    ), result.val_metrics
