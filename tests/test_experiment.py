"""Minimum end-to-end slice: pretrain -> probe -> finetune on fixture tiles
(TreeSatAI-TS, fusion_mode=group, MAE tiny, CPU) — SURVEY.md section 7 step 5."""

import numpy as np
import pytest

from maestro_tpu.conf import (
    DataConfig,
    DatasetsConfig,
    ExperimentConfig,
    MaskConfig,
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
    root = tmp_path_factory.mktemp("treesat_e2e")
    write_treesat_fixture(root, num_tiles=2)
    return root


def test_full_experiment_all_phases(treesat_root, tmp_path):
    datasets = DatasetsConfig(root_dir=str(treesat_root), name_dataset="treesatai_ts")
    datasets.treesatai_ts.rel_dir = ""
    cfg = ExperimentConfig(
        run=RunConfig(exp_dir=str(tmp_path), exp_name="e2e", seed=0),
        opt_pretrain=OptPretrainConfig(epochs=1, batch_size=2),
        opt_probe=OptProbeConfig(epochs=1, batch_size=2),
        opt_finetune=OptFinetuneConfig(
            epochs=2, batch_size=2,
            monitor="treesat_mlc_thresh/weighted_f1_val", patience=5,
        ),
        data=DataConfig(num_workers=2, use_transform=True, random_dates=True),
        mask=MaskConfig(),
        model=ModelConfig(
            model_size="micro", fusion_mode="group", inter_depth=1, use_ema=True,
        ),
        trainer=TrainerConfig(mesh_data=1, mesh_model=1,
                              compute_dtype="float32"),
    )
    results = run_experiment(cfg, datasets, tmp_path / "work")

    assert set(results) == {"pretrain", "probe", "finetune"}
    assert np.isfinite(results["pretrain"].history[0]["train/loss_rec"])
    assert "treesat_mlc_thresh/weighted_f1" in results["probe"].val_metrics
    assert results["finetune"].test_metrics  # tested on best checkpoint
    wf1 = results["finetune"].test_metrics["treesat_mlc_thresh/weighted_f1"]
    assert 0.0 <= wf1 <= 1.0

    # checkpoints on disk for every phase, discoverable by the glob convention
    from maestro_tpu.train.checkpoint import find_latest_checkpoint

    for phase in ("pretrain", "probe", "finetune"):
        path = find_latest_checkpoint(tmp_path / "work" / "checkpoints", phase)
        assert path is not None, phase

    # observability wiring: LR logged per epoch, CM dumps + metrics.jsonl
    for res in results.values():
        assert all("lr" in e and np.isfinite(e["lr"]) for e in res.history)
    cm_files = list((tmp_path / "work" / "cm").glob("*.npy"))
    assert cm_files, "no confusion-matrix dumps written"
    assert (tmp_path / "work" / "metrics.jsonl").exists()

    # warm start a new probe experiment by NAME (reference pre_call_resolve):
    # checkpoints of the first run live under exp_dir/work/checkpoints
    cfg2 = ExperimentConfig(
        run=RunConfig(exp_dir=str(tmp_path), exp_name="e2e_transfer", seed=0,
                      load_name="work", load_phase="pretrain"),
        opt_pretrain=OptPretrainConfig(epochs=0),
        opt_probe=OptProbeConfig(epochs=1, batch_size=2),
        opt_finetune=OptFinetuneConfig(epochs=0),
        data=DataConfig(num_workers=2),
        mask=MaskConfig(),
        model=ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1),
        trainer=TrainerConfig(mesh_data=1, mesh_model=1,
                              compute_dtype="float32"),
    )
    datasets2 = DatasetsConfig(root_dir=str(treesat_root),
                               name_dataset="treesatai_ts")
    datasets2.treesatai_ts.rel_dir = ""
    results2 = run_experiment(cfg2, datasets2, tmp_path / "work2")
    assert cfg2.run.load_ckpt_path is not None  # name resolved to a path
    assert "treesat_mlc_thresh/weighted_f1" in results2["probe"].val_metrics

    # eval-only: score the probe checkpoint of run 1 without training
    cfg3 = ExperimentConfig(
        run=RunConfig(exp_dir=str(tmp_path), exp_name="evalonly", seed=0,
                      load_name="work", load_phase="probe", eval_only=True,
                      logged_images_per_epoch=0),
        opt_pretrain=OptPretrainConfig(epochs=0),
        opt_probe=OptProbeConfig(epochs=1, batch_size=2),  # selects the phase
        opt_finetune=OptFinetuneConfig(epochs=0),
        data=DataConfig(num_workers=2),
        mask=MaskConfig(),
        model=ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1),
        trainer=TrainerConfig(mesh_data=1, compute_dtype="float32"),
    )
    results3 = run_experiment(cfg3, datasets2, tmp_path / "work3")
    r3 = results3["probe"]
    assert r3.epochs_run == 0 and not r3.history  # nothing trained
    assert "treesat_mlc_thresh/weighted_f1" in r3.test_metrics
    # loaded probe weights must score like run 1's final probe val epoch
    assert np.isfinite(r3.test_metrics["treesat_mlc_thresh/weighted_f1"])


def test_steps_per_dispatch_scanned_epoch(tmp_path, tmp_path_factory):
    """trainer.steps_per_dispatch>1 drives the epoch through lax.scan."""
    root = tmp_path_factory.mktemp("treesat_scan")
    write_treesat_fixture(root, num_tiles=4)
    datasets = DatasetsConfig(root_dir=str(root), name_dataset="treesatai_ts")
    datasets.treesatai_ts.rel_dir = ""
    cfg = ExperimentConfig(
        run=RunConfig(exp_dir=str(tmp_path), exp_name="scan", seed=0,
                      logged_images_per_epoch=0),
        opt_pretrain=OptPretrainConfig(epochs=1, batch_size=2),
        opt_probe=OptProbeConfig(epochs=0),
        opt_finetune=OptFinetuneConfig(epochs=0),
        data=DataConfig(num_workers=2),
        model=ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1),
        trainer=TrainerConfig(mesh_data=1, compute_dtype="float32",
                              steps_per_dispatch=2),
    )
    results = run_experiment(cfg, datasets, tmp_path / "work")
    hist = results["pretrain"].history[0]
    assert np.isfinite(hist["train/loss_rec"])


def test_same_seed_reproduces_losses(tmp_path, tmp_path_factory):
    """Two runs with the same seed produce identical loss trajectories
    (explicit PRNG keys + deterministic (seed, epoch) loader order; the
    reference needs seed_everything(workers=True) for the same guarantee)."""
    root = tmp_path_factory.mktemp("treesat_det")
    write_treesat_fixture(root, num_tiles=4)
    datasets = DatasetsConfig(root_dir=str(root), name_dataset="treesatai_ts")
    datasets.treesatai_ts.rel_dir = ""

    def run(tag):
        cfg = ExperimentConfig(
            run=RunConfig(exp_dir=str(tmp_path), exp_name=tag, seed=7,
                          logged_images_per_epoch=0),
            opt_pretrain=OptPretrainConfig(epochs=1, batch_size=2),
            opt_probe=OptProbeConfig(epochs=0),
            opt_finetune=OptFinetuneConfig(epochs=0),
            data=DataConfig(num_workers=2),
            model=ModelConfig(model_size="micro", fusion_mode="group",
                              inter_depth=1),
            trainer=TrainerConfig(mesh_data=1, compute_dtype="float32"),
        )
        results = run_experiment(cfg, datasets, tmp_path / tag)
        return results["pretrain"].history[0]

    a, b = run("det_a"), run("det_b")
    assert a["train/loss_rec"] == b["train/loss_rec"]
    assert a["val/loss_rec"] == b["val/loss_rec"]
