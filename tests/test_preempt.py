"""Graceful preemption: SIGTERM mid-epoch -> checkpoint -> named resume.

Beyond-reference robustness (SURVEY.md section 5.3: the reference has no
failure recovery): TPU maintenance events deliver SIGTERM with a grace
window; the runtime must persist full state and exit so run.fit_name /
fit_phase can resume. Also covers the resume epoch offset: a completed-epoch
checkpoint restarts at the NEXT epoch, an interrupted one finishes its epoch
by fast-forwarding the loader past the batches already trained (the
checkpoint meta records batches_done; per-epoch order is deterministic).
"""

import os
import signal

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
from maestro_tpu.data.loader import make_loader
from maestro_tpu.train import preempt
from maestro_tpu.train.checkpoint import find_latest_checkpoint, load_meta
from maestro_tpu.train.runtime import Experiment
from tests.fixtures import write_treesat_fixture


@pytest.fixture(scope="module")
def treesat(tmp_path_factory):
    root = tmp_path_factory.mktemp("treesat_preempt")
    write_treesat_fixture(root, num_tiles=4)
    datasets = DatasetsConfig(root_dir=str(root), name_dataset="treesatai_ts")
    datasets.treesatai_ts.rel_dir = ""
    return datasets


def _cfg(tmp_path, epochs):
    return ExperimentConfig(
        run=RunConfig(exp_dir=str(tmp_path), exp_name="pre", seed=0,
                      logged_images_per_epoch=0),
        opt_pretrain=OptPretrainConfig(epochs=epochs, batch_size=2),
        opt_probe=OptProbeConfig(epochs=0),
        opt_finetune=OptFinetuneConfig(epochs=0),
        data=DataConfig(num_workers=2),
        mask=MaskConfig(),
        model=ModelConfig(model_size="micro", fusion_mode="group",
                          inter_depth=1),
        trainer=TrainerConfig(mesh_data=1, mesh_model=1,
                              compute_dtype="float32"),
    )


class _SigtermAfter:
    """Wrap a loader; deliver a real SIGTERM after n batches are consumed."""

    def __init__(self, loader, n: int) -> None:
        self._loader, self._n = loader, n

    def __len__(self) -> int:
        return len(self._loader)

    def __iter__(self):
        for i, batch in enumerate(self._loader):
            yield batch
            if i + 1 == self._n:
                os.kill(os.getpid(), signal.SIGTERM)


def _train_loader(datasets, cfg):
    _, loader = make_loader(datasets, cfg.data, "train", "pretrain", 2, seed=0)
    return loader


def test_sigterm_checkpoints_then_resume_finishes_epoch(tmp_path, treesat):
    preempt.reset()
    preempt.install_handlers()
    cfg = _cfg(tmp_path, epochs=2)
    exp = Experiment(cfg, treesat, tmp_path / "work")
    loader = _SigtermAfter(_train_loader(treesat, cfg), n=1)
    with pytest.raises(preempt.Preempted):
        exp.fit_phase("pretrain", cfg.opt_pretrain, loader)

    path = find_latest_checkpoint(tmp_path / "work" / "checkpoints", "pretrain")
    assert path is not None
    meta = load_meta(path)
    assert meta.get("interrupted") is True
    assert int(meta["epoch"]) == 0
    assert int(meta["batches_done"]) == 1  # one batch trained before SIGTERM

    # resume: epoch 0 finishes from batch 1, then epoch 1 completes
    preempt.reset()
    exp2 = Experiment(cfg, treesat, tmp_path / "work")
    res = exp2.fit_phase(
        "pretrain", cfg.opt_pretrain, _train_loader(treesat, cfg),
        resume_path=str(path),
    )
    assert res.epochs_run == 2
    assert [e["epoch"] for e in res.history] == [0, 1]
    assert all(np.isfinite(e["train/loss_rec"]) for e in res.history)


def test_resume_skips_completed_epochs(tmp_path, treesat):
    preempt.reset()
    cfg = _cfg(tmp_path, epochs=1)
    exp = Experiment(cfg, treesat, tmp_path / "w1")
    exp.fit_phase("pretrain", cfg.opt_pretrain, _train_loader(treesat, cfg))
    path = find_latest_checkpoint(tmp_path / "w1" / "checkpoints", "pretrain")
    assert path is not None
    assert load_meta(path).get("interrupted") is None

    # extend the run to 2 epochs and resume: only epoch 1 remains
    cfg2 = _cfg(tmp_path, epochs=2)
    exp2 = Experiment(cfg2, treesat, tmp_path / "w1")
    res = exp2.fit_phase(
        "pretrain", cfg2.opt_pretrain, _train_loader(treesat, cfg2),
        resume_path=str(path),
    )
    assert res.epochs_run == 1
    assert [e["epoch"] for e in res.history] == [1]


def test_loader_epoch_determinism_and_skip(treesat):
    """Per-epoch order is a pure function of (seed, epoch); skip_batches
    fast-forwards without changing the remaining order."""
    from maestro_tpu.conf import DataConfig

    def fresh():
        data_cfg = DataConfig(num_workers=1)
        _, loader = make_loader(
            treesat, data_cfg, "train", "pretrain", 2, seed=0,
        )
        return loader

    a, b = fresh(), fresh()
    a.set_epoch(3)
    b.set_epoch(3)
    batches_a = [bt for bt in a]
    batches_b = [bt for bt in b]
    # every stream matches: samples are pure functions of (seed, epoch, idx)
    for x, y in zip(batches_a, batches_b):
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])

    c = fresh()
    c.set_epoch(3)
    c.skip_batches = 1
    skipped = [bt for bt in c]
    assert len(skipped) == len(batches_a) - 1
    for k in skipped[0]:
        np.testing.assert_array_equal(skipped[0][k], batches_a[1][k])
    # skip consumed: the next pass over the same epoch is full again
    assert len([bt for bt in c]) == len(batches_a)
