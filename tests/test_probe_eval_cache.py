"""Probe val feature cache (train/eval_cache.py).

The probe trunk is frozen and val loaders are epoch-deterministic, so val
trunk features are computed once and later val epochs run head-only.  These
tests assert (a) later epochs really skip the loader and the trunk, and
(b) the cached run's val metrics match an uncached run epoch for epoch —
including through the chunked segmentation head.
"""

import numpy as np
import pytest

from maestro_tpu.conf import (
    DataConfig,
    DatasetsConfig,
    ExperimentConfig,
    MaskConfig,
    ModelConfig,
    OptProbeConfig,
    RunConfig,
    TrainerConfig,
)
from maestro_tpu.data.datasets import PASTISHDDataset, TreeSatAITSDataset
from maestro_tpu.data.loader import EOBatchLoader
from maestro_tpu.train.runtime import Experiment
from tests.fixtures import write_pastis_fixture, write_treesat_fixture


class Subset:
    """Fixed-length view that wraps around the underlying dataset."""

    def __init__(self, ds, n):
        self.ds, self.n = ds, n

    def __getitem__(self, i):
        return self.ds[i % len(self.ds)]

    def __len__(self):
        return self.n


class CountingLoader:
    """Delegating wrapper that counts full iterations of the val loader."""

    def __init__(self, loader):
        self.loader = loader
        self.iterations = 0

    def __iter__(self):
        self.iterations += 1
        return iter(self.loader)

    def __len__(self):
        return len(self.loader)


@pytest.fixture(scope="module")
def treesat_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("treesat_cache")
    write_treesat_fixture(root, num_tiles=2)
    return root


@pytest.fixture(scope="module")
def pastis_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pastis_cache")
    write_pastis_fixture(root, num_tiles=1)
    return root


def _assert_metric_close(key, actual, desired):
    """Cached vs uncached parity, tolerance-tiered by metric kind.

    The split (features -> heads) jit boundary reassociates the big eval
    reductions, so losses/logits differ ~1e-4 relative in fp32.  AP is a
    4096-bin histogram: on the tiny fixtures a single logit landing one bin
    over moves AP by ~0.03, so AP keys get an absolute band while everything
    else stays tight.
    """
    if key.rsplit("/", 1)[-1].endswith("_ap"):
        np.testing.assert_allclose(actual, desired, atol=0.05, err_msg=key)
    else:
        np.testing.assert_allclose(
            actual, desired, rtol=1e-3, atol=1e-5, err_msg=key,
        )


def _probe_cfg(tmp_path, name, *, cache: bool, epochs: int = 3):
    return ExperimentConfig(
        run=RunConfig(exp_dir=str(tmp_path), exp_name=name, seed=0,
                      logged_images_per_epoch=0),
        opt_probe=OptProbeConfig(epochs=epochs, batch_size=2),
        data=DataConfig(num_workers=2),
        mask=MaskConfig(),
        model=ModelConfig(model_size="micro", fusion_mode="group",
                          inter_depth=1, use_ema=False),
        trainer=TrainerConfig(mesh_data=1, compute_dtype="float32",
                              probe_eval_cache=cache),
    )


def _run_probe(root, tmp_path, name, dataset_cls, ds_name, *, cache,
               epochs=3):
    datasets = DatasetsConfig(root_dir=str(root), name_dataset=ds_name)
    if ds_name == "treesatai_ts":
        datasets.treesatai_ts.rel_dir = ""
    cfg = _probe_cfg(tmp_path, name, cache=cache, epochs=epochs)
    exp = Experiment(cfg, datasets, tmp_path / name)
    ds = dataset_cls(datasets.dataset, root, "train", ssl_phase="probe")
    train = EOBatchLoader(Subset(ds, 4), batch_size=2, num_workers=2, seed=0)
    val = CountingLoader(
        EOBatchLoader(Subset(ds, 4), batch_size=2, num_workers=2, seed=0),
    )
    result = exp.fit_phase("probe", cfg.opt_probe, train, val, None)
    return result, val, exp._last_eval_cache


def _baseline_setup(treesat_root, tmp_path, name, *, cache, epochs=2,
                    use_ema=False, freeze=False):
    """dinov2-micro Experiment + fixture loaders shared by the baseline tests."""
    from maestro_tpu.conf import ModelConfig

    datasets = DatasetsConfig(root_dir=str(treesat_root),
                              name_dataset="treesatai_ts")
    ds = datasets.treesatai_ts
    ds.rel_dir = ""
    for m in ("s2", "s1_asc", "s1_des"):
        getattr(ds, m).image_size = 28
    ds.aerial.image_size = 224
    ds.__post_init__()
    cfg = _probe_cfg(tmp_path, name, cache=cache, epochs=epochs)
    cfg.model = ModelConfig(model="dinov2", model_size="micro",
                            fusion_mode="shared", use_ema=use_ema,
                            freeze=freeze)
    exp = Experiment(cfg, datasets, tmp_path / name)
    data = TreeSatAITSDataset(datasets.dataset, treesat_root, "train",
                              ssl_phase="finetune" if freeze else "probe")
    train = EOBatchLoader(Subset(data, 4), batch_size=2, num_workers=2,
                          seed=0)
    val = CountingLoader(
        EOBatchLoader(Subset(data, 4), batch_size=2, num_workers=2, seed=0),
    )
    return cfg, exp, train, val


def test_cache_skips_loader_and_matches_uncached(treesat_root, tmp_path):
    res_c, val_c, cache = _run_probe(
        treesat_root, tmp_path, "cached", TreeSatAITSDataset, "treesatai_ts",
        cache=True,
    )
    res_u, val_u, no_cache = _run_probe(
        treesat_root, tmp_path, "uncached", TreeSatAITSDataset,
        "treesatai_ts", cache=False,
    )

    assert no_cache is None
    assert cache is not None and cache.ready and not cache.disabled
    assert cache.hit_epochs == 2          # epochs 1..2 replayed head-only
    assert len(cache.entries) == len(val_c)
    # micro features fit far under the 2 GiB device budget: zero-copy tier
    assert all(e.on_device for e in cache.entries)
    assert cache.device_nbytes > 0
    assert val_c.iterations == 1          # loader touched on epoch 0 only
    assert val_u.iterations == 3

    # epoch-for-epoch val metric parity with the full-forward path
    for ec, eu in zip(res_c.history, res_u.history):
        for k, v in eu.items():
            if k.startswith("val/"):
                _assert_metric_close(k, ec[k], v)


def test_cache_through_chunked_seg_head(pastis_root, tmp_path):
    res_c, _, cache = _run_probe(
        pastis_root, tmp_path, "seg_cached", PASTISHDDataset, "pastis_hd",
        cache=True, epochs=2,
    )
    res_u, _, _ = _run_probe(
        pastis_root, tmp_path, "seg_uncached", PASTISHDDataset, "pastis_hd",
        cache=False, epochs=2,
    )
    assert cache is not None and cache.hit_epochs == 1
    assert np.isfinite(res_c.val_metrics["pastis_seg/average_iou"])
    for ec, eu in zip(res_c.history, res_u.history):
        for k, v in eu.items():
            if k.startswith("val/"):
                _assert_metric_close(k, ec[k], v)


def test_cache_on_baseline_adapter(treesat_root, tmp_path):
    """BaselineShell adapters share the encode/heads split: dinov2 probe."""

    def run(name, cache):
        cfg, exp, train, val = _baseline_setup(
            treesat_root, tmp_path, name, cache=cache,
        )
        result = exp.fit_phase("probe", cfg.opt_probe, train, val, None)
        return result, val, exp._last_eval_cache

    res_c, val_c, cache = run("dino_cached", True)
    res_u, val_u, _ = run("dino_uncached", False)
    assert cache is not None and cache.ready and cache.hit_epochs == 1
    assert val_c.iterations == 1 and val_u.iterations == 2
    for ec, eu in zip(res_c.history, res_u.history):
        for k, v in eu.items():
            if k.startswith("val/"):
                _assert_metric_close(k, ec[k], v)


def test_cache_on_frozen_baseline_finetune(treesat_root, tmp_path):
    """freeze=True baseline finetune: trunk frozen, EMA head eval, cached."""
    from maestro_tpu.conf import OptFinetuneConfig

    def run(name, cache):
        _, exp, train, val = _baseline_setup(
            treesat_root, tmp_path, name, cache=cache, use_ema=True,
            freeze=True,
        )
        result = exp.fit_phase(
            "finetune", OptFinetuneConfig(epochs=2, batch_size=2),
            train, val, None,
        )
        return result, val, exp._last_eval_cache

    res_c, val_c, cache = run("frozen_cached", True)
    res_u, val_u, _ = run("frozen_uncached", False)
    assert cache is not None and cache.ready and cache.hit_epochs == 1
    assert val_c.iterations == 1 and val_u.iterations == 2
    for ec, eu in zip(res_c.history, res_u.history):
        for k, v in eu.items():
            if k.startswith("val/"):
                _assert_metric_close(k, ec[k], v)


def test_host_spill_tier(treesat_root, tmp_path):
    """device budget 0 forces the host tier; replay still skips the loader."""
    datasets = DatasetsConfig(root_dir=str(treesat_root),
                              name_dataset="treesatai_ts")
    datasets.treesatai_ts.rel_dir = ""
    cfg = _probe_cfg(tmp_path, "spill", cache=True, epochs=2)
    cfg.trainer.probe_eval_cache_device_gb = 0.0
    exp = Experiment(cfg, datasets, tmp_path / "spill")
    ds = TreeSatAITSDataset(datasets.dataset, treesat_root, "train",
                            ssl_phase="probe")
    train = EOBatchLoader(Subset(ds, 4), batch_size=2, num_workers=2, seed=0)
    val = CountingLoader(
        EOBatchLoader(Subset(ds, 4), batch_size=2, num_workers=2, seed=0),
    )
    result = exp.fit_phase("probe", cfg.opt_probe, train, val, None)

    cache = exp._last_eval_cache
    assert cache is not None and cache.ready and cache.hit_epochs == 1
    assert cache.entries and all(not e.on_device for e in cache.entries)
    assert cache.device_nbytes == 0
    assert val.iterations == 1
    assert all(np.isfinite(v) for v in result.val_metrics.values())


def test_no_cache_when_trunk_trains(treesat_root, tmp_path):
    """MAE finetune updates the trunk every step: the gate must stay off."""
    from maestro_tpu.conf import OptFinetuneConfig

    datasets = DatasetsConfig(root_dir=str(treesat_root),
                              name_dataset="treesatai_ts")
    datasets.treesatai_ts.rel_dir = ""
    cfg = _probe_cfg(tmp_path, "ft_nocache", cache=True, epochs=2)
    exp = Experiment(cfg, datasets, tmp_path / "ft_nocache")
    ds = TreeSatAITSDataset(datasets.dataset, treesat_root, "train",
                            ssl_phase="finetune")
    train = EOBatchLoader(Subset(ds, 4), batch_size=2, num_workers=2, seed=0)
    val = CountingLoader(
        EOBatchLoader(Subset(ds, 4), batch_size=2, num_workers=2, seed=0),
    )
    exp.fit_phase("finetune", OptFinetuneConfig(epochs=2, batch_size=2),
                  train, val, None)
    assert exp._last_eval_cache is None
    assert val.iterations == 2


def test_cache_cap_disables_and_falls_back(treesat_root, tmp_path):
    datasets = DatasetsConfig(root_dir=str(treesat_root),
                              name_dataset="treesatai_ts")
    datasets.treesatai_ts.rel_dir = ""
    cfg = _probe_cfg(tmp_path, "capped", cache=True, epochs=2)
    cfg.trainer.probe_eval_cache_gb = 1e-9  # cap below one batch
    exp = Experiment(cfg, datasets, tmp_path / "capped")
    ds = TreeSatAITSDataset(datasets.dataset, treesat_root, "train",
                            ssl_phase="probe")
    train = EOBatchLoader(Subset(ds, 4), batch_size=2, num_workers=2, seed=0)
    val = CountingLoader(
        EOBatchLoader(Subset(ds, 4), batch_size=2, num_workers=2, seed=0),
    )
    result = exp.fit_phase("probe", cfg.opt_probe, train, val, None)

    cache = exp._last_eval_cache
    assert cache is not None and cache.disabled and not cache.ready
    assert not cache.entries
    assert val.iterations == 2            # fell back to per-epoch eval
    assert result.val_metrics             # run completed regardless
