"""Data pipeline tests on synthetic on-disk fixtures (reference test_data.py
pattern: iterate real reads through binning/transform, check shapes)."""

import time

import numpy as np
import pytest

from maestro_tpu.conf import DataConfig, DatasetsConfig
from maestro_tpu.data.datasets import (
    FLAIRDataset,
    PASTISHDDataset,
    S2NAIPDataset,
    TreeSatAITSDataset,
)
from maestro_tpu.data.loader import EOBatchLoader, make_loader
from tests.fixtures import (
    write_flair_fixture,
    write_pastis_fixture,
    write_s2naip_fixture,
    write_treesat_fixture,
)


@pytest.fixture(scope="session")
def treesat_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("treesat")
    write_treesat_fixture(root, num_tiles=3)
    return root


@pytest.fixture(scope="session")
def pastis_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pastis")
    write_pastis_fixture(root, num_tiles=1)
    return root


@pytest.fixture(scope="session")
def flair_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("flair")
    write_flair_fixture(root, num_tiles=1)
    return root


@pytest.mark.parametrize("use_transform,random_dates", [
    (False, False), (True, True),
])
def test_treesat_sample_shapes(treesat_root, datasets_treesat,
                               use_transform, random_dates):
    ds = TreeSatAITSDataset(
        datasets_treesat.dataset, treesat_root, "train",
        use_transform=use_transform, random_dates=random_dates,
        ssl_phase="finetune",
    )
    sample = ds[0]
    assert sample["aerial"].shape == (1, 4, 300, 300)
    assert sample["s2"].shape == (16, 10, 6, 6)
    assert sample["s1_asc"].shape == (4, 2, 6, 6)
    assert sample["s1_des"].shape == (4, 2, 6, 6)
    assert sample["s2_dates"].shape == (16, 3)
    assert sample["ref_date"].shape == (1, 3)
    assert sample["treesat_mlc_thresh"].shape == (15,)
    for mod in ("aerial", "s2", "s1_asc", "s1_des"):
        assert sample[mod].dtype == np.float32
        assert np.isfinite(sample[mod]).all(), mod
    # aerial normalized by 255, s1 log-scaled / 5
    assert sample["aerial"].max() <= 1.0


def test_treesat_pretrain_split_concats_val(treesat_root, datasets_treesat):
    ds_pre = TreeSatAITSDataset(
        datasets_treesat.dataset, treesat_root, "train", ssl_phase="pretrain",
    )
    ds_ft = TreeSatAITSDataset(
        datasets_treesat.dataset, treesat_root, "train", ssl_phase="finetune",
    )
    assert len(ds_pre) == 2 * len(ds_ft)  # val folded into pretrain


def test_pastis_sample_shapes(pastis_root, datasets_pastis):
    ds = PASTISHDDataset(
        datasets_pastis.dataset, pastis_root, "train",
        use_transform=True, random_dates=False, random_crop=False,
        ssl_phase="finetune",
    )
    assert len(ds) == 1 * 8 * 8  # repeats^2 crop grid
    sample = ds[0]
    assert sample["spot"].shape == (1, 3, 160, 160)
    assert sample["s2"].shape == (16, 10, 16, 16)
    assert sample["s1_asc"].shape == (4, 2, 16, 16)
    assert sample["pastis_seg"].shape == (1, 1, 16, 16)
    assert sample["pastis_mlc"].shape == (18,)
    # deterministic crop grid: different repeat index -> different crop origin
    s2_a = ds[0]["s2"]
    s2_b = ds[63]["s2"]
    assert not np.array_equal(s2_a, s2_b)


def test_flair_sample_shapes(flair_root, datasets_flair):
    ds = FLAIRDataset(
        datasets_flair.dataset, flair_root, "train",
        use_transform=False, ssl_phase="finetune",
    )
    sample = ds[0]
    assert sample["aerial"].shape == (1, 4, 512, 512)
    assert sample["dem"].shape == (1, 2, 512, 512)
    assert sample["s2"].shape == (16, 10, 10, 10)
    assert sample["s1_asc"].shape == (4, 2, 10, 10)
    assert sample["cosia"].shape == (1, 1, 512, 512)
    # ignore labels (15-18) remapped to missing_val -1
    assert not np.isin(sample["cosia"], (15, 16, 17, 18)).any()


@pytest.fixture(scope="session")
def s2naip_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("s2naip")
    write_s2naip_fixture(root, num_tiles=2)
    return root


def test_s2naip_sample_shapes(s2naip_root, datasets_s2naip):
    ds = S2NAIPDataset(
        datasets_s2naip.dataset, s2naip_root, "train",
        use_transform=True, random_dates=False, random_crop=False,
        ssl_phase="pretrain",
    )
    # pretrain-only dataset: val AND test folded into train, 5x5 crop grid
    assert len(ds) == (2 * 3) * 5 * 5
    sample = ds[0]
    assert sample["aerial"].shape == (1, 4, 96, 96)  # native crop, NIR-first
    assert sample["spot"].shape == (1, 3, 96, 96)
    assert sample["s2"].shape == (16, 10, 12, 12)
    assert sample["s1"].shape == (4, 2, 12, 12)
    assert sample["ref_date"].shape == (1, 3)
    for mod in ("aerial", "spot", "s2", "s1"):
        assert np.isfinite(sample[mod]).all(), mod


def test_batch_loader(treesat_root, datasets_treesat):
    ds = TreeSatAITSDataset(
        datasets_treesat.dataset, treesat_root, "train", ssl_phase="finetune",
    )
    loader = EOBatchLoader(ds, batch_size=2, num_workers=2, seed=1)
    batches = list(loader)
    assert len(batches) == 1  # 3 tiles, drop_last
    batch = batches[0]
    assert batch["aerial"].shape == (2, 1, 4, 300, 300)
    assert batch["ref_date"].shape == (2, 1, 3)


def test_make_loader_end_to_end(treesat_root, datasets_treesat):
    cfg = DatasetsConfig(
        root_dir=str(treesat_root), name_dataset="treesatai_ts",
    )
    cfg.treesatai_ts.rel_dir = ""
    dataset, loader = make_loader(
        cfg, DataConfig(num_workers=2), "val", "finetune", batch_size=2,
    )
    for batch in loader:
        assert batch["s2"].shape == (2, 16, 10, 6, 6)
        break


class _ExplodingDataset:
    def __len__(self):
        return 8

    def __getitem__(self, idx):
        if idx == 3:
            msg = "corrupt raster"
            raise OSError(msg)
        return {"x": np.full((2,), idx, np.float32)}


def test_loader_surfaces_worker_exception():
    """A decode error must raise in the consumer, not hang it on get()."""
    loader = EOBatchLoader(_ExplodingDataset(), batch_size=4, shuffle=False,
                           num_workers=2, seed=0)
    with pytest.raises(OSError, match="corrupt raster"):
        list(loader)


def test_loader_early_break_does_not_leak_producer():
    """Breaking mid-epoch must unblock a producer parked on the full queue."""
    import threading

    class _Slow:
        def __len__(self):
            return 64

        def __getitem__(self, idx):
            return {"x": np.zeros((4,), np.float32)}

    before = threading.active_count()
    for _ in range(5):
        loader = EOBatchLoader(_Slow(), batch_size=2, shuffle=False,
                               num_workers=2, prefetch=1, seed=0)
        for _batch in loader:
            break  # early exit with the prefetch queue full
    deadline = time.time() + 10
    while threading.active_count() > before + 2 and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before + 2
