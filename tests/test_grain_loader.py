"""Grain pipeline parity with the thread loader."""

import numpy as np
import pytest

from maestro_tpu.data.datasets import TreeSatAITSDataset
from tests.fixtures import write_treesat_fixture

grain = pytest.importorskip("grain")

from maestro_tpu.data.grain_loader import GrainBatchLoader  # noqa: E402


@pytest.fixture(scope="module")
def treesat_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("treesat_grain")
    write_treesat_fixture(root, num_tiles=4)
    return root


def test_grain_batches(treesat_root, datasets_treesat):
    ds = TreeSatAITSDataset(
        datasets_treesat.dataset, treesat_root, "train", ssl_phase="finetune",
    )
    loader = GrainBatchLoader(ds, batch_size=2, num_workers=0, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["aerial"].shape == (2, 1, 4, 300, 300)
    assert b["s2"].shape == (2, 16, 10, 6, 6)
    assert np.isfinite(b["aerial"]).all()


def test_grain_sharding(treesat_root, datasets_treesat):
    ds = TreeSatAITSDataset(
        datasets_treesat.dataset, treesat_root, "train", ssl_phase="finetune",
    )
    l0 = GrainBatchLoader(ds, batch_size=2, num_workers=0, shard_index=0,
                          shard_count=2, shuffle=False)
    assert len(l0) == 1
    assert len(list(l0)) == 1


def test_grain_threads_identical_partition(treesat_root, datasets_treesat):
    """Grain and threads loaders see the SAME sample stream for the same
    (seed, epoch, shard): global shuffle-then-stride in both, so data.loader
    is a pure performance choice (multi-host runs cannot desynchronize, and
    an interrupted run resumes the same order under either loader)."""
    from maestro_tpu.data.loader import EOBatchLoader

    ds = TreeSatAITSDataset(
        datasets_treesat.dataset, treesat_root, "train", ssl_phase="finetune",
        use_transform=False, random_dates=False, random_crop=False,
    )
    for shard in (0, 1):
        g = GrainBatchLoader(ds, batch_size=1, num_workers=0, seed=3,
                             shard_index=shard, shard_count=2)
        t = EOBatchLoader(ds, batch_size=1, num_workers=1, seed=3,
                          shard_index=shard, shard_count=2)
        g.set_epoch(7)
        t.set_epoch(7)
        gb, tb = list(g), list(t)
        assert len(gb) == len(tb) > 0
        for a, b in zip(gb, tb):
            np.testing.assert_array_equal(
                a["treesat_mlc_thresh"], b["treesat_mlc_thresh"],
            )
            np.testing.assert_array_equal(a["s2"], b["s2"])


def test_pin_loader_records_choice():
    """pin_loader resolves "auto" once and writes the concrete value back,
    so config_resolved.json / checkpoint meta never record "auto"."""
    from maestro_tpu.conf import DataConfig
    from maestro_tpu.data.loader import pin_loader, resolve_loader

    cfg = DataConfig(loader="auto", num_workers=2)
    choice = pin_loader(cfg)
    assert cfg.loader == choice != "auto"
    assert pin_loader(cfg) == choice  # idempotent once pinned

    cfg2 = DataConfig(loader="grain")
    assert pin_loader(cfg2) == "grain"  # explicit choice respected
    assert resolve_loader(cfg2) == "grain"


def test_resume_refuses_other_loader():
    """An interrupted checkpoint records its loader; resuming under a
    different one must fail loudly (never silently replay a different
    sample order)."""
    from maestro_tpu.conf import DataConfig
    from maestro_tpu.train.runtime import _check_resume_loader

    meta = {"interrupted": True, "batches_done": 7, "loader": "grain"}
    with pytest.raises(ValueError, match="data.loader"):
        _check_resume_loader(meta, DataConfig(loader="threads"))
    _check_resume_loader(meta, DataConfig(loader="grain"))  # same: ok
    # completed-epoch checkpoints carry no fast-forward: any loader resumes
    _check_resume_loader({"loader": "grain"}, DataConfig(loader="threads"))


def test_grain_set_epoch_and_skip(treesat_root, datasets_treesat):
    """set_epoch pins a reproducible order; skip_batches fast-forwards."""
    ds = TreeSatAITSDataset(
        datasets_treesat.dataset, treesat_root, "train", ssl_phase="finetune",
        use_transform=False, random_dates=False, random_crop=False,
    )
    a = GrainBatchLoader(ds, batch_size=2, num_workers=0, seed=0)
    b = GrainBatchLoader(ds, batch_size=2, num_workers=0, seed=0)
    a.set_epoch(5)
    b.set_epoch(5)
    batches_a = list(a)
    b.skip_batches = 1
    skipped = list(b)
    assert len(skipped) == len(batches_a) - 1
    np.testing.assert_array_equal(
        skipped[0]["treesat_mlc_thresh"], batches_a[1]["treesat_mlc_thresh"],
    )
    # skip consumed; epoch stays pinned -> same full order again
    assert len(list(b)) == len(batches_a)


def test_grain_shards_yield_uniform_batch_counts():
    """Strided shards differ by up to one sample; every host must still see
    the same number of batches or SPMD collectives deadlock at epoch end."""
    data = [{"x": np.full((2,), i, np.float32)} for i in range(5)]
    counts = []
    for idx in range(2):
        loader = GrainBatchLoader(data, batch_size=1, num_workers=0,
                                  shard_index=idx, shard_count=2,
                                  shuffle=False)
        batches = list(loader)
        counts.append(len(batches))
        assert len(batches) == len(loader)
    assert counts[0] == counts[1] == 2
