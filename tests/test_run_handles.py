"""Name-based checkpoint discovery + multi-host wiring units.

Reference semantics: pre_call_resolve (hydra_utils.py:17-48) resolves
``load_name/load_phase`` and ``fit_name/fit_phase`` to the newest
``{phase}-epoch=*`` checkpoint by glob; rank-conditional logging matches
Lightning's @rank_zero_only (train/logger.py:40,62,278).
"""

import numpy as np
import pytest

from maestro_tpu.conf import RunConfig
from maestro_tpu.train.runtime import resolve_run_handles


def _fake_ckpt(root, name, uuid, phase, epoch):
    p = root / name / uuid / "checkpoints" / f"{phase}-epoch={epoch}" / "state"
    p.mkdir(parents=True)
    (p / "marker").write_text("x")
    return p.parent


def test_resolve_load_name_picks_latest_epoch(tmp_path):
    _fake_ckpt(tmp_path, "expA", "u1", "pretrain", 1)
    latest = _fake_ckpt(tmp_path, "expA", "u1", "pretrain", 3)
    run = RunConfig(exp_dir=str(tmp_path), load_name="expA",
                    load_phase="pretrain")
    resolve_run_handles(run)
    assert run.load_ckpt_path == str(latest)


def test_resolve_fit_name_with_uuid(tmp_path):
    _fake_ckpt(tmp_path, "expA", "u1", "finetune", 9)
    wanted = _fake_ckpt(tmp_path, "expA", "u2", "finetune", 2)
    run = RunConfig(exp_dir=str(tmp_path), fit_name="expA", fit_uuid="u2",
                    fit_phase="finetune")
    resolve_run_handles(run)
    assert run.fit_ckpt_path == str(wanted)


def test_resolve_explicit_path_wins(tmp_path):
    _fake_ckpt(tmp_path, "expA", "u1", "pretrain", 5)
    run = RunConfig(exp_dir=str(tmp_path), load_name="expA",
                    load_ckpt_path="/explicit/path")
    resolve_run_handles(run)
    assert run.load_ckpt_path == "/explicit/path"


def test_resolve_missing_raises(tmp_path):
    run = RunConfig(exp_dir=str(tmp_path), load_name="nope")
    with pytest.raises(FileNotFoundError, match="nope"):
        resolve_run_handles(run)


# --------------------------------------------------------------------------
# multi-host: loader sharding + rank-conditional writes
# --------------------------------------------------------------------------
class _IndexDataset:
    def __len__(self):
        return 16

    def __getitem__(self, i):
        return {"x": np.full((2,), i, dtype=np.int32)}


def test_loader_shards_are_disjoint_and_cover():
    from maestro_tpu.data.loader import EOBatchLoader

    seen = []
    for shard in range(2):
        loader = EOBatchLoader(
            _IndexDataset(), batch_size=2, shuffle=True, num_workers=1,
            seed=0, shard_index=shard, shard_count=2,
        )
        assert len(loader) == 4  # 16 samples / 2 shards / batch 2
        ids = [int(v) for b in loader for v in b["x"][:, 0]]
        seen.append(set(ids))
    assert seen[0] & seen[1] == set()
    assert seen[0] | seen[1] == set(range(16))


def test_is_primary_gates_jsonl_and_writer(tmp_path, monkeypatch):
    import jax

    from maestro_tpu.conf import DatasetsConfig, ExperimentConfig
    from maestro_tpu.train import runtime as rt

    cfg = ExperimentConfig()
    cfg.model.model_size = "micro"
    exp = rt.Experiment.__new__(rt.Experiment)  # skip model build
    exp.cfg = cfg
    exp.workdir = tmp_path
    exp._writer = None
    exp._trackers = None

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    exp._append_jsonl({"a": 1})
    assert not (tmp_path / "metrics.jsonl").exists()
    assert isinstance(exp.writer, rt._NullWriter)

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    exp._writer = None
    exp._append_jsonl({"a": 1})
    assert (tmp_path / "metrics.jsonl").exists()


def test_lookup_monitor_accepts_reference_spellings():
    """Every monitor spelling in the reference ecosystem resolves: the bare
    'target/metric', the documented 'target/metric_val' (reference
    conf/opt.py:43-45), and Lightning's phase-prefixed
    '{phase}_target/metric_val' (reference train/trainer.py:94-110)."""
    from maestro_tpu.train.runtime import _lookup_monitor

    val_logs = {"treesat_mlc_thresh": {"weighted_f1": 0.75, "average_f1": 0.5}}
    for monitor in (
        "treesat_mlc_thresh/weighted_f1",
        "treesat_mlc_thresh/weighted_f1_val",
        "finetune_treesat_mlc_thresh/weighted_f1_val",
    ):
        assert _lookup_monitor(val_logs, monitor, "finetune") == 0.75, monitor

    assert _lookup_monitor(val_logs, "typo/metric_val", "finetune") is None
    # a *different* phase prefix must not be stripped
    assert _lookup_monitor(
        val_logs, "probe_treesat_mlc_thresh/weighted_f1_val", "finetune",
    ) is None
