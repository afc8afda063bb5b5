"""Pluggable tracker hook (train/tracking.py).

Reference counterpart: the hardwired ClearML Task.init integration at
/root/reference/maestro/run_experiment.py:41-64 — here replaced by a
dependency-free factory hook plus the always-on jsonl sink.
"""

import json

from maestro_tpu.train import tracking


class _RecordingTracker:
    def __init__(self):
        self.records = []
        self.closed = False

    def log_record(self, record):
        self.records.append(record)

    def close(self):
        self.closed = True


_made = {}


def make_tracker(workdir, config):
    t = _RecordingTracker()
    _made["t"] = t
    _made["workdir"] = workdir
    _made["config"] = config
    return t


def make_broken(workdir, config):
    raise RuntimeError("boom")


def make_wrong_type(workdir, config):
    return object()


def test_jsonl_tracker_appends(tmp_path):
    t = tracking.JsonlTracker(tmp_path)
    t.log_record({"phase": "pretrain", "loss": 1.5})
    t.log_record({"phase": "pretrain", "loss": 1.25})
    rows = [json.loads(l) for l in (tmp_path / "metrics.jsonl").open()]
    assert [r["loss"] for r in rows] == [1.5, 1.25]


def test_build_trackers_loads_external_and_dispatches(tmp_path):
    _made.clear()
    trackers = tracking.build_trackers(
        tmp_path, {"seed": 7}, f"{__name__}:make_tracker",
    )
    assert len(trackers) == 2  # jsonl + external
    assert _made["config"] == {"seed": 7}
    for t in trackers:
        t.log_record({"loss": 0.5})
    assert _made["t"].records == [{"loss": 0.5}]
    rows = [json.loads(l) for l in (tmp_path / "metrics.jsonl").open()]
    assert rows == [{"loss": 0.5}]


def test_broken_tracker_never_breaks_the_run(tmp_path):
    trackers = tracking.build_trackers(
        tmp_path, {}, f"{__name__}:make_broken",
    )
    assert len(trackers) == 1  # jsonl only; failure swallowed + logged


def test_wrong_type_tracker_rejected(tmp_path):
    trackers = tracking.build_trackers(
        tmp_path, {}, f"{__name__}:make_wrong_type",
    )
    assert len(trackers) == 1


def test_env_var_spec(tmp_path, monkeypatch):
    _made.clear()
    monkeypatch.setenv("MAESTRO_TRACKER", f"{__name__}:make_tracker")
    trackers = tracking.build_trackers(tmp_path, {}, None)
    assert len(trackers) == 2


class _RaisingTracker:
    """External tracker that fails mid-run (transient SaaS/network error)."""

    def __init__(self):
        self.calls = 0

    def log_record(self, record):
        self.calls += 1
        raise ConnectionError("SaaS down")

    def close(self):
        raise RuntimeError("close failed too")


def _make_experiment_shell(tmp_path, trackers):
    """Experiment with just the tracking surface wired (no model build)."""
    from maestro_tpu.conf import ExperimentConfig
    from maestro_tpu.train import runtime as rt

    exp = rt.Experiment.__new__(rt.Experiment)
    exp.cfg = ExperimentConfig()
    exp.workdir = tmp_path
    exp._writer = None
    exp._saver = None
    exp._trackers = trackers
    return exp


def test_raising_external_tracker_is_disabled_not_fatal(tmp_path):
    """A log_record() failure in an external tracker must not crash the run
    (tracking.py's documented guarantee); the tracker is dropped and the
    jsonl sink keeps recording."""
    bad = _RaisingTracker()
    exp = _make_experiment_shell(
        tmp_path, [tracking.JsonlTracker(tmp_path), bad],
    )
    exp._append_jsonl({"loss": 1.0})   # bad raises -> disabled
    exp._append_jsonl({"loss": 0.5})   # bad no longer called
    assert bad.calls == 1
    rows = [json.loads(l) for l in (tmp_path / "metrics.jsonl").open()]
    assert [r["loss"] for r in rows] == [1.0, 0.5]


def test_raising_close_is_swallowed(tmp_path):
    exp = _make_experiment_shell(tmp_path, [_RaisingTracker()])
    exp.close()  # must not raise
    assert exp._trackers is None


def test_close_trackers_false_keeps_session_across_phases(tmp_path):
    """run_experiment closes saver/writer between phases but keeps the
    external tracker session open for the whole run (one rank-0 task,
    reference run_experiment.py:41-64)."""
    t = _RecordingTracker()
    exp = _make_experiment_shell(tmp_path, [t])
    exp.close(trackers=False)
    assert exp._trackers is not None and not t.closed
    exp.close()
    assert exp._trackers is None and t.closed
