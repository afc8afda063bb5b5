"""Two-process jax.distributed CI test (VERDICT r2 next-round #3).

All other multi-device tests run 8 virtual devices inside ONE process; the
multi-host surfaces — ``make_array_from_process_local_data`` assembly
(train/runtime.py Experiment._device_batch), ``local_batch_slice``, loader
``shard_index/shard_count`` host sharding, ``is_primary`` gating of
writer/jsonl/checkpoint metadata, and the collective orbax save — only
execute with ``jax.process_count() > 1``.  This test launches two real
``jax.distributed`` CPU processes (4 virtual devices each, gloo collectives)
running a complete probe phase on the TreeSatAI fixture and checks the loss
history and metrics against a single-process 8-device run of the identical
config.

Why the trajectories must agree: with threads-loader host sharding, process
p reads sample order ``order[p::2]``, so global batch b assembles the same
sample SET as the single-process batch ``order[8b:8b+8]`` (a permutation of
it); probe has no masking/dropout RNG and batch-mean losses, sum-based
metric accumulators, and batch-mean gradients are permutation-invariant up
to float reduction order.

Reference counterpart: Lightning's env-rendezvous DDP
(/root/reference/maestro/conf/trainer.py) — untested there, load-bearing
here because a bug in these paths only surfaces on a real pod.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tests.fixtures import write_treesat_fixture

WORKER = Path(__file__).parent / "_two_process_worker.py"
TIMEOUT_S = 900


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(tmp_path: Path, data_root: Path, n: int) -> dict:
    """Launch n worker processes, return process-0's result payload."""
    out = tmp_path / f"out_n{n}.json"
    work = tmp_path / f"work_n{n}"
    port = _free_port()
    env = os.environ.copy()
    # the parent test session pins 8 devices via XLA_FLAGS; workers set
    # their own count, so start them from a clean flag state
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    repo_root = str(Path(__file__).parent.parent)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, env.get("PYTHONPATH")) if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(out), str(data_root), str(work),
             "--process-id", str(i), "--num-processes", str(n),
             "--port", str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=str(Path(__file__).parent.parent),
        )
        for i in range(n)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=TIMEOUT_S)
        logs.append(stdout.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, (
            f"worker {i}/{n} failed (rc={p.returncode}):\n{logs[i][-4000:]}"
        )
    assert out.exists(), f"process 0 wrote no result:\n{logs[0][-4000:]}"
    return json.loads(out.read_text())


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("treesat_2proc")
    write_treesat_fixture(root, num_tiles=8)
    return root


def test_two_process_matches_single_process(data_root, tmp_path):
    two = _run_workers(tmp_path, data_root, n=2)
    one = _run_workers(tmp_path, data_root, n=1)

    assert two["num_processes"] == 2
    h1, h2 = one["history"], two["history"]
    assert len(h1) == len(h2) == 2

    for e1, e2 in zip(h1, h2):
        # same LR schedule => same step count per epoch on both layouts
        np.testing.assert_allclose(e2["lr"], e1["lr"], rtol=1e-6)
        np.testing.assert_allclose(
            e2["train/loss_pred"], e1["train/loss_pred"], rtol=2e-3,
            err_msg="two-process train loss diverged from single-process",
        )
        val_keys = [k for k in e1 if k.startswith("val/")]
        assert val_keys
        for k in val_keys:
            np.testing.assert_allclose(
                e2[k], e1[k], rtol=2e-3, atol=1e-5, err_msg=k,
            )

    for k, v in one["val"].items():
        np.testing.assert_allclose(two["val"][k], v, rtol=2e-3, atol=1e-5,
                                   err_msg=f"val {k}")
    for k, v in one["test"].items():
        np.testing.assert_allclose(two["test"][k], v, rtol=2e-3, atol=1e-5,
                                   err_msg=f"test {k}")

    # primary-only artifacts exist exactly once (written by process 0)
    work = tmp_path / "work_n2" / "work"
    assert (work / "metrics.jsonl").exists()
    from maestro_tpu.train.checkpoint import find_latest_checkpoint, load_meta

    path = find_latest_checkpoint(work / "checkpoints", "probe")
    assert path is not None
    assert load_meta(path).get("phase") == "probe"
