"""CI rehearsal of scripts/eval_parity.py (day-one accuracy parity).

Rehearses the one-shot end-to-end on the TreeSat fixture: train a micro
finetune checkpoint, then run the parity sweep over three configured cells
— ungated (target null), a passing gate, and a failing gate — and assert
the table, the JSON report, and the exit code behave as documented.  On
real data the only changes are the roots/ckpts in the config file.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import eval_parity  # noqa: E402
import main as cli  # noqa: E402
from maestro_tpu.train.runtime import run_experiment  # noqa: E402
from tests.fixtures import write_treesat_fixture  # noqa: E402


@pytest.fixture(scope="module")
def fixture_and_ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("treesat_parity")
    write_treesat_fixture(root, num_tiles=4)
    runs = tmp_path_factory.mktemp("runs")
    cfg, datasets = cli.parse_cli([
        f"datasets.root_dir={root}", "datasets.name_dataset=treesatai_ts",
        "datasets.treesatai_ts.rel_dir=",
        "model.model_size=micro", "model.fusion_mode=group",
        "model.inter_depth=1", "model.use_ema=false",
        "opt_pretrain.epochs=0", "opt_probe.epochs=0",
        "opt_finetune.epochs=1", "opt_finetune.batch_size=2",
        "data.num_workers=2", "trainer.compute_dtype=float32",
        "trainer.mesh_data=1",  # conftest exposes 8 virtual CPU devices
        f"run.exp_dir={runs}", "run.exp_name=seed",
    ])
    run_experiment(cfg, datasets, runs / "seed")
    ckpt = runs / "seed" / "checkpoints" / "finetune-epoch=0"
    assert ckpt.exists()
    return root, ckpt


def _config(root, ckpt, runs):
    base = {
        "root": str(root), "ckpt": str(ckpt),
        "overrides": [
            "datasets.treesatai_ts.rel_dir=",
            "model.model_size=micro", "model.fusion_mode=group",
            "model.inter_depth=1", "model.use_ema=false",
            "opt_finetune.batch_size=2",
            "data.num_workers=2", "trainer.compute_dtype=float32",
            "trainer.mesh_data=1",
            "run.exp_dir=/tmp/parity_runs",
        ],
    }
    return {"gate": 0.5, "runs": [
        # the published-table row, ungated for the fixture rehearsal
        {"row": "maestro", "dataset": "treesatai_ts", "target": None,
         "exp_name": "cell_ungated", **base},
        # a gate the fixture metric trivially clears
        {"row": "maestro", "dataset": "treesatai_ts", "target": 0.0,
         "exp_name": "cell_pass", **base},
        # an unreachable gate: must FAIL and flip the exit code
        {"row": "maestro", "dataset": "treesatai_ts", "target": 1000.0,
         "exp_name": "cell_fail", **base},
    ]}


def test_parity_sweep_table_gates_and_exit_code(fixture_and_ckpt, tmp_path,
                                                capsys):
    root, ckpt = fixture_and_ckpt
    cfg_path = tmp_path / "parity.json"
    cfg_path.write_text(json.dumps(_config(root, ckpt, tmp_path)))
    out = tmp_path / "report.json"

    rc = eval_parity.main(["--config", str(cfg_path), "--out", str(out)])
    assert rc == 1  # the unreachable gate fails the sweep

    table = capsys.readouterr().out
    assert "| maestro | treesatai_ts |" in table
    assert "PASS" in table and "FAIL" in table and "n/a" in table

    report = json.loads(out.read_text())["report"]
    assert len(report) == 3
    vals = [r["value_pct"] for r in report]
    assert all(0.0 <= v <= 100.0 for v in vals)
    assert vals[0] == vals[1] == vals[2]  # same ckpt, same metric
    assert report[0]["target_pct"] is None
    assert report[1]["delta_pts"] == pytest.approx(vals[1], abs=0.02)
    assert report[2]["delta_pts"] < -500


def test_targets_table_matches_baseline_md():
    """Every gated cell's reference number must match BASELINE.md verbatim
    (spot checks across both tables)."""
    t = eval_parity.TARGETS
    assert t[("maestro", "flair_hub")] == 65.9
    assert t[("maestro_2x", "treesatai_ts")] == 79.4
    assert t[("croma", "flair2")] == 39.0
    assert t[("satmae", "pastis_hd")] == 66.6
    assert t[("dinov2_sat", "flair_hub")] == 66.0
    # all four datasets covered for every FM row
    for row in ("dinov2", "dinov2_sat", "dofa", "croma", "prithvi",
                "satmae", "maestro", "maestro_2x"):
        for ds in ("treesatai_ts", "pastis_hd", "flair2", "flair_hub"):
            assert (row, ds) in t, (row, ds)
