"""CI rehearsal of the docs/OPERATIONS.md "Day one on real data" runbook.

Executes the documented command sequence end-to-end against the TreeSatAI
fixture: (1) convert_dataset --check, (2) port_checkpoint on a synthetic
reference-layout lightning .ckpt, (3) main.py run.eval_only=true on the
ported weights, (4) main.py probe+finetune warm-started from the port with
the reference monitor spelling.  Every command in the doc is the command
run here (fixture root / micro arch substituted), so the day-one sequence
is known-good before it touches real data (VERDICT r2 next-round #8).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from test_full_forward_parity import NO_MASK, TorchMAE  # noqa: E402

import main as cli  # noqa: E402
from maestro_tpu.conf import ModelConfig  # noqa: E402
from maestro_tpu.models.mae import MAE_ARCHS, build_model  # noqa: E402
from maestro_tpu.train import checkpoint as ckpt  # noqa: E402
from tests.fixtures import write_treesat_fixture  # noqa: E402


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("treesat_day1")
    write_treesat_fixture(root, num_tiles=2)
    return root


def test_day_one_runbook(data_root, tmp_path, monkeypatch, datasets_treesat):
    runs = tmp_path / "runs"

    # ---- step 1: convert the dataset (memmap mirrors) + --check ----------
    import convert_dataset

    convert_dataset.main([
        "datasets.name_dataset=treesatai_ts",
        f"datasets.root_dir={data_root}",
        "datasets.treesatai_ts.rel_dir=",
        "--check",
    ])

    # ---- step 2: port a released-layout checkpoint -----------------------
    # stand-in for the HF release: a lightning .ckpt of the vendored
    # real-vit-pytorch-layout torch MAE (micro instead of medium)
    model_cfg = ModelConfig(model_size="micro", fusion_mode="group",
                            inter_depth=1)
    model, plan = build_model(datasets_treesat, NO_MASK, model_cfg,
                              dtype=jnp.float32)
    torch.manual_seed(3)
    tmodel = TorchMAE(plan, MAE_ARCHS["micro"], model_cfg.inter_depth,
                      model.head_specs)
    sd = {f"model.{k}": v for k, v in tmodel.state_dict().items()}
    ckpt_file = tmp_path / "MAESTRO_FLAIR-HUB_base.ckpt"
    torch.save({"state_dict": sd, "epoch": 99}, ckpt_file)

    import port_checkpoint

    monkeypatch.setattr(sys, "argv", [
        "port_checkpoint.py", "--ckpt", str(ckpt_file),
        "--dataset", "treesatai_ts", "--fusion-mode", "group",
        "--model-size", "micro", "--inter-depth", "1",
        "--out", str(runs / "ported_flairhub"),
    ])
    port_checkpoint.main()
    ported = ckpt.find_latest_checkpoint(runs / "ported_flairhub", "pretrain")
    assert ported is not None

    common = [
        "datasets.name_dataset=treesatai_ts",
        f"datasets.root_dir={data_root}",
        "datasets.treesatai_ts.rel_dir=",
        "model.model_size=micro", "model.fusion_mode=group",
        "model.inter_depth=1",
        "data.num_workers=2", "trainer.compute_dtype=float32",
        "trainer.mesh_data=1", "trainer.mesh_model=1",
        f"run.exp_dir={runs}",
    ]

    # ---- step 3: eval the ported weights without training ----------------
    results = cli.main([
        *common,
        "run.eval_only=true", f"run.load_ckpt_path={ported}",
        "opt_pretrain.epochs=1", "opt_probe.epochs=0", "opt_finetune.epochs=0",
        "opt_pretrain.batch_size=2",
        "run.exp_name=parity_eval",
    ])
    loss_rec = results["pretrain"].val_metrics["loss_rec"]
    assert np.isfinite(loss_rec), "ported weights produced non-finite loss"
    # the jsonl sink records the eval (the runbook greps this file)
    eval_dir = next((runs / "parity_eval").iterdir())
    records = [
        json.loads(line)
        for line in (eval_dir / "metrics.jsonl").read_text().splitlines()
    ]
    assert any(r.get("eval_only") and np.isfinite(r.get("val/loss_rec", np.nan))
               for r in records), records

    # ---- step 4: probe + finetune from the port, reference monitor -------
    results = cli.main([
        *common,
        f"run.load_ckpt_path={ported}",
        "opt_pretrain.epochs=0", "opt_probe.epochs=1", "opt_finetune.epochs=1",
        "opt_probe.batch_size=2", "opt_finetune.batch_size=2",
        "opt_finetune.monitor=treesat_mlc_thresh/weighted_f1_val",
        "run.exp_name=day1_treesat",
    ])
    assert set(results) == {"probe", "finetune"}
    wf1 = results["finetune"].test_metrics["treesat_mlc_thresh/weighted_f1"]
    assert 0.0 <= wf1 <= 1.0
    # monitor in the reference spelling resolved (early stopping active)
    assert results["finetune"].best_monitor is not None
    day1_dir = next((runs / "day1_treesat").iterdir())
    assert ckpt.find_latest_checkpoint(
        day1_dir / "checkpoints", "finetune",
    ) is not None
