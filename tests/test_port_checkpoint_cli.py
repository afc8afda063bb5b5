"""End-to-end checkpoint-porter CLI: lightning .ckpt -> orbax -> warm start.

Builds a synthetic pytorch-lightning checkpoint from the reference-semantics
torch MAE (test_full_forward_parity.TorchMAE), runs scripts/port_checkpoint.py
on it, restores the resulting orbax checkpoint as a warm start, and checks
the restored forward matches the torch model — the full path a user takes
with the released MAESTRO weights (reference README.md:37-39).
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from test_full_forward_parity import NO_MASK, TorchMAE  # noqa: E402

from maestro_tpu.conf import ModelConfig  # noqa: E402
from maestro_tpu.models.mae import MAE_ARCHS, build_model  # noqa: E402
from maestro_tpu.train import checkpoint as ckpt  # noqa: E402
from maestro_tpu.utils.testing import make_synthetic_batch  # noqa: E402


def test_port_cli_roundtrip(tmp_path, monkeypatch, datasets_treesat):
    cfg = ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1)
    model, plan = build_model(datasets_treesat, NO_MASK, cfg,
                              dtype=jnp.float32)

    torch.manual_seed(11)
    tmodel = TorchMAE(plan, MAE_ARCHS["micro"], cfg.inter_depth,
                      model.head_specs).eval()
    sd = {f"model.{k}": v for k, v in tmodel.state_dict().items()}
    ckpt_path = tmp_path / "MAESTRO_test.ckpt"
    torch.save({"state_dict": sd, "epoch": 7}, ckpt_path)

    import port_checkpoint

    monkeypatch.setattr(sys, "argv", [
        "port_checkpoint.py", "--ckpt", str(ckpt_path),
        "--dataset", "treesatai_ts", "--fusion-mode", "group",
        "--model-size", "micro", "--inter-depth", "1",
        "--out", str(tmp_path / "ported"),
    ])
    port_checkpoint.main()

    # warm-start restore (run.load_ckpt_path semantics)
    path = ckpt.find_latest_checkpoint(tmp_path / "ported", "pretrain")
    assert path is not None

    batch_np = make_synthetic_batch(datasets_treesat.dataset, 2, seed=5)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    key = jax.random.PRNGKey(0)
    template = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, "pretrain"),
    )(batch)
    params = ckpt.load_weights(path, template)

    rec, _, _ = model.apply(params, batch, "pretrain", rngs={"mask": key})
    with torch.no_grad():
        want = tmodel(batch_np, "pretrain")
    for name in plan.mod_specs:
        np.testing.assert_allclose(
            np.asarray(rec[name], dtype=np.float32), want[name].numpy(),
            atol=5e-4, err_msg=name,
        )
