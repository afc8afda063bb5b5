"""Batch-inference CLI: predictions land on disk with the right shapes."""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _load_cli(name, fname):
    sys.path.insert(0, str(REPO))
    spec = importlib.util.spec_from_file_location(name, REPO / "scripts" / fname)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_predict_cli_treesat(tmp_path, tmp_path_factory):
    from tests.fixtures import write_treesat_fixture

    root = tmp_path_factory.mktemp("treesat_predict")
    write_treesat_fixture(root, num_tiles=4)

    # train nothing: init + save a checkpoint to predict from
    import jax

    from maestro_tpu.conf import DatasetsConfig, MaskConfig, ModelConfig
    from maestro_tpu.models.mae import build_model
    from maestro_tpu.train import checkpoint as ckpt
    from maestro_tpu.train.state import TrainState
    from maestro_tpu.utils.testing import make_synthetic_batch
    import optax

    datasets = DatasetsConfig(root_dir=str(root), name_dataset="treesatai_ts")
    datasets.treesatai_ts.rel_dir = ""
    model, _ = build_model(
        datasets, MaskConfig(),
        ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1),
    )
    key = jax.random.PRNGKey(0)
    batch = {k: jax.numpy.asarray(v)
             for k, v in make_synthetic_batch(datasets.dataset, 2).items()}
    params = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, "finetune"),
    )(batch)
    state = TrainState.create(params, optax.adamw(1e-3))
    ck = ckpt.save_checkpoint(tmp_path / "ck", "finetune", 0, state)

    cli = _load_cli("predict_cli", "predict.py")
    out = tmp_path / "preds"
    cli.main([
        str(out),
        f"datasets.root_dir={root}", "datasets.name_dataset=treesatai_ts",
        "datasets.treesatai_ts.rel_dir=",
        "model.model_size=micro", "model.fusion_mode=group",
        "model.inter_depth=1", "trainer.compute_dtype=float32",
        f"run.load_ckpt_path={ck}",
        # pin the in-process thread loader: data.loader=auto resolves to the
        # grain MULTIPROCESS pipeline on the core-starved CI host, and
        # spawning+pickling its workers dominated this test (163s -> ~30s)
        "data.loader=threads", "data.num_workers=2",
        "--split=test", "--batch-size=2", "--probs",
    ])
    manifest = json.loads((out / "manifest.json").read_text())
    n = manifest["tiles"]["treesat_mlc_thresh"]
    assert n > 0
    preds = np.load(out / "treesat_mlc_thresh" / "preds.npy")
    probs = np.load(out / "treesat_mlc_thresh" / "probs.npy")
    assert preds.shape == (n, 15)
    assert probs.shape == (n, 15)
    assert preds.dtype == np.int8
    assert set(np.unique(preds)).issubset({0, 1})
    assert (probs >= 0).all() and (probs <= 1).all()
