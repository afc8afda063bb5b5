"""Export CLI: config overrides -> StableHLO artifact + manifest -> serve."""

import json
from pathlib import Path

import jax
import numpy as np

from tests.fixtures import load_script


def _load_cli():
    return load_script("export_model")


def test_export_cli_roundtrip(tmp_path, capsys):
    cli = _load_cli()
    out = tmp_path / "probe.stablehlo"
    cli.main([
        str(out),
        "model.model_size=micro", "model.inter_depth=1",
        "model.fusion_mode=group", "--phase=probe",
    ])
    manifest = json.loads(Path(str(out) + ".json").read_text())
    assert manifest["symbolic_batch"] is True
    assert out.stat().st_size == manifest["bytes"]

    # the artifact must execute through the serving loader
    from maestro_tpu.conf import DatasetsConfig, MaskConfig, ModelConfig
    from maestro_tpu.models.mae import build_model
    from maestro_tpu.serve import load_exported
    from maestro_tpu.utils.testing import make_synthetic_batch

    ds = DatasetsConfig(name_dataset="treesatai_ts")
    model, _ = build_model(
        ds, MaskConfig(),
        ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1),
    )
    batch = {
        k: jax.numpy.asarray(v)
        for k, v in make_synthetic_batch(ds.dataset, 3).items()
    }
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, "probe"),
    )(batch)
    served = load_exported(out)
    logits = served(params, batch)
    for hs in model.head_specs:
        arr = np.asarray(logits[hs.name])
        assert arr.shape[0] == 3  # symbolic batch dim serves bs != export bs
        assert np.isfinite(arr).all()


def test_export_cli_int8(tmp_path):
    """--quantize=int8 emits an artifact over the quantized param tree."""
    cli = _load_cli()
    out = tmp_path / "probe_int8.stablehlo"
    cli.main([
        str(out),
        "model.model_size=micro", "model.inter_depth=1",
        "model.fusion_mode=group", "--phase=probe", "--quantize=int8",
        "--fixed-batch=2",
    ])
    manifest = json.loads(Path(str(out) + ".json").read_text())
    assert manifest["quantize"] == "int8"

    from maestro_tpu.conf import DatasetsConfig, MaskConfig, ModelConfig
    from maestro_tpu.models.mae import build_model
    from maestro_tpu.quant import quantize_params
    from maestro_tpu.serve import load_exported
    from maestro_tpu.utils.testing import make_synthetic_batch

    ds = DatasetsConfig(name_dataset="treesatai_ts")
    model, _ = build_model(
        ds, MaskConfig(),
        ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1),
    )
    batch = {
        k: jax.numpy.asarray(v)
        for k, v in make_synthetic_batch(ds.dataset, 2).items()
    }
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, "probe"),
    )(batch)
    logits = load_exported(out)(quantize_params(params), batch)
    for hs in model.head_specs:
        assert np.isfinite(np.asarray(logits[hs.name])).all()
