"""Serving surface: jitted predict/embed fns and jax.export artifacts.

Beyond the reference (no inference entry exists there); the exported
StableHLO module must reproduce the in-process forward bit-exactly and
serve multiple batch sizes from one artifact (symbolic batch dim).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maestro_tpu.conf import DatasetsConfig, MaskConfig, ModelConfig
from maestro_tpu.models.mae import build_model
from maestro_tpu.serve import (
    export_predict,
    load_exported,
    make_embed_fn,
    make_predict_fn,
    save_exported,
    serving_params,
)
from maestro_tpu.utils.testing import make_synthetic_batch


@pytest.fixture(scope="module")
def setup():
    ds = DatasetsConfig(name_dataset="treesatai_ts")
    ds.treesatai_ts.aerial.image_size = 40
    ds.treesatai_ts.aerial.patch_size.mae = 8
    ds.treesatai_ts.__post_init__()
    cfg = ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1)
    model, plan = build_model(ds, MaskConfig(), cfg, dtype=jnp.float32)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(ds.dataset, 4).items()
    }
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, "probe"),
    )(batch)
    return ds, model, batch, params


def test_predict_fn_matches_apply(setup):
    ds, model, batch, params = setup
    logits = make_predict_fn(model, "probe")(params, batch)
    direct = model.apply(params, batch, "probe")
    # jit fuses differently than eager: low-bit float drift is expected
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
        ),
        logits, direct,
    )
    for hs in model.head_specs:
        assert np.isfinite(np.asarray(logits[hs.name])).all()


def test_embed_fn_shapes(setup):
    ds, model, batch, params = setup
    emb = make_embed_fn(model)(params, batch)
    dim = model.arch.embed_dim
    for name in model.plan.mods:
        assert emb[name].shape == (4, dim)
        assert np.isfinite(np.asarray(emb[name])).all()
    assert emb["joint"].shape == (4, dim * len(model.plan.mods))


def test_export_roundtrip_symbolic_batch(setup, tmp_path):
    """One exported artifact serves several batch sizes, bit-exact."""
    ds, model, batch, params = setup
    blob = export_predict(model, params, batch, "probe")
    path = save_exported(tmp_path / "probe.stablehlo", blob)
    served = load_exported(path)

    for bs in (2, 4):
        b = {k: v[:bs] for k, v in batch.items()}
        got = served(params, b)
        want = jax.jit(lambda p, x: model.apply(p, x, "probe"))(params, b)
        jax.tree.map(
            lambda a, e: np.testing.assert_allclose(
                np.asarray(a), np.asarray(e), rtol=1e-5, atol=1e-5,
            ),
            got, want,
        )


def test_export_embed_fn(setup, tmp_path):
    ds, model, batch, params = setup
    blob = export_predict(
        model, params, batch, fn=make_embed_fn(model), symbolic_batch=False,
    )
    served = load_exported(blob)
    got = served(params, batch)
    want = make_embed_fn(model)(params, batch)
    jax.tree.map(
        lambda a, e: np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=1e-5, atol=1e-5,
        ),
        got, want,
    )


def test_serving_params_prefers_ema():
    p = {"params": {"w": 1}}
    e = {"params": {"w": 2}}
    assert serving_params({"params": p, "ema_params": e}) == e
    assert serving_params({"params": p}) == p
    with pytest.raises(ValueError):
        serving_params({})
