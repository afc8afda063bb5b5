"""int8 serving path: quantized logits must track the fp model closely.

Beyond the reference (which serves fp only): maestro_tpu.quant stores the
transformer Dense kernels int8 with per-output-channel scales and reroutes
nn.Dense through an int8 x int8 -> int32 dot_general (w8a8) under a flax
method interceptor.  v5e's MXU runs int8 at 2x the bf16 rate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maestro_tpu.conf import DatasetsConfig, MaskConfig, ModelConfig
from maestro_tpu.models.mae import build_model
from maestro_tpu.quant import make_quant_predict_fn, quantize_params
from maestro_tpu.serve import export_predict, load_exported, make_predict_fn
from maestro_tpu.utils.testing import make_synthetic_batch


@pytest.fixture(scope="module")
def setup():
    ds = DatasetsConfig(name_dataset="treesatai_ts")
    ds.treesatai_ts.aerial.image_size = 60  # cheap compile (cf. test_mesh)
    ds.treesatai_ts.aerial.patch_size.mae = 4
    ds.treesatai_ts.__post_init__()
    model, _ = build_model(
        ds, MaskConfig(),
        ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1),
        dtype=jnp.float32,
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(ds.dataset, 4).items()
    }
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "mask": key}, batch, "finetune")
    return model, batch, params


def test_quantize_params_structure(setup):
    model, batch, params = setup
    qp = quantize_params(params)
    flat = {
        tuple(str(getattr(k, "key", k)) for k in p): v
        for p, v in jax.tree_util.tree_flatten_with_path(qp)[0]
    }
    n_int8 = n_scale = 0
    for path, leaf in flat.items():
        if path[-1] == "kernel" and leaf.dtype == jnp.int8:
            n_int8 += 1
            # per-output-channel scale sits next to it
            assert flat[(*path[:-1], "kernel_scale")].shape == (leaf.shape[1],)
            # heads stay fp (accuracy-sensitive tail)
            assert not any(p.startswith("heads_") for p in path)
            n_scale += 1
    assert n_int8 == n_scale
    assert n_int8 >= 10, f"expected the transformer Denses quantized, {n_int8}"
    # patch projections (custom kernel-carrying modules) must stay fp
    for path, leaf in flat.items():
        if any(p.startswith("proj") for p in path) and path[-1] == "kernel":
            if "embedders" in str(path):
                assert leaf.dtype != jnp.int8, path


def test_quant_logits_track_fp(setup):
    model, batch, params = setup
    qp = quantize_params(params)
    fp = make_predict_fn(model, "finetune")(params, batch)
    qt = make_quant_predict_fn(model, "finetune")(qp, batch)
    for name in fp:
        a = np.asarray(fp[name], np.float64).ravel()
        b = np.asarray(qt[name], np.float64).ravel()
        cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)
                                     + 1e-12))
        assert cos > 0.999, f"{name}: quantized logits diverged, cos={cos}"
        scale = float(np.abs(a).max()) + 1e-12
        assert float(np.abs(a - b).max()) / scale < 0.05


def test_unquantized_params_run_identical_under_interceptor(setup):
    """The interceptor keys on kernel_scale: plain trees are untouched."""
    model, batch, params = setup
    fp = make_predict_fn(model, "finetune")(params, batch)
    same = make_quant_predict_fn(model, "finetune")(params, batch)
    for name in fp:
        np.testing.assert_array_equal(np.asarray(fp[name]),
                                      np.asarray(same[name]))


def test_quant_embeddings_track_fp(setup):
    from maestro_tpu.quant import make_quant_embed_fn
    from maestro_tpu.serve import make_embed_fn

    model, batch, params = setup
    qp = quantize_params(params)
    fp = make_embed_fn(model)(params, batch)
    qt = make_quant_embed_fn(model)(qp, batch)
    for name in fp:
        a = np.asarray(fp[name], np.float64).ravel()
        b = np.asarray(qt[name], np.float64).ravel()
        cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)
                                     + 1e-12))
        assert cos > 0.999, f"{name}: quantized embeddings diverged, {cos}"


def test_quant_tracks_fp_in_bf16_serving_config():
    """Production serves bf16 models; w8a8 must stay close there too."""
    ds = DatasetsConfig(name_dataset="treesatai_ts")
    ds.treesatai_ts.aerial.image_size = 60
    ds.treesatai_ts.aerial.patch_size.mae = 4
    ds.treesatai_ts.__post_init__()
    model, _ = build_model(
        ds, MaskConfig(),
        ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1),
        dtype=jnp.bfloat16,
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(ds.dataset, 4).items()
    }
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "mask": key}, batch, "finetune")
    qp = quantize_params(params)
    fp = make_predict_fn(model, "finetune")(params, batch)
    qt = make_quant_predict_fn(model, "finetune")(qp, batch)
    for name in fp:
        a = np.asarray(fp[name], np.float64).ravel()
        b = np.asarray(qt[name], np.float64).ravel()
        cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)
                                     + 1e-12))
        # bf16 activations add their own noise on top of int8 rounding
        assert cos > 0.995, f"{name}: bf16 quant diverged, cos={cos}"


def test_quant_predict_sharded_matches_single(setup):
    """int8 serving composes with the (data, model) mesh: TP splits the int8
    kernels exactly like their fp counterparts (same tree paths), the
    per-channel scales stay replicated, and logits match the single-device
    quantized forward."""
    from maestro_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

    model, batch, params = setup
    qp = quantize_params(params)
    fn = make_quant_predict_fn(model, "finetune")
    single = fn(qp, batch)

    mesh = make_mesh(4, 2)
    sharded = fn(shard_params(mesh, qp), shard_batch(mesh, batch))
    for name in single:
        a = np.asarray(single[name], np.float64).ravel()
        b = np.asarray(sharded[name], np.float64).ravel()
        # XLA:CPU lowers int8 dots through f32 accumulation (integer
        # exactness is borderline at 2^24), so partial-sum order differs
        # between shardings; the fp path is bit-stable here (<5e-7) and on
        # TPU the int8 dot is native int32-exact.  Assert closeness, not
        # bit-equality.
        cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)
                                     + 1e-12))
        assert cos > 0.9999, f"{name}: sharded int8 diverged, cos={cos}"
        scale = float(np.abs(a).max()) + 1e-12
        assert float(np.abs(a - b).max()) / scale < 0.01, name


def test_quant_baseline_adapter_tracks_fp():
    """FM adapters quantize through the same interceptor (their attention
    blocks reuse the qkv/out/fc1/fc2/proj Dense names)."""
    from maestro_tpu.baselines import build_baseline
    from maestro_tpu.conf import BaselineConfig

    ds = DatasetsConfig(name_dataset="treesatai_ts")
    for m in ("s2", "s1_asc", "s1_des"):
        getattr(ds.treesatai_ts, m).image_size = 32
    ds.treesatai_ts.aerial.image_size = 224
    model = build_baseline(
        ds, BaselineConfig(model="dinov2", model_size="micro",
                           fusion_mode="monotemp"),
        dtype=jnp.float32,
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(ds.dataset, 2).items()
    }
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda b: model.init({"params": key}, b, "finetune"),
    )(batch)
    qp = quantize_params(params)
    n_q = sum(
        1 for p, _ in jax.tree_util.tree_flatten_with_path(qp)[0]
        if "kernel_scale" in str(p)
    )
    assert n_q >= 4, f"expected backbone Denses quantized, got {n_q}"
    fp = make_predict_fn(model, "finetune")(params, batch)
    qt = make_quant_predict_fn(model, "finetune")(qp, batch)
    for name in fp:
        a = np.asarray(fp[name], np.float64).ravel()
        b = np.asarray(qt[name], np.float64).ravel()
        cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)
                                     + 1e-12))
        assert cos > 0.995, f"{name}: baseline quant diverged, cos={cos}"


def test_quant_export_roundtrip(setup):
    """int8 dot_general is plain StableHLO: exported artifacts keep it."""
    model, batch, params = setup
    qp = quantize_params(params)
    fn = make_quant_predict_fn(model, "finetune")
    blob = export_predict(model, qp, batch, "finetune", fn=fn,
                          symbolic_batch=False)
    loaded = load_exported(blob)
    direct = fn(qp, batch)
    via_artifact = loaded(qp, dict(batch))
    for name in direct:
        np.testing.assert_allclose(
            np.asarray(direct[name]), np.asarray(via_artifact[name]),
            rtol=1e-5, atol=1e-6,
        )
