"""MAE model construction + forward tests across fusion modes and phases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maestro_tpu.conf import MaskConfig, ModelConfig
from maestro_tpu.models.mae import MAE_ARCHS, build_model
from maestro_tpu.utils.testing import make_synthetic_batch


def _init_and_run(datasets, model_cfg, phase, batch_size=2):
    model, plan = build_model(
        datasets, MaskConfig(), model_cfg, dtype=jnp.float32,
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(datasets.dataset, batch_size).items()
    }
    key = jax.random.PRNGKey(0)
    # jit (rather than eager flax dispatch): micro-model compiles are cheap,
    # hit the persistent compile cache, and run ~20x faster on this 1-core CI
    params = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, phase),
    )(batch)
    out = jax.jit(
        lambda p, b: model.apply(p, b, phase, rngs={"mask": key}),
    )(params, batch)
    return model, plan, batch, params, out


@pytest.mark.parametrize("fusion_mode", ["shared", "monotemp", "mod", "group"])
def test_pretrain_forward(datasets_treesat, fusion_mode):
    inter_depth = 3 if fusion_mode in ("mod", "group") else 0
    cfg = ModelConfig(
        model_size="micro", fusion_mode=fusion_mode, inter_depth=inter_depth,
    )
    _, plan, batch, _, (pixels, masks, targets) = _init_and_run(
        datasets_treesat, cfg, "pretrain",
    )
    for name, spec in plan.mod_specs.items():
        assert pixels[name].shape == (
            2, spec.num_dates, spec.num_channels, spec.image_size, spec.image_size,
        )
        assert masks[name].shape == pixels[name].shape
        assert masks[name].dtype == jnp.bool_
        assert targets[name].shape == pixels[name].shape
        m = np.asarray(masks[name])
        assert 0 < m.mean() < 1
        assert np.isfinite(np.asarray(pixels[name])).all()


@pytest.mark.parametrize("fusion_mode", ["shared", "group"])
def test_probe_logits(datasets_treesat, fusion_mode):
    inter_depth = 3 if fusion_mode == "group" else 0
    cfg = ModelConfig(
        model_size="micro", fusion_mode=fusion_mode, inter_depth=inter_depth,
    )
    _, _, _, _, logits = _init_and_run(datasets_treesat, cfg, "probe")
    assert logits["treesat_mlc_thresh"].shape == (2, 15)
    assert np.isfinite(np.asarray(logits["treesat_mlc_thresh"])).all()


def test_segmentation_logits(datasets_pastis):
    cfg = ModelConfig(model_size="micro", fusion_mode="group", inter_depth=3)
    _, _, _, _, logits = _init_and_run(datasets_pastis, cfg, "finetune")
    # PASTIS: ref_input s2 grid 8 (16px / patch 2), target 16px -> pixel_patch 2
    assert logits["pastis_seg"].shape == (2, 1, 19, 16, 16)


def test_linear_head_and_no_date_enc(datasets_treesat):
    cfg = ModelConfig(
        model_size="micro", fusion_mode="group", inter_depth=0,
        type_head="linear", use_date_enc=False,
    )
    _, _, _, _, logits = _init_and_run(datasets_treesat, cfg, "finetune")
    assert logits["treesat_mlc_thresh"].shape == (2, 15)


def test_inter_depth_requires_seq_fusion(datasets_treesat):
    cfg = ModelConfig(model_size="micro", fusion_mode="shared", inter_depth=3)
    with pytest.raises(ValueError, match="inter_depth"):
        build_model(datasets_treesat, MaskConfig(), cfg)


def test_invalid_model_size(datasets_treesat):
    cfg = ModelConfig(model_size="giant")
    with pytest.raises(ValueError, match="size"):
        build_model(datasets_treesat, MaskConfig(), cfg)


def test_arch_table():
    assert MAE_ARCHS["medium"].embed_dim == 768
    assert MAE_ARCHS["medium"].decoder_depth == 3
    assert MAE_ARCHS["large"].depth == 24


def test_probe_stops_encoder_gradients(datasets_treesat):
    """In probe phase, grads w.r.t. encoder params must be zero."""
    model, plan, batch, params, _ = _init_and_run(
        datasets_treesat, ModelConfig(model_size="micro", inter_depth=0), "probe",
    )

    def loss_fn(p):
        logits = model.apply(p, batch, "probe")
        return (logits["treesat_mlc_thresh"] ** 2).mean()

    grads = jax.jit(jax.grad(loss_fn))(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, g in flat:
        path_str = jax.tree_util.keystr(path)
        norm = float(jnp.abs(g).max())
        if "heads" in path_str:
            continue
        assert norm == 0.0, f"non-head param {path_str} got gradient {norm}"


def test_head_split_overrides(datasets_treesat):
    """Port-compat head splits: same params, different attention grouping."""
    import pytest as _pytest

    from maestro_tpu.conf import MaskConfig, ModelConfig

    cfg = ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1,
                      encoder_heads=1, encoder_dim_head=64,
                      decoder_heads=1, decoder_dim_head=48)
    model, _ = build_model(datasets_treesat, MaskConfig(), cfg)
    assert model.arch.heads == 1 and model.arch.dim_head == 64
    assert model.arch.decoder_heads == 1 and model.arch.decoder_dim_head == 48

    bad = ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1,
                      decoder_heads=3)  # 3*24 != 2*24 inner width
    with _pytest.raises(ValueError, match="inner width"):
        build_model(datasets_treesat, MaskConfig(), bad)
