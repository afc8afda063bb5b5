"""Coverage for config options: grad accumulation, interpolate modes, CLI."""

import jax
import jax.numpy as jnp
import numpy as np

from main import parse_cli
from maestro_tpu.conf import (
    DatasetsConfig,
    MaskConfig,
    ModelConfig,
    OptPretrainConfig,
)
from maestro_tpu.models.mae import build_model
from maestro_tpu.train.optim import make_optimizer
from maestro_tpu.train.state import TrainState
from maestro_tpu.train.steps import make_pretrain_step
from maestro_tpu.utils.testing import make_synthetic_batch


def test_gradient_accumulation(datasets_treesat):
    """accumulate_grad_batches=2: params move only every second step."""
    cfg = ModelConfig(model_size="micro", fusion_mode="group", inter_depth=0)
    model, plan = build_model(datasets_treesat, MaskConfig(), cfg,
                              dtype=jnp.float32)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(datasets_treesat.dataset, 2).items()}
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, "pretrain"),
    )(batch)
    opt = OptPretrainConfig(batch_size=2, accumulate_grad_batches=2,
                            base_lr=1e-3)
    tx = make_optimizer(opt, "pretrain", total_steps=4, params=params)
    state = TrainState.create(params, tx)
    step = make_pretrain_step(model, plan, tx, donate=False)

    leaf = lambda p: np.asarray(jax.tree_util.tree_leaves(p)[0])
    p0 = leaf(state.params)
    state, _ = step(state, batch, key)
    assert np.array_equal(leaf(state.params), p0)  # accumulating, no update
    state, _ = step(state, batch, key)
    assert not np.array_equal(leaf(state.params), p0)  # applied


def test_interpolate_modes(datasets_s2naip):
    """S2-NAIP upsamples aerial 96->384; all three modes must run."""
    from maestro_tpu.ops.resize import resize_spatial

    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 4, 96, 96)))
    for mode in ("nearest", "bilinear", "bicubic"):
        y = resize_spatial(x, 384, mode)
        assert y.shape == (1, 1, 4, 384, 384)
        assert bool(jnp.isfinite(y).all())


def test_cli_list_and_nested_overrides():
    cfg, datasets = parse_cli([
        "datasets.name_dataset=treesatai_ts",
        'datasets.treesatai_ts.filter_inputs=["s2","s1_asc","s1_des"]',
        "datasets.treesatai_ts.s2.image_size=8",
        "datasets.treesatai_ts.s2.patch_size.mae=4",
        "model.fusion_mode=mod",
        "opt_pretrain.base_lr=0.001",
        "run.load_name=foo",
        "trainer.mesh_model=2",
        "trainer.mesh_replica=2",
    ])
    ds = datasets.treesatai_ts
    assert list(ds.inputs) == ["s2", "s1_asc", "s1_des"]  # post_init re-ran
    assert ds.s2.image_size == 8
    assert ds.s2.patch_size.mae == 4
    assert cfg.model.fusion_mode == "mod"
    assert cfg.opt_pretrain.base_lr == 0.001
    assert cfg.run.load_name == "foo"
    assert cfg.trainer.mesh_model == 2
    assert cfg.trainer.mesh_replica == 2


def test_cli_none_override():
    cfg, datasets = parse_cli(["mask.mask_mod=none", "opt_finetune.monitor=none"])
    assert cfg.mask.mask_mod is None
    assert cfg.opt_finetune.monitor is None
