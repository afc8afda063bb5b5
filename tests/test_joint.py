"""Joint multi-dataset pretraining: shared modules, masked updates, learning.

Beyond the reference (sequential cross-dataset transfer only): one union
parameter tree trained by alternating per-dataset jitted steps.  See
maestro_tpu/train/joint.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maestro_tpu.conf import DatasetsConfig, MaskConfig, ModelConfig, OptPretrainConfig
from maestro_tpu.train.joint import (
    build_joint,
    init_joint_params,
    make_joint_pretrain_steps,
    shared_param_paths,
    used_mask,
)
from maestro_tpu.train.optim import make_optimizer
from maestro_tpu.train.state import TrainState
from maestro_tpu.utils.testing import make_synthetic_batch


def _small_treesat():
    ds = DatasetsConfig(name_dataset="treesatai_ts")
    ds.treesatai_ts.aerial.image_size = 40
    ds.treesatai_ts.aerial.patch_size.mae = 8
    ds.treesatai_ts.__post_init__()
    return ds


def _small_flair():
    ds = DatasetsConfig(name_dataset="flair")
    ds.flair.aerial.image_size = 64
    ds.flair.aerial.patch_size.mae = 16
    ds.flair.dem.image_size = 64
    ds.flair.dem.patch_size.mae = 16
    ds.flair.__post_init__()
    return ds


@pytest.fixture(scope="module")
def joint():
    cfg = ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1)
    cfgs, models, plans = build_joint(
        [_small_treesat(), _small_flair()], MaskConfig(), cfg,
        dtype=jnp.float32,
    )
    batches = [
        {k: jnp.asarray(v)
         for k, v in make_synthetic_batch(c.dataset, 2, seed=i).items()}
        for i, c in enumerate(cfgs)
    ]
    union, templates = init_joint_params(models, batches, seed=0)
    return cfgs, models, plans, batches, union, templates


def test_alias_dedupe_and_sharing(joint):
    cfgs, models, plans, batches, union, templates = joint
    # aerial embedders conflict (patch 8 vs 16) -> flair's alias is renamed
    # to a signature-canonical name
    assert plans[0].mod_specs["aerial"].name_embed == "aerial"
    assert plans[1].mod_specs["aerial"].name_embed == "aerial__v1"
    # s2/s1 embedders share (same bands + patch): identical init values and
    # ONE union copy
    shared = shared_param_paths(templates)
    assert any("patch_embed_s2" in p for p in shared)
    # encoders + the inter trunk share by stream name
    assert any(part.startswith("encoders_") for p in shared for part in p)
    assert any(part == "encoder_inter" for p in shared for part in p)
    a = templates[0]["params"]["patch_embed_s2"]["proj0"]["kernel"]
    b = templates[1]["params"]["patch_embed_s2"]["proj0"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the union holds both datasets' aerial embedders separately
    assert "patch_embed_aerial" in union["params"]
    assert "patch_embed_aerial__v1" in union["params"]


def test_alias_dedupe_is_order_independent():
    """Two later datasets with the SAME embed signature must share even when
    an earlier dataset claimed the bare alias with a different signature."""
    from maestro_tpu.train.joint import dedupe_embed_aliases

    tre = _small_treesat()   # aerial patch 8
    fla1 = _small_flair()    # aerial patch 16
    fla2 = _small_flair()    # same signature as fla1
    a, b, c = dedupe_embed_aliases([tre, fla1, fla2])
    alias_b = b.dataset.inputs["aerial"].name_embed
    alias_c = c.dataset.inputs["aerial"].name_embed
    assert alias_b == alias_c == "aerial__v1"  # flair pair still shares
    assert (a.dataset.inputs["aerial"].name_embed or "aerial") == "aerial"


def test_mask_token_band_conflict_raises():
    """Same-named modalities with different band groupings cannot share a
    mask token: build_joint fails with a clear message, not a merge crash."""
    from maestro_tpu.conf import MaskConfig, ModelConfig
    from maestro_tpu.train.joint import build_joint

    a = _small_treesat()
    b = _small_treesat()
    b.treesatai_ts.s2.bands = [[0, 1, 2, 3], [4, 5, 6], [7, 8, 9]]
    b.treesatai_ts.__post_init__()
    with pytest.raises(ValueError, match="band group"):
        build_joint(
            [a, b], MaskConfig(),
            ModelConfig(model_size="micro", fusion_mode="group",
                        inter_depth=1),
        )


def test_masked_updates_leave_other_dataset_untouched(joint):
    cfgs, models, plans, batches, union, templates = joint
    opt = OptPretrainConfig(batch_size=2, base_lr=1e-3)
    tx = make_optimizer(opt, "pretrain", total_steps=10, params=union)
    steps = make_joint_pretrain_steps(models, plans, tx, union, templates)
    state = TrainState.create(union, tx)
    rng = jax.random.PRNGKey(1)

    state1, logs = steps[0](state, batches[0], rng)  # treesat step
    assert np.isfinite(float(logs["loss_rec"]))

    mask_b = used_mask(union, templates[1])
    flat0 = jax.tree_util.tree_flatten_with_path(state.params)[0]
    flat1 = {p: v for p, v in
             jax.tree_util.tree_flatten_with_path(state1.params)[0]}
    flatm = {p: v for p, v in
             jax.tree_util.tree_flatten_with_path(mask_b)[0]}
    maskt = {p: v for p, v in
             jax.tree_util.tree_flatten_with_path(
                 used_mask(union, templates[0]))[0]}
    changed = untouched = 0
    for p, before in flat0:
        after = flat1[p]
        if not maskt[p]:
            # flair-only leaf: the treesat step must not move it at all
            np.testing.assert_array_equal(np.asarray(before),
                                          np.asarray(after))
            untouched += 1
        elif not np.array_equal(np.asarray(before), np.asarray(after)):
            changed += 1
    assert untouched > 0, "no flair-only params found"
    assert changed > 0, "treesat step changed nothing"


def test_idle_dataset_opt_state_is_frozen(joint):
    """Adam moments of leaves a dataset does NOT own must be bit-identical
    across the other dataset's steps (no mu <- b1*mu decay while idle), and
    the stepping dataset's own moments must move.  Freezing semantics =
    per-dataset optimizers on private subtrees, shared moments on the core.
    """
    cfgs, models, plans, batches, union, templates = joint
    opt = OptPretrainConfig(batch_size=2, base_lr=1e-3)
    tx = make_optimizer(opt, "pretrain", total_steps=10, params=union)
    steps = make_joint_pretrain_steps(models, plans, tx, union, templates)
    state = TrainState.create(union, tx)
    rng = jax.random.PRNGKey(3)

    # one flair step seeds flair-only moments with nonzero values, then two
    # treesat steps run while flair is idle
    state1, _ = steps[1](state, batches[1], rng)
    state2, _ = steps[0](state1, batches[0], rng)
    state2, _ = steps[0](state2, batches[0], rng)

    def strpath(p):
        return tuple(str(getattr(k, "key", getattr(k, "name", k))) for k in p)

    maskt = {strpath(p): v for p, v in
             jax.tree_util.tree_flatten_with_path(
                 used_mask(union, templates[0]))[0]}
    before = jax.tree_util.tree_flatten_with_path(state1.opt_state)[0]
    after = {p: v for p, v in
             jax.tree_util.tree_flatten_with_path(state2.opt_state)[0]}

    def param_suffix(sp):
        for i in range(len(sp)):
            if sp[i:] in maskt:
                return sp[i:]
        return None

    frozen = moved = 0
    for p, v in before:
        sp = strpath(p)
        owner = param_suffix(sp)
        if owner is None:
            continue  # count / schedule state
        if not maskt[owner]:  # flair-only opt-state leaf
            np.testing.assert_array_equal(np.asarray(v), np.asarray(after[p]))
            if np.any(np.asarray(v) != 0):
                frozen += 1
        elif not np.array_equal(np.asarray(v), np.asarray(after[p])):
            moved += 1
    assert frozen > 0, "no nonzero flair-only optimizer state found"
    assert moved > 0, "treesat steps never moved treesat optimizer state"


def test_joint_training_decreases_both_losses(joint):
    cfgs, models, plans, batches, union, templates = joint
    opt = OptPretrainConfig(batch_size=2, base_lr=3e-3)
    tx = make_optimizer(opt, "pretrain", total_steps=20, params=union)
    steps = make_joint_pretrain_steps(models, plans, tx, union, templates)
    state = TrainState.create(union, tx)
    rng = jax.random.PRNGKey(2)

    first, last = {}, {}
    for it in range(6):  # interleave: A, B, A, B, ...
        i = it % 2
        state, logs = steps[i](state, batches[i], rng)
        loss = float(logs["loss_rec"])
        assert np.isfinite(loss)
        first.setdefault(i, loss)
        last[i] = loss
    for i in (0, 1):
        assert last[i] < first[i], (
            f"dataset {i} loss did not decrease: {first[i]} -> {last[i]}"
        )
    # the shared trunk moved (both datasets train it)
    before = jax.tree_util.tree_flatten_with_path(union)[0]
    after = {p: v for p, v in
             jax.tree_util.tree_flatten_with_path(state.params)[0]}
    moved = [
        p for p, v in before
        if "encoder_inter" in str(p)
        and not np.array_equal(np.asarray(v), np.asarray(after[p]))
    ]
    assert moved, "shared inter trunk never updated"
