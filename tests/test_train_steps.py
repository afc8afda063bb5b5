"""End-to-end training step tests: pretrain / probe / finetune on tiny MAE."""

import jax
import jax.numpy as jnp
import numpy as np

from maestro_tpu.conf import (
    MaskConfig,
    ModelConfig,
    OptPretrainConfig,
    OptProbeConfig,
)
from maestro_tpu.models.mae import build_model
from maestro_tpu.train.optim import make_optimizer
from maestro_tpu.train.state import TrainState, ema_momentum, ema_update
from maestro_tpu.train.steps import (
    compute_metrics,
    init_metric_states,
    make_pretrain_step,
    make_supervised_eval_step,
    make_supervised_step,
)
from maestro_tpu.utils.testing import make_synthetic_batch


def _setup(datasets, phase, fusion_mode="group", inter_depth=3):
    cfg = ModelConfig(
        model_size="micro", fusion_mode=fusion_mode, inter_depth=inter_depth,
    )
    model, plan = build_model(datasets, MaskConfig(), cfg, dtype=jnp.float32)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(datasets.dataset, 2).items()
    }
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "mask": key}, batch, phase)
    return model, plan, batch, params


def test_pretrain_step_decreases_loss(datasets_treesat):
    model, plan, batch, params = _setup(datasets_treesat, "pretrain")
    opt = OptPretrainConfig(base_lr=3e-3)
    tx = make_optimizer(opt, "pretrain", total_steps=50, params=params)
    state = TrainState.create(params, tx)
    step = make_pretrain_step(model, plan, tx, "l1_norm", donate=False)

    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(5):
        state, logs = step(state, batch, rng)
        losses.append(float(logs["loss_rec"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert int(state.step) == 5


def test_probe_step_updates_heads_only(datasets_treesat):
    model, plan, batch, params = _setup(datasets_treesat, "probe", inter_depth=0)
    opt = OptProbeConfig(base_lr=1e-3)
    tx = make_optimizer(opt, "probe", total_steps=10, params=params)
    state = TrainState.create(params, tx)
    step = make_supervised_step(model, "probe", tx, donate=False)
    metrics = init_metric_states(model.head_specs)

    p0 = jax.tree.map(lambda x: x.copy(), state.params)
    state, metrics, logs = step(state, batch, metrics)
    assert np.isfinite(float(logs["loss_pred"]))

    flat0 = jax.tree_util.tree_flatten_with_path(p0)[0]
    flat1 = jax.tree_util.tree_leaves(state.params)
    for (path, before), after in zip(flat0, flat1):
        path_str = jax.tree_util.keystr(path)
        changed = bool(jnp.any(before != after))
        if "heads_" in path_str:
            assert changed, f"head param {path_str} did not update"
        else:
            assert not changed, f"backbone param {path_str} changed in probe"


def test_finetune_eval_metrics(datasets_treesat):
    model, plan, batch, params = _setup(datasets_treesat, "finetune", inter_depth=0)
    opt = OptProbeConfig()
    tx = make_optimizer(opt, "finetune", total_steps=10, params=params)
    state = TrainState.create(params, tx, use_ema=True)
    eval_step = make_supervised_eval_step(model, "finetune", use_ema=True)

    metrics = init_metric_states(model.head_specs)
    metrics, logs = eval_step(state, batch, metrics)
    results = compute_metrics(model.head_specs, metrics)
    r = results["treesat_mlc_thresh"]
    for name in ("average_f1", "weighted_f1", "average_ap", "weighted_ap"):
        assert 0.0 <= r[name] <= 1.0, (name, r)


def test_ema_update_moves_toward_params(datasets_treesat):
    model, plan, batch, params = _setup(datasets_treesat, "pretrain")
    opt = OptPretrainConfig(base_lr=1e-2)
    tx = make_optimizer(opt, "pretrain", total_steps=10, params=params)
    state = TrainState.create(params, tx, use_ema=True)
    step = make_pretrain_step(model, plan, tx, donate=False)
    state, _ = step(state, batch, jax.random.PRNGKey(0))

    m = ema_momentum(max_epochs=20)
    assert m == 1 - 1 / (20 * 0.2)
    new_state = ema_update(state, m)
    # ema = m * old_ema + (1-m) * params, with old_ema == init params
    leaf = lambda t: jax.tree_util.tree_leaves(t)[0]
    expect = m * leaf(params) + (1 - m) * leaf(state.params)
    np.testing.assert_allclose(np.asarray(leaf(new_state.ema_params)),
                               np.asarray(expect), rtol=1e-5)


def test_skip_nonfinite_updates(datasets_treesat):
    """trainer.skip_nonfinite drops inf/nan-gradient updates entirely."""
    import optax

    from maestro_tpu.conf import OptPretrainConfig
    from maestro_tpu.train.optim import make_optimizer

    params = {"params": {"encoder_s2": {"w": jnp.ones((4, 4))}}}
    opt = OptPretrainConfig(batch_size=2, base_lr=1e-2)
    tx = make_optimizer(opt, "pretrain", total_steps=10, params=params,
                        skip_nonfinite=True)
    state = tx.init(params)

    bad = {"params": {"encoder_s2": {"w": jnp.full((4, 4), jnp.nan)}}}
    upd, state = tx.update(bad, state, params)
    assert float(jnp.abs(upd["params"]["encoder_s2"]["w"]).max()) == 0.0

    good = {"params": {"encoder_s2": {"w": jnp.ones((4, 4))}}}
    upd, state = tx.update(good, state, params)
    assert float(jnp.abs(upd["params"]["encoder_s2"]["w"]).max()) > 0.0
