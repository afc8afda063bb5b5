"""Scanned multi-step training + multi-target head coverage."""

import jax
import jax.numpy as jnp
import numpy as np

from maestro_tpu.conf import (
    DatasetsConfig,
    MaskConfig,
    ModelConfig,
    OptPretrainConfig,
)
from maestro_tpu.models.mae import build_model
from maestro_tpu.train.optim import make_optimizer
from maestro_tpu.train.state import TrainState
from maestro_tpu.train.steps import make_pretrain_multistep, make_pretrain_step
from maestro_tpu.utils.testing import make_synthetic_batch


def test_multistep_equals_k_single_steps(datasets_treesat):
    cfg = ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1)
    model, plan = build_model(datasets_treesat, MaskConfig(), cfg,
                              dtype=jnp.float32)
    k = 3
    batches = [make_synthetic_batch(datasets_treesat.dataset, 2, seed=i)
               for i in range(k)]
    stack = {key: jnp.asarray(np.stack([b[key] for b in batches]))
             for key in batches[0]}
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, "pretrain"),
    )({key_: v[0] for key_, v in stack.items()})
    opt = OptPretrainConfig(batch_size=2, base_lr=1e-3)
    tx = make_optimizer(opt, "pretrain", total_steps=10, params=params)

    rng = jax.random.PRNGKey(7)  # seed != 0: regression for the old hardcoded key
    ms = make_pretrain_multistep(model, plan, tx, donate=False)
    state_ms, losses = ms(TrainState.create(params, tx), stack, rng)
    assert losses.shape == (k,)
    assert np.isfinite(np.asarray(losses)).all()
    assert int(state_ms.step) == k

    # single-step path over the same batches: identical rng derivation
    # (fold_in(rng, step)), so the two paths must agree numerically
    single = make_pretrain_step(model, plan, tx, donate=False)
    state_ss = TrainState.create(params, tx)
    single_losses = []
    for i in range(k):
        b = {key_: jnp.asarray(v) for key_, v in batches[i].items()}
        state_ss, logs = single(state_ss, b, rng)
        single_losses.append(float(logs["loss_rec"]))
    assert int(state_ss.step) == k
    np.testing.assert_allclose(np.asarray(losses), single_losses, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
        ),
        state_ms.params, state_ss.params,
    )


def test_flair_multi_target_heads():
    """FLAIR with both cosia and lpis segmentation targets -> two heads."""
    ds = DatasetsConfig(name_dataset="flair")
    ds.flair.filter_targets = ["cosia", "lpis"]
    # shrink images for CPU speed
    ds.flair.aerial.image_size = 64
    ds.flair.aerial.patch_size.mae = 8
    ds.flair.dem.image_size = 64
    ds.flair.dem.patch_size.mae = 16
    ds.flair.__post_init__()

    cfg = ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1)
    model, plan = build_model(ds, MaskConfig(), cfg, dtype=jnp.float32)
    assert {h.name for h in model.head_specs} == {"cosia", "lpis"}

    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(ds.dataset, 1).items()}
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, "finetune"),
    )(batch)
    logits = jax.jit(lambda p, b: model.apply(p, b, "finetune"))(params, batch)
    assert logits["cosia"].shape[2] == 15
    assert logits["lpis"].shape[2] == 74
