"""Isolate where MAE pretrain step time goes on the real chip."""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from maestro_tpu.conf import DatasetsConfig, MaskConfig, ModelConfig, OptPretrainConfig
from maestro_tpu.models.mae import build_model
from maestro_tpu.train.losses import reconstruction_loss
from maestro_tpu.train.optim import make_optimizer
from maestro_tpu.train.state import TrainState
from maestro_tpu.utils.testing import make_synthetic_batch

BS = 32


def timeit(fn, *args, steps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main(which: str):
    datasets = DatasetsConfig(name_dataset="flair")
    mask = (
        MaskConfig(mask_mod=None, mask_bands=None, mask_dates=None, mask_loc=None)
        if which == "nostruct"
        else MaskConfig()
    )
    model, plan = build_model(
        datasets, mask,
        ModelConfig(model_size="medium", fusion_mode="group", inter_depth=3),
    )
    batch = {
        k: jax.device_put(jnp.asarray(v))
        for k, v in make_synthetic_batch(datasets.dataset, BS).items()
    }
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, "pretrain"),
    )(batch)

    def emit(name, value):
        print(json.dumps({name: round(value, 4)}), flush=True)

    if which in ("fwd", "nostruct"):
        fwd_loss = jax.jit(lambda p, b, k: reconstruction_loss(
            plan, *_reorder(model.apply(p, b, "pretrain", rngs={"mask": k})),
        ))
        emit(f"fwd_loss_{which}", timeit(fwd_loss, params, batch, key))
    if which == "fwd":
        fwd_sum = jax.jit(lambda p, b, k: sum(
            x.sum() for x in model.apply(p, b, "pretrain", rngs={"mask": k})[0]
            .values()
        ))
        emit("fwd_sum_only", timeit(fwd_sum, params, batch, key))
    if which == "bwd":
        grad_fn = jax.jit(jax.grad(lambda p, b, k: reconstruction_loss(
            plan, *_reorder(model.apply(p, b, "pretrain", rngs={"mask": k})),
        )))
        emit("fwd_bwd", timeit(
            lambda p, b, k: jax.tree.leaves(grad_fn(p, b, k))[0],
            params, batch, key,
        ))
    if which == "step":
        tx = make_optimizer(OptPretrainConfig(batch_size=BS), "pretrain",
                            1000, params)
        state = TrainState.create(params, tx)
        from maestro_tpu.train.steps import make_pretrain_step

        step = make_pretrain_step(model, plan, tx, donate=False)
        emit("full_step", timeit(
            lambda s, b, k: step(s, b, k)[1]["loss_rec"], state, batch, key,
        ))


def _reorder(out):
    pixels, masks, targets = out
    return targets, pixels, masks


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "fwd")
