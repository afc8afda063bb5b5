"""Sweep batch sizes / options for the MAE pretrain step on the real chip."""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from maestro_tpu.conf import DatasetsConfig, MaskConfig, ModelConfig, OptPretrainConfig
from maestro_tpu.models.mae import build_model
from maestro_tpu.train.optim import make_optimizer
from maestro_tpu.train.state import TrainState
from maestro_tpu.train.steps import make_pretrain_step
from maestro_tpu.utils.testing import make_synthetic_batch


def bench(batch_size: int, dataset: str = "flair", steps: int = 10) -> dict:
    datasets = DatasetsConfig(name_dataset=dataset)
    model, plan = build_model(
        datasets, MaskConfig(),
        ModelConfig(model_size="medium", fusion_mode="group", inter_depth=3),
    )
    batch = {
        k: jax.device_put(jnp.asarray(v))
        for k, v in make_synthetic_batch(datasets.dataset, batch_size).items()
    }
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, "pretrain"),
    )(batch)
    tx = make_optimizer(
        OptPretrainConfig(batch_size=batch_size), "pretrain", 1000, params,
    )
    state = TrainState.create(params, tx)
    step = make_pretrain_step(model, plan, tx)
    try:
        compiled = step.lower(state, batch, key).compile()
        flops = compiled.cost_analysis().get("flops", 0.0)
    except Exception:
        flops = 0.0
    for _ in range(3):
        state, logs = step(state, batch, key)
    jax.block_until_ready(logs["loss_rec"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, logs = step(state, batch, key)
    jax.block_until_ready(logs["loss_rec"])
    dt = (time.perf_counter() - t0) / steps
    tokens = sum(s.seq_len * s.batch_factor for s in plan.streams.values())
    return {
        "batch": batch_size,
        "step_s": round(dt, 4),
        "samples_s": round(batch_size / dt, 1),
        "tokens_s": round(tokens * batch_size / dt, 0),
        "mfu": round(flops / dt / 197e12, 4) if flops else None,
    }


if __name__ == "__main__":
    for bs in (32, 64, 128):
        try:
            print(json.dumps(bench(bs)), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"batch": bs, "error": str(e)[:200]}), flush=True)
