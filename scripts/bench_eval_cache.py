"""Measure the frozen-trunk val feature cache on the real chip.

Times one probe val batch through (a) the full eval step (trunk + heads —
what every epoch pays without the cache) and (b) the head-only replay step
over precomputed features (what epochs >= 1 pay with it), plus the one-time
feature pass and the host round-trip that builds the cache.  Prints one
JSON line for docs/PERFORMANCE.md.

Usage: python scripts/bench_eval_cache.py [batch_size]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from maestro_tpu.conf import (
    DatasetsConfig,
    MaskConfig,
    ModelConfig,
    OptProbeConfig,
)
from maestro_tpu.models.mae import build_model
from maestro_tpu.train import metrics as M
from maestro_tpu.train.optim import make_optimizer
from maestro_tpu.train.state import TrainState
from maestro_tpu.train.steps import (
    make_feature_step,
    make_head_eval_step,
    make_supervised_eval_step,
)
from maestro_tpu.utils.testing import make_synthetic_batch

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 48


def timeit(fn, *args, steps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main() -> None:
    datasets = DatasetsConfig(name_dataset="flair")
    model, plan = build_model(
        datasets, MaskConfig(),
        ModelConfig(model_size="medium", fusion_mode="group", inter_depth=3),
    )
    key = jax.random.PRNGKey(0)
    # two distinct batches (the remote tunnel memoizes identical buffers)
    batches = [
        {k: jnp.asarray(v)
         for k, v in make_synthetic_batch(datasets.dataset, BS, seed=s).items()}
        for s in (0, 1)
    ]
    params = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, "probe"),
    )(batches[0])
    tx = make_optimizer(OptProbeConfig(batch_size=BS), "probe",
                        total_steps=100, params=params)
    state = TrainState.create(params, tx)
    metric_states = {
        hs.name: M.metric_init(hs.type_target, hs.num_classes)
        for hs in model.head_specs
    }
    label_keys = tuple(hs.name for hs in model.head_specs)

    eval_step = make_supervised_eval_step(model, "probe")
    feature_step = make_feature_step(model)
    head_step = make_head_eval_step(model, "probe")

    t_full = min(
        timeit(lambda b=b: eval_step(state, b, metric_states)[0])
        for b in batches
    )
    feats = [feature_step(state.params, b) for b in batches]
    labels = [{k: b[k] for k in label_keys} for b in batches]
    t_feat = min(
        timeit(lambda b=b: feature_step(state.params, b)) for b in batches
    )
    t_head = min(
        timeit(lambda f=f, l=l: head_step(state, f, l, metric_states)[0])
        for f, l in zip(feats, labels)
    )
    # cache-build extras: device->host stash and host->device replay put
    t0 = time.perf_counter()
    host = jax.device_get(feats[0])
    t_get = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(host))
    t_put = time.perf_counter() - t0
    nbytes = sum(x.nbytes for x in jax.tree.leaves(host))

    print(json.dumps({
        "batch_size": BS,
        "full_eval_ms": round(t_full * 1e3, 2),
        "head_only_ms": round(t_head * 1e3, 2),
        "feature_ms": round(t_feat * 1e3, 2),
        "epoch1plus_speedup": round(t_full / t_head, 2),
        "cache_mb_per_batch": round(nbytes / 2**20, 1),
        "device_get_ms": round(t_get * 1e3, 2),
        "device_put_ms": round(t_put * 1e3, 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
