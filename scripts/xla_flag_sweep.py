"""A/B TPU compiler options through the AOT compile API.

Client-side XLA_FLAGS can't carry TPU-backend flags over the axon tunnel
(the local CPU plugin rejects unknown flags fatally); ``Lowered.compile(
compiler_options=...)`` ships options to the server-side compiler instead.

Usage::

    python scripts/xla_flag_sweep.py            # sweep the table below
    python scripts/xla_flag_sweep.py key=value  # single custom option
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

BS = int(os.environ.get("BENCH_BS", 48))
WARMUP, STEPS = 3, 10

SWEEP: list[dict[str, str] | None] = [
    None,  # baseline
    {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    {"xla_tpu_enable_dot_strength_reduction": "false"},
]


def build():
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

    # same BENCH_* knobs as bench.py so the sweep measures the model being
    # benchmarked (default: the flagship medium/flair pretrain step)
    remat = os.environ.get("BENCH_REMAT", "false")
    remat = False if remat.lower() == "false" else remat
    datasets = DatasetsConfig(
        name_dataset=os.environ.get("BENCH_DATASET", "flair"),
    )
    model, plan = build_model(
        datasets, MaskConfig(),
        ModelConfig(model_size=os.environ.get("BENCH_SIZE", "medium"),
                    fusion_mode="group", inter_depth=3,
                    seg_chunk_rows=int(os.environ.get("BENCH_SEG_CHUNK", 2))),
        remat=remat,
    )
    batches = [
        {k: jax.device_put(jnp.asarray(v))
         for k, v in make_synthetic_batch(datasets.dataset, BS, seed=s).items()}
        for s in (0, 1)
    ]
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, "pretrain"),
    )(batches[0])
    opt = OptPretrainConfig(batch_size=BS)
    phase = os.environ.get("BENCH_PHASE", "pretrain")
    if phase != "pretrain":
        # supervised step (probe/finetune): aux arg is the metric states
        from maestro_tpu.train import metrics as M
        from maestro_tpu.train.steps import make_supervised_step

        sup_params = jax.jit(
            lambda b: model.init({"params": key, "mask": key}, b, phase),
        )(batches[0])
        params = {"params": {**sup_params["params"], **params["params"]}}
        tx = make_optimizer(opt, phase, total_steps=1000, params=params)
        state = TrainState.create(params, tx)
        step = make_supervised_step(model, phase, tx, donate=True)
        aux = {
            hs.name: M.metric_init(hs.type_target, hs.num_classes)
            for hs in model.head_specs
        }
        return step, state, batches, aux
    tx = make_optimizer(opt, "pretrain", total_steps=1000, params=params)
    state = TrainState.create(params, tx)
    step = make_pretrain_step(model, plan, tx, "l1_norm", donate=True)
    return step, state, batches, key


def _free(tree) -> None:
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "delete") and not getattr(leaf, "is_deleted", lambda: True)():
            leaf.delete()


def time_compiled(compiled, state, batches, aux) -> float:
    # pretrain steps return (state, logs); supervised (state, metrics, logs)
    for i in range(WARMUP):
        state = compiled(state, batches[i % 2], aux)[0]
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for i in range(STEPS):
        state = compiled(state, batches[i % 2], aux)[0]
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / STEPS
    _free(state)  # HBM: only one state copy may live across variants
    return dt


def main() -> None:
    sweep = SWEEP
    if len(sys.argv) > 1:
        kv = dict(a.split("=", 1) for a in sys.argv[1:])
        sweep = [None, kv]
    step, state, batches, key = build()
    lowered = step.lower(state, batches[0], key)
    # donate=True consumes device buffers; keep a host copy to rebuild the
    # state fresh for each variant's timing loop, and free the device copy
    # (two full medium train states do not fit v5e HBM alongside the step)
    host_state = jax.device_get(state)
    _free(state)

    for opts in sweep:
        label = opts or "baseline"
        try:
            compiled = (lowered.compile(compiler_options=opts)
                        if opts else lowered.compile())
        except Exception as e:  # noqa: BLE001
            print(f"{label}: COMPILE FAIL: {type(e).__name__}: {e}")
            continue
        st = jax.tree.map(
            lambda x: jax.device_put(x) if hasattr(x, "shape") else x,
            host_state,
        )
        try:
            dt = time_compiled(compiled, st, batches, key)
            print(f"{label}: {dt * 1e3:.1f} ms/step")
        except Exception as e:  # noqa: BLE001
            print(f"{label}: RUN FAIL: {type(e).__name__}: {e}")
        finally:
            _free(st)  # a mid-loop failure must not leak HBM into the next variant


if __name__ == "__main__":
    main()
