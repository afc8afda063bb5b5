"""Config summary: token layout, parameter counts, memory, optional FLOPs.

Usage::

    python scripts/summarize.py datasets.name_dataset=flair \
        model.model_size=medium model.fusion_mode=group model.inter_depth=3 \
        [--phase=pretrain|probe|finetune] [--batch-size=N] [--flops]

Sizing tool for planning runs (the reference has no equivalent): prints the
per-stream token layout the FusionPlan compiled (sequence lengths, masked
counts, encoder batch factors), parameter counts/bytes per top-level module,
and — with ``--flops`` — the XLA-counted FLOPs of one jitted train step
(compiles the step; slow on CPU).  Everything is derived by ``jax.eval_shape``
without allocating model memory, so it runs instantly on any host.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv: list[str]) -> None:
    phase, batch_size, want_flops = "pretrain", 1, False
    overrides = []
    for arg in argv:
        if arg.startswith("--phase="):
            phase = arg.split("=", 1)[1]
        elif arg.startswith("--batch-size="):
            batch_size = int(arg.split("=", 1)[1])
        elif arg == "--flops":
            want_flops = True
        elif "=" in arg:
            overrides.append(arg)
        else:
            msg = f"unexpected argument {arg!r}"
            raise SystemExit(msg)

    import jax
    import jax.numpy as jnp

    from main import parse_cli

    from maestro_tpu.models.factory import build_experiment_model
    from maestro_tpu.utils.testing import make_synthetic_batch

    cfg, datasets = parse_cli(overrides)
    model, plan, is_baseline = build_experiment_model(datasets, cfg)

    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(datasets.dataset, batch_size).items()
    }
    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda b: model.init({"params": key, "mask": key}, b, phase), batch,
    )

    by_module: dict[str, int] = {}
    total_params = total_bytes = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(shapes)[0]:
        keys = [str(getattr(k, "key", k)) for k in path]
        top = keys[1] if len(keys) > 1 else keys[0]  # under "params"
        n = 1
        for s in leaf.shape:
            n *= s
        by_module[top] = by_module.get(top, 0) + n
        total_params += n
        total_bytes += n * leaf.dtype.itemsize

    streams = None
    if plan is not None:
        streams = {
            name: {
                "seq_len": s.seq_len,
                "batch_factor": s.batch_factor,
                "masked_tokens": s.num_masked,
                "encoder": s.encoder,
                "mods": list(s.mods),
            }
            for name, s in plan.streams.items()
        }

    out = {
        "dataset": datasets.name_dataset,
        "model": cfg.model.model_size if not is_baseline else cfg.model.model,
        "fusion_mode": cfg.model.fusion_mode,
        "phase": phase,
        "params_total": total_params,
        "params_mib_fp32": round(total_bytes / 2**20, 1),
        "params_by_module": dict(
            sorted(by_module.items(), key=lambda kv: -kv[1]),
        ),
        "inputs": {
            k: [list(jnp.shape(v)), str(jnp.asarray(v).dtype)]
            for k, v in batch.items()
        },
        "streams": streams,
    }
    if streams:
        out["tokens_per_sample"] = sum(
            s["seq_len"] * s["batch_factor"] for s in streams.values()
        )

    if want_flops:
        from maestro_tpu.conf import OptPretrainConfig
        from maestro_tpu.train.optim import make_optimizer
        from maestro_tpu.train.state import TrainState
        from maestro_tpu.train.steps import (
            make_pretrain_step,
            make_supervised_step,
        )
        from maestro_tpu.utils.profiling import compiled_flops

        params = jax.jit(
            lambda b: model.init({"params": key, "mask": key}, b, phase),
        )(batch)
        opt = OptPretrainConfig(batch_size=batch_size)
        tx = make_optimizer(opt, phase, total_steps=100, params=params)
        state = TrainState.create(params, tx)
        if phase == "pretrain":
            step = make_pretrain_step(model, plan, tx, cfg.model.loss,
                                      donate=False)
            flops = compiled_flops(step, state, batch, key)
        else:
            from maestro_tpu.train import metrics as M

            step = make_supervised_step(model, phase, tx, donate=False)
            ms = {hs.name: M.metric_init(hs.type_target, hs.num_classes)
                  for hs in model.head_specs}
            flops = compiled_flops(step, state, batch, ms)
        out["train_step_gflops"] = round(flops / 1e9, 2)
        out["train_step_gflops_per_sample"] = round(
            flops / batch_size / 1e9, 2,
        )

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main(sys.argv[1:])
