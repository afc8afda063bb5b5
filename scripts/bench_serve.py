"""Serving-throughput benchmark: fp predict vs the int8 (w8a8) path.

Usage::

    python scripts/bench_serve.py [--dataset=flair] [--size=medium] \
        [--phase=finetune] [--bs=32]

Measures the jitted predict fn (maestro_tpu.serve.make_predict_fn) against
the quantized one (maestro_tpu.quant.make_quant_predict_fn) on the attached
device, with bench.py's anti-memoization protocol (two distinct batches
alternated, block on full outputs).  Prints one JSON line per variant.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WARMUP, STEPS = 3, 10


def _args(argv):
    opts = {"dataset": "flair", "size": "medium", "phase": "finetune",
            "bs": 32}
    for a in argv:
        if a.startswith("--") and "=" in a:
            k, v = a[2:].split("=", 1)
            opts[k] = int(v) if k == "bs" else v
        else:
            msg = f"unexpected argument {a!r}"
            raise SystemExit(msg)
    return opts


def main(argv) -> None:
    opts = _args(argv)
    import jax
    import jax.numpy as jnp

    from maestro_tpu.conf import DatasetsConfig, MaskConfig, ModelConfig
    from maestro_tpu.models.mae import build_model
    from maestro_tpu.quant import make_quant_predict_fn, quantize_params
    from maestro_tpu.serve import make_predict_fn
    from maestro_tpu.utils.testing import make_synthetic_batch

    datasets = DatasetsConfig(name_dataset=opts["dataset"])
    model, plan = build_model(
        datasets, MaskConfig(),
        ModelConfig(model_size=opts["size"], fusion_mode="group",
                    inter_depth=3),
    )
    batches = [
        {k: jax.device_put(jnp.asarray(v))
         for k, v in make_synthetic_batch(datasets.dataset, opts["bs"],
                                          seed=s).items()}
        for s in (0, 1)
    ]
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, opts["phase"]),
    )(batches[0])
    qparams = quantize_params(params)

    tokens = sum(s.seq_len * s.batch_factor for s in plan.streams.values())
    results = {}
    for tag, fn, p in (
        ("fp", make_predict_fn(model, opts["phase"]), params),
        ("int8", make_quant_predict_fn(model, opts["phase"]), qparams),
    ):
        for i in range(WARMUP):
            out = fn(p, batches[i % 2])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(STEPS):
            out = fn(p, batches[i % 2])
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / STEPS
        results[tag] = dt
        print(json.dumps({
            "metric": f"serve_{tag}_{opts['size']}_{opts['phase']}_{opts['dataset']}",
            "value": round(opts["bs"] / dt, 2),
            "unit": "samples/s/chip",
            "aux": {"step_time_s": round(dt, 4), "batch_size": opts["bs"],
                    "tokens_per_sample": tokens,
                    "device": str(jax.devices()[0])},
        }))
    print(json.dumps({
        "metric": "serve_int8_speedup",
        "value": round(results["fp"] / results["int8"], 3),
        "unit": "x",
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
