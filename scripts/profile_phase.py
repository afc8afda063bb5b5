"""Capture an on-device xprof trace of a train step and summarize op time.

Usage::

    python scripts/profile_phase.py [pretrain|probe|finetune] [batch_size]

Runs the same step construction as bench.py (alternating two distinct
batches -- the axon tunnel memoizes identical-buffer executions), captures a
``jax.profiler`` trace of TRACE_STEPS steps, then parses the Chrome-trace
export and prints per-op and per-bucket device time per step.

The reference has no profiler surface (SURVEY.md section 5.1); this script is
TPU-first tooling layered on maestro_tpu.utils.profiling.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

PHASE = sys.argv[1] if len(sys.argv) > 1 else "finetune"
BS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
DATASET = os.environ.get("BENCH_DATASET", "flair")
# r5 finetune recipe is no-remat (bs32 fits; remat=mlp cost its own time back)
REMAT = os.environ.get("BENCH_REMAT", "false")
REMAT = False if REMAT.lower() == "false" else REMAT
TRACE_STEPS = 4
LOGDIR = os.environ.get("PROFILE_DIR", f"/tmp/prof_{PHASE}_bs{BS}")


def build_step():
    from maestro_tpu.conf import (
        DatasetsConfig,
        MaskConfig,
        ModelConfig,
        OptPretrainConfig,
    )
    from maestro_tpu.models.mae import build_model
    from maestro_tpu.train import metrics as M
    from maestro_tpu.train.optim import make_optimizer
    from maestro_tpu.train.state import TrainState
    from maestro_tpu.train.steps import make_pretrain_step, make_supervised_step
    from maestro_tpu.utils.testing import make_synthetic_batch

    datasets = DatasetsConfig(name_dataset=DATASET)
    model, plan = build_model(
        datasets, MaskConfig(),
        ModelConfig(model_size=os.environ.get("BENCH_SIZE", "medium"),
                    fusion_mode="group", inter_depth=3,
                    seg_chunk_rows=int(os.environ.get(
                        "BENCH_SEG_CHUNK", 4 if PHASE == "finetune" else 2)),
                    seg_unroll=int(os.environ.get("BENCH_SEG_UNROLL", 1))),
        remat=REMAT,
    )
    # match bench.py's supervised-phase default: bf16-staged image streams
    in_dtype = os.environ.get(
        "BENCH_INPUT_DTYPE",
        "bfloat16" if PHASE in ("probe", "finetune") else "float32")

    def _stage(v):
        arr = jnp.asarray(v)
        if in_dtype == "bfloat16" and arr.dtype == jnp.float32:
            arr = arr.astype(jnp.bfloat16)
        return jax.device_put(arr)

    batches = [
        {k: _stage(v)
         for k, v in make_synthetic_batch(datasets.dataset, BS, seed=s).items()}
        for s in (0, 1)
    ]
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, "pretrain"),
    )(batches[0])
    opt = OptPretrainConfig(batch_size=BS)
    if PHASE == "pretrain":
        tx = make_optimizer(opt, "pretrain", total_steps=1000, params=params)
        state = TrainState.create(params, tx)
        step = make_pretrain_step(model, plan, tx, "l1_norm", donate=True)

        def run(state, b, i):
            return step(state, b, jax.random.fold_in(key, i))[0]
    else:
        probe_params = jax.jit(
            lambda b: model.init({"params": key, "mask": key}, b, PHASE),
        )(batches[0])
        params = {"params": {**probe_params["params"], **params["params"]}}
        tx = make_optimizer(opt, PHASE, total_steps=1000, params=params)
        state = TrainState.create(params, tx)
        sup = make_supervised_step(model, PHASE, tx, donate=True)
        metric_states = {
            hs.name: M.metric_init(hs.type_target, hs.num_classes)
            for hs in model.head_specs
        }

        def run(state, b, i):
            return sup(state, b, metric_states)[0]

    return run, state, batches


def summarize(logdir: str, n_steps: int) -> None:
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found under", logdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device op events live on the TensorCore pid/tid (pid 3 tid 3 on this
    # tunnel); fall back to the pid with the largest total op duration
    by_pidtid = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            by_pidtid[(e.get("pid"), e.get("tid"))] += e["dur"]
    if not by_pidtid:
        print("no duration events in", path)
        return
    # the busiest (pid, tid) that is NOT a python/host thread: device ops have
    # short names like fusion.N / copy.N; host threads have huge wall spans
    cand = sorted(by_pidtid, key=by_pidtid.get, reverse=True)
    dev = None
    for pt in cand:
        names = {e["name"] for e in events
                 if e.get("pid") == pt[0] and e.get("tid") == pt[1]
                 and e.get("ph") == "X"}
        if any(n.startswith(("fusion", "copy", "custom-call", "loop_"))
               or ".fusion" in n for n in names):
            dev = pt
            break
    dev = dev or cand[0]
    ops = defaultdict(float)
    counts = defaultdict(int)
    t_min, t_max = float("inf"), 0.0
    for e in events:
        if (e.get("pid"), e.get("tid")) == dev and e.get("ph") == "X":
            ops[e["name"]] += e["dur"]
            counts[e["name"]] += 1
            t_min = min(t_min, e["ts"])
            t_max = max(t_max, e["ts"] + e["dur"])
    total = sum(ops.values())
    print(f"trace: {path}")
    print(f"device (pid,tid)={dev}  busy={total / 1e3 / n_steps:.1f} ms/step  "
          f"window={(t_max - t_min) / 1e3 / n_steps:.1f} ms/step")

    def bucket(name: str) -> str:
        n = name.lower()
        if "attention" in n or "flash" in n or "mha" in n or n.startswith("attn"):
            return "attention-kernels"
        if n.startswith("copy") or "copy" in n:
            return "copies"
        if "layer_norm" in n or "layernorm" in n or "reduce" in n:
            return "reduce/LN fusions"
        if n.startswith(("fusion", "loop_fusion", "input_fusion", "output_fusion")):
            return "fusions (matmul+elementwise)"
        if "custom-call" in n or "pallas" in n or "tpu_custom_call" in n:
            return "custom-calls (pallas)"
        if "convert" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
            return "layout/convert"
        if "dynamic" in n or "gather" in n or "scatter" in n or "sort" in n:
            return "gather/scatter/sort"
        return "other"

    buckets = defaultdict(float)
    for name, dur in ops.items():
        buckets[bucket(name)] += dur
    print("\n-- buckets (ms/step) --")
    for name, dur in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{dur / 1e3 / n_steps:8.2f}  {name}")
    print("\n-- top 25 ops (ms/step) --")
    for name, dur in sorted(ops.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{dur / 1e3 / n_steps:8.2f}  x{counts[name]:<4d} {name}")


def main() -> None:
    run, state, batches = build_step()
    for i in range(3):
        state = run(state, batches[i % 2], i)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    jax.profiler.start_trace(LOGDIR)
    for i in range(TRACE_STEPS):
        state = run(state, batches[i % 2], 100 + i)
    jax.block_until_ready(state.params)
    jax.profiler.stop_trace()
    dt = (time.perf_counter() - t0) / TRACE_STEPS
    print(f"{PHASE} bs{BS} {DATASET} remat={REMAT}: {dt * 1e3:.1f} ms/step "
          f"(traced window, incl. profiling overhead)")
    summarize(LOGDIR, TRACE_STEPS)


if __name__ == "__main__":
    main()
