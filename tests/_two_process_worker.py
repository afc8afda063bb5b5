"""Subprocess worker for test_two_process_distributed.py.

Runs one probe-phase experiment over the TreeSatAI fixture on an 8-device
CPU mesh, either as one of N ``jax.distributed`` processes (each hosting
8//N virtual devices and loading its disjoint slice of the global batch) or
single-process (the golden reference).  Process 0 dumps the per-epoch loss
history + val/test metrics to a JSON file for the parent test to compare.

Usage:
  python _two_process_worker.py <out.json> <data_root> <workdir> \
      --process-id I --num-processes N --port P
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_json")
    ap.add_argument("data_root")
    ap.add_argument("workdir")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--port", type=int, default=0)
    args = ap.parse_args()

    n_local = 8 // args.num_processes
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_local}"
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.num_processes > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    assert jax.device_count() == 8, jax.device_count()

    from maestro_tpu.conf import (
        DataConfig,
        DatasetsConfig,
        ExperimentConfig,
        MaskConfig,
        ModelConfig,
        OptFinetuneConfig,
        OptPretrainConfig,
        OptProbeConfig,
        RunConfig,
        TrainerConfig,
    )
    from maestro_tpu.train.runtime import run_experiment

    datasets = DatasetsConfig(root_dir=args.data_root, name_dataset="treesatai_ts")
    datasets.treesatai_ts.rel_dir = ""
    cfg = ExperimentConfig(
        run=RunConfig(exp_dir=args.workdir, exp_name="twoproc", seed=7,
                      logged_images_per_epoch=1),
        opt_pretrain=OptPretrainConfig(epochs=0),
        # probe: supervised, no masking RNG -> the global-batch loss mean is
        # invariant to the host-sharded sample permutation (order[p::N]
        # blocks reassemble into the same global-batch sample SETS)
        opt_probe=OptProbeConfig(epochs=2, batch_size=1),
        opt_finetune=OptFinetuneConfig(epochs=0),
        data=DataConfig(num_workers=2, loader="threads",
                        use_transform=False, random_dates=False),
        mask=MaskConfig(),
        model=ModelConfig(model_size="micro", fusion_mode="group",
                          inter_depth=1, use_ema=False),
        # probe_eval_cache off: the cache is single-process-only, so the
        # n=1 reference run would otherwise eval epoch 1 through the
        # (numerically reassociated) head-only path while n=2 cannot —
        # the tiny fixture's AP histogram then flips a bin (~0.03).  This
        # test is about the multi-host machinery, so pin both runs to the
        # full eval path.
        trainer=TrainerConfig(mesh_data=8, mesh_model=1,
                              compute_dtype="float32",
                              probe_eval_cache=False),
    )
    results = run_experiment(cfg, datasets, Path(args.workdir) / "work")

    if jax.process_index() == 0:
        res = results["probe"]
        payload = {
            "history": res.history,
            "val": res.val_metrics,
            "test": res.test_metrics,
            "num_processes": args.num_processes,
        }
        Path(args.out_json).write_text(json.dumps(payload, default=float))
    # all processes must exit cleanly for the parent's returncode checks
    if args.num_processes > 1:
        jax.distributed.shutdown()
    sys.exit(0)


if __name__ == "__main__":
    main()
