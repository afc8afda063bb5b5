"""Joint multi-dataset MAE pretraining CLI (beyond the reference).

Usage::

    python scripts/joint_pretrain.py OUT_DIR \
        --datasets=flair:/data/flair,s2_naip:/data/s2naip \
        model.model_size=medium model.fusion_mode=group model.inter_depth=3 \
        opt_pretrain.epochs=20 opt_pretrain.batch_size=32 \
        [--resume] [group.field=value...]

``--resume`` restores the newest ``pretrain-epoch=N`` checkpoint under
OUT_DIR/checkpoints (full state: params, optimizer moments, step) and
continues at epoch N+1.

Trains one union parameter tree on several datasets simultaneously
(maestro_tpu.train.joint): per-dataset jitted steps alternate round-robin
over each dataset's loader, modules with matching paths (name_embed-aliased
patch embeds, per-group encoders, the shared trunk) are literally shared,
and a full-state checkpoint is written per epoch.  The result warm-starts
any per-dataset probe/finetune via ``run.load_ckpt_path`` exactly like a
single-dataset pretrain checkpoint (strict=False merge).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv: list[str]) -> None:
    out_dir = None
    pairs = None
    resume = False
    overrides = []
    for arg in argv:
        if arg.startswith("--datasets="):
            pairs = [
                (p.split(":", 1) + [""])[:2]
                for p in arg.split("=", 1)[1].split(",")
            ]
        elif arg == "--resume":
            resume = True
        elif "=" in arg:
            overrides.append(arg)
        elif out_dir is None:
            out_dir = Path(arg)
        else:
            msg = f"unexpected argument {arg!r}"
            raise SystemExit(msg)
    if out_dir is None or not pairs:
        raise SystemExit(__doc__)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from main import parse_cli

    from maestro_tpu.data.loader import make_loader
    from maestro_tpu.train import checkpoint as ckpt
    from maestro_tpu.train.joint import (
        build_joint,
        init_joint_params,
        make_joint_pretrain_steps,
        shared_param_paths,
    )
    from maestro_tpu.train.optim import make_optimizer
    from maestro_tpu.train.state import TrainState

    cfgs, datasets_list = [], []
    for name, root in pairs:
        ov = [f"datasets.name_dataset={name}"]
        if root:
            ov.append(f"datasets.root_dir={root}")
        cfg, datasets = parse_cli(ov + overrides)
        cfgs.append(cfg)
        datasets_list.append(datasets)
    cfg = cfgs[0]  # shared run/model/opt config

    opt = cfg.opt_pretrain
    if opt.accumulate_grad_batches > 1:
        msg = "opt_pretrain.accumulate_grad_batches is not supported by the joint path"
        raise SystemExit(msg)
    # model.use_ema is ignored: EMA weights are a finetune-eval concept and
    # pretrain checkpoints' EMA is never consumed downstream

    from maestro_tpu.parallel.mesh import (
        make_mesh,
        num_batch_shards,
        shard_batch,
        shard_params,
    )

    mesh = make_mesh(cfg.trainer.mesh_data, cfg.trainer.mesh_model,
                     cfg.trainer.mesh_replica)
    jcfgs, models, plans = build_joint(
        datasets_list, cfg.mask, cfg.model,
        dtype=jnp.bfloat16 if cfg.trainer.compute_dtype == "bfloat16"
        else jnp.float32,
        remat=cfg.trainer.remat,
    )
    global_batch = opt.batch_size * num_batch_shards(mesh)
    loaders = [
        make_loader(dc, cfg.data, "train", "pretrain", global_batch,
                    seed=cfg.run.seed)[1]
        for dc in jcfgs
    ]
    for dc, ld in zip(jcfgs, loaders):
        if len(ld) == 0:
            msg = (
                f"dataset {dc.name_dataset} yields no batches at global "
                f"batch size {global_batch}; lower opt_pretrain.batch_size"
            )
            raise SystemExit(msg)
    batches0 = [
        shard_batch(mesh, {k: jnp.asarray(v)
                           for k, v in next(iter(ld)).items()})
        for ld in loaders
    ]
    union, templates = init_joint_params(models, batches0, seed=cfg.run.seed)
    union = shard_params(mesh, union, fsdp=cfg.trainer.fsdp)
    total_steps = sum(len(ld) for ld in loaders) * opt.epochs
    tx = make_optimizer(opt, "pretrain", total_steps, union,
                        num_devices=num_batch_shards(mesh),
                        skip_nonfinite=cfg.trainer.skip_nonfinite)
    steps = make_joint_pretrain_steps(models, plans, tx, union, templates,
                                      loss_type=cfg.model.loss)
    state = TrainState.create(union, tx)
    start_epoch = 0
    if resume:
        path = ckpt.find_latest_checkpoint(out_dir / "checkpoints", "pretrain")
        if path is None:
            msg = f"--resume: no pretrain-epoch=* checkpoint under {out_dir}"
            raise SystemExit(msg)
        state = ckpt.restore_state(path, state)
        done = ckpt.checkpoint_epoch(path)  # dir-name fallback if meta lost
        start_epoch = (done if done is not None else -1) + 1
        print(json.dumps({"resumed": str(path), "start_epoch": start_epoch}))
    n_shared = len(shared_param_paths(templates))
    print(json.dumps({
        "datasets": [d.name_dataset for d in jcfgs],
        "shared_param_leaves": n_shared,
        "total_steps": total_steps,
    }))

    rng = jax.random.PRNGKey(cfg.run.seed + 1)
    for epoch in range(start_epoch, opt.epochs):
        t0 = time.time()
        for ld in loaders:
            if hasattr(ld, "set_epoch"):
                ld.set_epoch(epoch)
        iters = [iter(ld) for ld in loaders]
        losses: list[list[float]] = [[] for _ in loaders]
        active = list(range(len(loaders)))
        while active:
            for i in list(active):  # round-robin over live iterators
                try:
                    np_batch = next(iters[i])
                except StopIteration:
                    active.remove(i)
                    continue
                batch = shard_batch(
                    mesh, {k: jnp.asarray(v) for k, v in np_batch.items()},
                )
                state, logs = steps[i](state, batch, rng)
                losses[i].append(logs["loss_rec"])
        epoch_log = {
            "epoch": epoch,
            "time_s": round(time.time() - t0, 2),
            **{
                f"loss_rec/{jcfgs[i].name_dataset}": float(
                    np.mean([float(l) for l in jax.device_get(ls)]),
                )
                for i, ls in enumerate(losses) if ls
            },
        }
        print(json.dumps(epoch_log))
        ckpt.save_checkpoint(out_dir / "checkpoints", "pretrain", epoch,
                             state, extra={"epoch": epoch,
                                           "joint": [d.name_dataset
                                                     for d in jcfgs]})


if __name__ == "__main__":
    main(sys.argv[1:])
