"""Training runtime: epoch loop, eval, checkpointing, phase orchestration.

TPU-native replacement for the reference's Lightning stack
(/root/reference/maestro/train/trainer.py + run_experiment.py): three explicit
phases (pretrain -> probe -> finetune) share one model; each phase builds its
optimizer with phase-dependent freezing, runs a jitted step in a plain epoch
loop, evaluates with CM-based metrics, EMA-updates per epoch, checkpoints per
epoch (monitor=max + early stopping for finetune), and tests on the best
checkpoint.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from maestro_tpu.conf.core import ExperimentConfig, OptConfig, OptFinetuneConfig
from maestro_tpu.conf.datasets import DatasetsConfig
from maestro_tpu.parallel.distributed import is_primary, local_batch_slice
from maestro_tpu.parallel.mesh import (
    batch_axes,
    num_batch_shards,
    batch_shardings,
    make_mesh,
    param_shardings,
    shard_batch,
    shard_params,
)
from maestro_tpu.specs.fusion import FusionPlan
from maestro_tpu.train import checkpoint as ckpt
from maestro_tpu.train import metrics
from maestro_tpu.train import preempt
from maestro_tpu.train.optim import make_optimizer, onecycle
from maestro_tpu.train.state import TrainState, ema_momentum, ema_update
from maestro_tpu.train.steps import (
    compute_metrics,
    init_metric_states,
    make_pretrain_eval_step,
    make_pretrain_multistep,
    make_pretrain_step,
    make_supervised_eval_step,
    make_supervised_step,
)

log = logging.getLogger("maestro_tpu")


@dataclass
class PhaseResult:
    phase: str
    epochs_run: int
    best_epoch: int
    best_monitor: float | None
    val_metrics: dict[str, Any] = field(default_factory=dict)
    test_metrics: dict[str, Any] = field(default_factory=dict)
    history: list[dict] = field(default_factory=list)


def _check_resume_loader(meta: dict, data_cfg) -> None:
    """Refuse to resume an interrupted epoch under a different loader.

    The ``batches_done`` fast-forward replays the per-(seed, epoch) sample
    order; both shipped loaders now produce the identical shuffle-then-stride
    partition, but the recorded choice is still enforced so a future loader
    (or a version drift) can never silently retrain / skip samples.
    """
    saved = meta.get("loader")
    if not (meta.get("interrupted") and saved):
        return
    from maestro_tpu.data.loader import resolve_loader

    current = resolve_loader(data_cfg)
    if saved != current:
        msg = (
            f"checkpoint was interrupted under data.loader={saved!r} but "
            f"this run resolves to {current!r}; set data.loader={saved!r} "
            "to resume (the batches_done fast-forward assumes the recorded "
            "loader's sample order)"
        )
        raise ValueError(msg)


_TORCH_SUFFIXES = (".pt", ".pth", ".ckpt", ".bin", ".safetensors")


def _resolve_pretrained_path(path: str, is_baseline: bool) -> str:
    """Validate ``model.pretrained_path`` (FM released-weights warm start).

    The reference passes pretrained_path straight into each adapter's torch
    loader (e.g. croma.py:386-436); here the torch->flax surgery runs once
    offline (scripts/port_fm.py) and training consumes the resulting orbax
    checkpoint — this fails LOUDLY rather than silently ignoring the config.
    """
    if not is_baseline:
        msg = (
            "model.pretrained_path is consumed by baseline FM adapters; for "
            "flagship MAE checkpoints use run.load_name / run.load_ckpt_path "
            "(reference run_experiment.py:66-74 load_from_checkpoint)."
        )
        raise ValueError(msg)
    p = Path(path)
    if p.suffix.lower() in _TORCH_SUFFIXES:
        msg = (
            f"model.pretrained_path={path!r} looks like a torch checkpoint; "
            "port it first: python scripts/port_fm.py --ckpt <file> --out "
            "<dir> model.model=... , then set model.pretrained_path="
            "<dir>/fm-epoch=0"
        )
        raise ValueError(msg)
    if not (p / "state").exists():
        msg = (
            f"model.pretrained_path={path!r} has no 'state' subdirectory — "
            "expected an orbax checkpoint emitted by scripts/port_fm.py"
        )
        raise FileNotFoundError(msg)
    return str(p)


class Experiment:
    """One experiment = one model trained through up to three phases."""

    def __init__(
        self,
        cfg: ExperimentConfig,
        datasets: DatasetsConfig,
        workdir: str | Path = "runs/debug",
    ) -> None:
        self.cfg = cfg
        self.datasets = datasets
        self.workdir = Path(workdir)
        self.workdir.mkdir(parents=True, exist_ok=True)

        from maestro_tpu.models.factory import build_experiment_model

        self.model, self.plan, self.is_baseline = build_experiment_model(
            datasets, cfg,
        )
        self.mesh = make_mesh(cfg.trainer.mesh_data, cfg.trainer.mesh_model,
                              cfg.trainer.mesh_replica)
        self.params = None  # lazily initialized per phase (heads appear on use)
        self._warm_start: str | None = None  # load_* weights-only path
        if cfg.model.pretrained_path:
            self._warm_start = _resolve_pretrained_path(
                cfg.model.pretrained_path, self.is_baseline,
            )
        self._writer = None
        self._saver = None  # lazy AsyncSaver (trainer.async_checkpoint)
        self._viz_fns: dict[str, Any] = {}  # jitted per-phase viz forwards
        self._trackers = None  # lazy, rank-0 only (see train/tracking.py)

    # ------------------------------------------------------------------
    def _save_ckpt(self, phase: str, epoch: int, state, extra: dict):
        if self.cfg.trainer.async_checkpoint:
            if self._saver is None:
                self._saver = ckpt.AsyncSaver()
            return self._saver.save(
                self.workdir / "checkpoints", phase, epoch, state, extra=extra,
            )
        return ckpt.save_checkpoint(
            self.workdir / "checkpoints", phase, epoch, state, extra=extra,
        )

    def _ckpt_barrier(self) -> None:
        """Join in-flight async saves (before restore / phase handoff)."""
        if self._saver is not None:
            self._saver.wait()

    def close(self, *, trackers: bool = True) -> None:
        """Release the async checkpointer thread and the TB writer.

        ``trackers=False`` keeps external trackers alive across phases:
        run_experiment calls this between phases (a ClearML-style tracker
        must see ONE session per run, like the reference's single rank-0
        task, reference run_experiment.py:41-64) and closes trackers once
        after the phase loop.
        """
        if self._saver is not None:
            self._saver.close()
            self._saver = None
        if self._writer is not None:
            self._writer.close()
            self._writer = None
        if trackers and self._trackers is not None:
            for t in self._trackers:
                try:
                    t.close()
                except Exception:
                    log.exception(
                        "external tracker %s raised in close(); ignoring",
                        type(t).__name__,
                    )
            self._trackers = None

    # ------------------------------------------------------------------
    @property
    def writer(self):
        """TensorBoard writer; a no-op sink on non-primary processes."""
        if self._writer is None:
            if not is_primary():
                self._writer = _NullWriter()
                return self._writer
            # pure-Python event writer (utils/tb.py): tensorboardX would
            # import torch (~40 s of startup on a 1-core host)
            from maestro_tpu.utils.tb import SummaryWriter

            self._writer = SummaryWriter(str(self.workdir / "tb"))
        return self._writer

    def _log_scalar(self, tag: str, value: float, step: int) -> None:
        self.writer.add_scalar(tag, value, step)

    def _append_jsonl(self, record: dict) -> None:
        """Experiment tracking (ClearML-equivalent sink), rank 0.

        Always writes metrics.jsonl; an optional external tracker
        (run.tracker / $MAESTRO_TRACKER) receives the same records — see
        train/tracking.py.
        """
        if not is_primary():
            return
        if self._trackers is None:
            from dataclasses import asdict

            from maestro_tpu.train.tracking import build_trackers

            self._trackers = build_trackers(
                self.workdir, asdict(self.cfg), self.cfg.run.tracker,
            )
        # External trackers are best-effort (tracking.py's guarantee: a
        # broken SaaS integration must never take down a multi-day run).
        # The built-in JsonlTracker stays unguarded — losing the metrics
        # record of a run IS an error worth surfacing.
        from maestro_tpu.train.tracking import JsonlTracker

        failed = []
        for t in self._trackers:
            if isinstance(t, JsonlTracker):
                t.log_record(record)
                continue
            try:
                t.log_record(record)
            except Exception:
                log.exception(
                    "external tracker %s raised in log_record(); disabling "
                    "it for the rest of the run (jsonl/TB sinks continue)",
                    type(t).__name__,
                )
                failed.append(t)
        for t in failed:
            self._trackers.remove(t)

    def _log_images(self, phase, epoch, state, np_batch, rng) -> None:
        """Per-epoch image logging (reference train/logger.py ImageLogger).

        Logs up to ``run.logged_images_per_epoch`` samples from one fixed val
        batch (fetched once per phase by fit_phase, not per epoch).
        """
        from maestro_tpu.train.logging import EpochImageLogger

        # the viz forward runs over globally-sharded params/batch: jit over a
        # multi-host mesh is a collective program, so EVERY process must
        # enter it (an is_primary() gate here deadlocks the pod); only the
        # TB writing below is primary-only.
        batch = self._device_batch(np_batch)
        if phase == "pretrain":
            out = self._viz_forward("pretrain")(state.params, batch, rng)
        else:
            out = self._viz_forward(phase)(state.params, batch)
        if jax.process_count() > 1:
            # materialize the non-addressable shards before indexing
            from jax.experimental import multihost_utils

            out = multihost_utils.process_allgather(out, tiled=True)
        if not is_primary():
            return
        # global sample i == process-0-local sample i (batch sharding is
        # contiguous in process order), so local np_batch provides the raw
        # input images for the first n_samples
        n_samples = min(
            self.cfg.run.logged_images_per_epoch,
            np_batch[self.datasets.dataset.log_inputs[0]].shape[0],
        )
        logger = EpochImageLogger(
            self.writer, self.datasets.dataset.log_inputs,
            self.cfg.run.logged_images_per_epoch,
        )
        if phase == "pretrain":
            pixels, masks, targets = out
            for i in range(n_samples):
                logger.log_reconstruction(
                    phase, "val", epoch, targets, pixels, masks, sample=i,
                )
            return
        logits = out
        for hs in self.model.head_specs:
            if hs.type_target != "segment":
                continue
            for i in range(n_samples):
                image = np_batch[self.datasets.dataset.log_inputs[0]][i, 0]
                logger.log_segmentation(
                    phase, "val", epoch, hs.name, image,
                    np.asarray(logits[hs.name][i, 0]),
                    np_batch[hs.name][i, 0, 0],
                    hs.num_classes, hs.missing_val, sample=i,
                )

    def _viz_forward(self, phase: str):
        """Jitted forward for image logging — an eager ``model.apply`` here
        would run the whole network op-by-op once per epoch."""
        fn = self._viz_fns.get(phase)
        if fn is None:
            if phase == "pretrain":
                fn = jax.jit(
                    lambda p, b, r: self.model.apply(
                        p, b, "pretrain", rngs={"mask": r},
                    ),
                )
            else:
                fn = jax.jit(lambda p, b: self.model.apply(p, b, phase))
            self._viz_fns[phase] = fn
        return fn

    def _log_confusion(self, phase, stage, epoch, metric_states) -> None:
        """CM heatmaps to TB + .npy dumps (reference train/logger.py:143-305)."""
        from maestro_tpu.train.logging import (
            confusion_matrix_image,
            dump_confusion_matrix,
        )

        if not is_primary() or metric_states is None:
            return
        for hs in self.model.head_specs:
            st = metric_states[hs.name]
            if isinstance(st, dict) and "hi" in st:  # mono-label two-limb CM
                cm = metrics.monolabel_cm(st)
            else:  # multilabel per-label 2x2
                cm = np.asarray(st["cm"])
            dump_confusion_matrix(
                cm,
                self.workdir / "cm" / f"{phase}_{stage}_{hs.name}_epoch{epoch}.npy",
            )
            if cm.ndim == 2:  # mono-label CxC matrix -> heatmap image
                self.writer.add_image(
                    f"{phase}_{hs.name}_{stage}/confusion_matrix",
                    confusion_matrix_image(cm), epoch,
                )

    # ------------------------------------------------------------------
    def init_params(self, phase: str, batch: dict, seed: int):
        key = jax.random.PRNGKey(seed)

        def init_fn(b):
            return self.model.init({"params": key, "mask": key}, b, phase)

        # initialize directly into the target shardings: with fsdp, a
        # replicated init would peak at full-model memory per device before
        # shard_params — defeating ZeRO exactly for the models that need it
        shapes = jax.eval_shape(init_fn, batch)
        shardings = param_shardings(self.mesh, shapes,
                                    fsdp=self.cfg.trainer.fsdp)
        fresh = jax.jit(init_fn, out_shardings=shardings)(batch)
        if self.params is not None:
            # carry weights forward between phases (strict=False merge)
            fresh = _merge_params(self.params, fresh)
        elif self._warm_start:
            unmatched: list = []
            fresh = ckpt.load_weights(self._warm_start, fresh, unmatched)
            log.info("warm-started weights from %s (%d leaves kept fresh "
                     "init)", self._warm_start, len(unmatched))
        return fresh

    def _stage_dtype(self, v):
        """Cast one host array to its staging dtype (trainer.input_dtype).

        "auto" engages bf16 staging for SUPERVISED phases only: there the
        float streams are images feeding a bf16 trunk (labels are integer),
        so staging in bf16 just moves the in-step cast to the host and
        halves the transfer — the reference's 16-mixed autocast consumes
        them in half precision the same way.  Pretrain inputs double as the
        reconstruction TARGETS (patch-group-norm statistics), so "auto"
        leaves them fp32; "bfloat16" forces the cast everywhere.
        """
        cfg = self.cfg.trainer
        bf16 = cfg.input_dtype == "bfloat16" or (
            cfg.input_dtype == "auto"
            and cfg.compute_dtype == "bfloat16"
            and getattr(self, "_staging_phase", None) in ("probe", "finetune")
        )
        if bf16 and v.dtype == np.float32:
            return v.astype(jnp.bfloat16)
        return v

    def _device_batch(self, np_batch: dict) -> dict:
        if jax.process_count() > 1:
            # each host loaded a disjoint slice of the global batch; assemble
            # the global sharded arrays from the process-local data
            np_batch = {k: self._stage_dtype(np.asarray(v))
                        for k, v in np_batch.items()}
            shardings = batch_shardings(self.mesh, np_batch)
            return {
                k: jax.make_array_from_process_local_data(shardings[k], v)
                for k, v in np_batch.items()
            }
        batch = {
            k: jnp.asarray(self._stage_dtype(np.asarray(v)))
            for k, v in np_batch.items()
        }
        return shard_batch(self.mesh, batch)

    # ------------------------------------------------------------------
    def fit_phase(
        self,
        phase: str,
        opt: OptConfig,
        train_loader,
        val_loader=None,
        test_loader=None,
        resume_path: str | None = None,
    ) -> PhaseResult:
        """Train one phase; returns metrics history and best checkpoint info."""
        cfg = self.cfg
        seed = cfg.run.seed
        self._staging_phase = phase  # input_dtype="auto" keys off the phase
        monitor = getattr(opt, "monitor", None)
        patience = getattr(opt, "patience", None)

        # eval_only may legitimately run without a train split
        src_loader = next(
            (ld for ld in (train_loader, val_loader, test_loader)
             if ld is not None),
        )
        first = next(iter(src_loader))
        batch0 = self._device_batch(first)
        params = self.init_params(phase, batch0, seed)
        params = shard_params(self.mesh, params, fsdp=cfg.trainer.fsdp)

        rng = jax.random.PRNGKey(seed + 1)
        if cfg.run.eval_only:
            return self._eval_only_phase(phase, params, val_loader,
                                         test_loader, rng)

        steps_per_epoch = max(len(train_loader) // opt.accumulate_grad_batches, 1)
        total_steps = steps_per_epoch * opt.epochs
        # LR scaling counts data-parallel replicas only (reference scales by
        # num_nodes * num_devices, train/model.py:123-133)
        num_replicas = num_batch_shards(self.mesh)
        # frozen baseline backbones train heads only, like probing
        freeze_phase = (
            "probe" if (self.is_baseline and cfg.model.freeze and phase != "pretrain")
            else phase
        )
        tx = make_optimizer(
            opt, freeze_phase, total_steps, params, num_replicas,
            lw_decay=getattr(opt, "lw_decay", None),
            skip_nonfinite=cfg.trainer.skip_nonfinite,
        )
        lr_schedule = onecycle(opt, total_steps, num_replicas)
        state = TrainState.create(params, tx, use_ema=cfg.model.use_ema)
        self.params = None  # freed into state

        start_epoch, resume_skip = 0, 0
        if resume_path:
            state = ckpt.restore_state(resume_path, state)
            meta = ckpt.load_meta(resume_path)
            _check_resume_loader(meta, cfg.data)
            done = ckpt.checkpoint_epoch(resume_path)
            if done is not None:
                # a regular checkpoint marks a COMPLETED epoch -> continue at
                # the next one; a preemption checkpoint is mid-epoch -> finish
                # that epoch, fast-forwarding past the batches already trained
                # (per-epoch loader order is deterministic in (seed, epoch))
                start_epoch = done if meta.get("interrupted") else done + 1
                if meta.get("interrupted"):
                    resume_skip = int(meta.get("batches_done", 0))
            start_epoch = min(start_epoch, opt.epochs)
            log.info("resumed %s from %s (step=%d, starting epoch %d%s)",
                     phase, resume_path, int(state.step), start_epoch,
                     f", skipping {resume_skip} batches" if resume_skip else "")

        donate = cfg.trainer.donate_state
        multi_step = None
        if phase == "pretrain":
            train_step = make_pretrain_step(self.model, self.plan, tx,
                                            cfg.model.loss, donate=donate)
            if cfg.trainer.steps_per_dispatch > 1:
                multi_step = make_pretrain_multistep(
                    self.model, self.plan, tx, cfg.model.loss, donate=donate,
                )
            eval_step = make_pretrain_eval_step(self.model, self.plan,
                                                cfg.model.loss)
        else:
            train_step = make_supervised_step(self.model, phase, tx,
                                              donate=donate)
            eval_step = make_supervised_eval_step(
                self.model, phase, use_ema=(phase == "finetune"),
            )

        # frozen-trunk phases (probe; baseline finetune with freeze=True):
        # _run_eval_epoch pins the val loader to epoch 0, so the val batch
        # stream is identical every epoch and the frozen trunk's features of
        # it are constant — cache them and make later val epochs head-only.
        # A frozen trunk's EMA equals its params, so the finetune EMA eval
        # stays valid off the cached features.  A first-replay guard
        # (recompute batch 0, compare) backstops the invariance assumption.
        eval_cache = None
        if (
            freeze_phase == "probe"  # probe, or freeze=True baseline finetune
            and cfg.trainer.probe_eval_cache
            and val_loader is not None
            and opt.epochs - start_epoch > 1  # a single eval never re-reads
            and jax.process_count() == 1
            and hasattr(self.model, "encode_for_heads")
        ):
            from maestro_tpu.train.eval_cache import (
                ProbeEvalCache,
                clamp_device_cap,
            )
            from maestro_tpu.train.steps import (
                make_feature_step,
                make_head_eval_step,
            )

            eval_cache = ProbeEvalCache(
                feature_step=make_feature_step(self.model),
                head_step=make_head_eval_step(
                    self.model, phase, use_ema=(phase == "finetune"),
                ),
                label_keys=tuple(hs.name for hs in self.model.head_specs),
                cap_bytes=int(cfg.trainer.probe_eval_cache_gb * 2**30),
                device_cap_bytes=clamp_device_cap(
                    int(cfg.trainer.probe_eval_cache_device_gb * 2**30),
                ),
            )
        self._last_eval_cache = eval_cache  # observability (tests/debugging)

        result = PhaseResult(phase, 0, -1, None)
        best_monitor, best_epoch, best_path, stale = -np.inf, -1, None, 0
        warned_monitor = False
        viz_batch = (
            next(iter(val_loader))
            if val_loader is not None and cfg.run.logged_images_per_epoch > 0
            else None
        )

        for epoch in range(start_epoch, opt.epochs):
            t0 = time.time()
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            epoch_skip = resume_skip if epoch == start_epoch else 0
            if epoch_skip:
                if not (hasattr(train_loader, "skip_batches")
                        and hasattr(train_loader, "set_epoch")):
                    # silently retraining batches_done batches would corrupt
                    # the step count / LR schedule - fail loudly instead
                    msg = (
                        f"resuming an interrupted epoch needs a loader with "
                        f"set_epoch/skip_batches, got {type(train_loader)}"
                    )
                    raise TypeError(msg)
                train_loader.skip_batches = epoch_skip
            train_logs = self._run_train_epoch(
                phase, state, train_step, train_loader, rng,
                multi_step=multi_step,
                steps_per_dispatch=cfg.trainer.steps_per_dispatch,
            )
            state = train_logs.pop("state")
            batches_done = train_logs.pop("batches_done", 0) + epoch_skip

            if preempt.stop_requested():
                # graceful preemption: persist mid-epoch (before the
                # epoch-level EMA update - the epoch is incomplete) and stop;
                # run.fit_name/fit_phase resumes this epoch at batches_done
                from maestro_tpu.data.loader import resolve_loader

                path = self._save_ckpt(
                    phase, epoch, state,
                    extra={"epoch": epoch, "phase": phase,
                           "interrupted": True,
                           "batches_done": batches_done,
                           # batches_done fast-forward assumes the identical
                           # sample order — the resume must use this loader
                           "loader": resolve_loader(cfg.data)},
                )
                self._ckpt_barrier()  # durable before the process exits
                self.params = jax.tree.map(lambda x: x, state.params)
                raise preempt.Preempted(phase, str(path))

            if state.ema_params is not None:
                state = ema_update(state, ema_momentum(opt.epochs))

            val_logs, val_states = {}, None
            if val_loader is not None:
                val_logs, val_states = self._run_eval_epoch(
                    phase, state, eval_step, val_loader, rng,
                    cache=eval_cache,
                )

            epoch_log = {
                "epoch": epoch,
                "time_s": round(time.time() - t0, 2),
                # state.step counts micro-steps; the schedule (and optax's
                # inner count under MultiSteps) advances once per OPTIMIZER
                # step, i.e. every accumulate_grad_batches micro-steps
                "lr": float(lr_schedule(max(
                    int(state.step) // max(opt.accumulate_grad_batches, 1) - 1,
                    0,
                ))),
                **{f"train/{k}": v for k, v in train_logs.items()},
                **{f"val/{k}": v for k, v in _flat_metrics(val_logs).items()},
            }
            result.history.append(epoch_log)
            for k, v in epoch_log.items():
                if isinstance(v, (int, float)):
                    self._log_scalar(f"{phase}_{k}", v, epoch)
            self._append_jsonl({"phase": phase, **epoch_log})
            log.info("%s epoch %d: %s", phase, epoch, epoch_log)

            if phase != "pretrain":
                self._log_confusion(phase, "val", epoch, val_states)
            if viz_batch is not None:
                try:
                    self._log_images(phase, epoch, state, viz_batch, rng)
                except Exception:  # noqa: BLE001 - viz must never kill training
                    log.exception("image logging failed")

            # checkpoint + monitor
            score = (
                _lookup_monitor(val_logs, monitor, phase) if monitor else None
            )
            if monitor and val_logs and score is None and not warned_monitor:
                # a typo'd monitor would otherwise silently disable early
                # stopping and degrade test-on-best to test-on-last
                warned_monitor = True
                log.warning(
                    "monitor %r matches no val metric (available: %s); every "
                    "epoch counts as best and early stopping is inactive",
                    monitor, sorted(_flat_metrics(val_logs)),
                )
            path = self._save_ckpt(
                phase, epoch, state, extra={"epoch": epoch, "phase": phase},
            )
            if monitor is None or score is None or score > best_monitor:
                best_monitor = score if score is not None else -np.inf
                best_epoch, best_path, stale = epoch, path, 0
            else:
                stale += 1
            if patience is not None and monitor is not None and stale > patience:
                log.info("early stopping %s at epoch %d", phase, epoch)
                break

        result.epochs_run = len(result.history)
        result.best_epoch = best_epoch
        result.best_monitor = None if best_monitor == -np.inf else float(best_monitor)
        if val_loader is not None:
            if result.history:
                # the last loop iteration already evaluated this exact state
                result.val_metrics = _flat_metrics(val_logs)
            else:  # resume-complete: no epochs ran, so no in-loop eval did
                final_val, _ = self._run_eval_epoch(
                    phase, state, eval_step, val_loader, rng,
                )
                result.val_metrics = _flat_metrics(final_val)

        # test on best checkpoint
        self._ckpt_barrier()  # epoch saves must be committed before restore
        if test_loader is not None and best_path is not None:
            state = ckpt.restore_state(best_path, state)
            test_metrics, test_states = self._run_eval_epoch(
                phase, state, eval_step, test_loader, rng,
            )
            result.test_metrics = _flat_metrics(test_metrics)
            if phase != "pretrain":
                self._log_confusion(phase, "test", best_epoch, test_states)
            log.info("%s test: %s", phase, result.test_metrics)

        self.params = jax.tree.map(lambda x: x, state.params)
        return result

    # ------------------------------------------------------------------
    def _eval_only_phase(
        self, phase, params, val_loader, test_loader, rng,
    ) -> PhaseResult:
        """Score loaded weights on val/test without training (run.eval_only)."""
        cfg = self.cfg
        if phase == "pretrain":
            eval_step = make_pretrain_eval_step(self.model, self.plan,
                                                cfg.model.loss)
        else:
            eval_step = make_supervised_eval_step(
                self.model, phase, use_ema=(phase == "finetune"),
            )
        # finetune evaluates the EMA weights when the source checkpoint has
        # them (reference evaluates model_ema in finetune val/test)
        ema = None
        if phase == "finetune" and self._warm_start:
            ema = ckpt.load_ema_weights(self._warm_start, params)
            if ema is not None:
                log.info("eval_only: using EMA weights from %s",
                         self._warm_start)
        state = TrainState(
            step=jnp.zeros((), dtype=jnp.int32),
            params=params, opt_state=None, ema_params=ema,
        )

        result = PhaseResult(phase, 0, -1, None)
        if val_loader is not None:
            final_val, val_states = self._run_eval_epoch(
                phase, state, eval_step, val_loader, rng,
            )
            result.val_metrics = _flat_metrics(final_val)
            if phase != "pretrain":
                self._log_confusion(phase, "val", 0, val_states)
            log.info("%s eval-only val: %s", phase, result.val_metrics)
        if test_loader is not None:
            test_metrics, test_states = self._run_eval_epoch(
                phase, state, eval_step, test_loader, rng,
            )
            result.test_metrics = _flat_metrics(test_metrics)
            if phase != "pretrain":
                self._log_confusion(phase, "test", 0, test_states)
            log.info("%s eval-only test: %s", phase, result.test_metrics)
        self._append_jsonl({
            "phase": phase, "eval_only": True,
            **{f"val/{k}": v for k, v in (result.val_metrics or {}).items()},
            **{f"test/{k}": v for k, v in (result.test_metrics or {}).items()},
        })
        self.params = params
        return result

    # ------------------------------------------------------------------
    def _run_train_epoch(
        self, phase, state, train_step, loader, rng,
        multi_step=None, steps_per_dispatch: int = 1,
    ) -> dict:
        losses = []
        log_every = self.cfg.trainer.log_every_steps
        metric_states = (
            init_metric_states(self.model.head_specs) if phase != "pretrain" else None
        )
        if multi_step is not None and phase == "pretrain":
            # fuse K steps per host dispatch (amortizes dispatch latency)
            state, losses = self._run_scanned_epoch(
                state, multi_step, train_step, loader, rng, steps_per_dispatch,
            )
        else:
            # host-side step counter: reading state.step would block on the
            # async dispatch every iteration, serializing the next batch's
            # host->device transfer behind the previous step's compute
            step_i = int(jax.device_get(state.step))
            for np_batch in loader:
                if preempt.stop_requested():
                    break
                batch = self._device_batch(np_batch)
                if phase == "pretrain":
                    state, logs = train_step(state, batch, rng)
                else:
                    state, metric_states, logs = train_step(
                        state, batch, metric_states,
                    )
                losses.append(logs)
                step_i += 1
                if log_every > 0 and step_i % log_every == 0:
                    key = "loss_rec" if phase == "pretrain" else "loss_pred"
                    self._log_scalar(
                        f"{phase}_train/{key}_step", float(logs[key]), step_i,
                    )
        out = {
            k: float(np.mean([float(l[k]) for l in losses]))
            for k in (losses[0] if losses else {})
        }
        if metric_states is not None:
            out.update(_flat_metrics(
                compute_metrics(self.model.head_specs, metric_states),
            ))
        out["state"] = state
        # one loss entry per trained batch: the preemption checkpoint records
        # this so resume fast-forwards the loader past them
        out["batches_done"] = len(losses)
        return out

    def _run_scanned_epoch(
        self, state, multi_step, train_step, loader, rng, k: int,
    ) -> tuple[TrainState, list[dict]]:
        """Drive the epoch in K-step scanned dispatches; remainder singly."""
        losses: list[dict] = []
        pending: list[dict] = []
        for np_batch in loader:
            if preempt.stop_requested():
                pending = []
                break
            pending.append(np_batch)
            if len(pending) == k:
                stack = {
                    key: self._device_stack(
                        np.stack([np.asarray(b[key]) for b in pending]),
                    )
                    for key in pending[0]
                }
                state, loss_k = multi_step(state, stack, rng)
                losses.extend(
                    {"loss_rec": v} for v in np.asarray(loss_k).tolist()
                )
                pending = []
        for np_batch in pending:  # remainder < K
            batch = self._device_batch(np_batch)
            state, logs = train_step(state, batch, rng)
            losses.append(logs)
        return state, losses

    def _device_stack(self, v):
        """Shard a [K, B, ...] stacked super-batch over the data axis (dim 1)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(None, batch_axes(self.mesh), *(None,) * (v.ndim - 2))
        return jax.device_put(v, NamedSharding(self.mesh, spec))

    def _run_eval_epoch(self, phase, state, eval_step, loader, rng,
                        cache=None):
        """Returns (metrics dict, raw metric states or None).

        ``cache`` (frozen-trunk val only): a train.eval_cache.ProbeEvalCache.  On
        its first pass this loop computes trunk features per batch, runs the
        heads off them, and stores a host copy; once sealed, later epochs
        replay the cached features head-only without touching the loader.
        On the FIRST replay the guard recomputes batch 0's features through
        the loader and compares them to the cached entry — a mismatch (the
        val stream was not epoch-invariant after all) disables the cache
        with a warning and falls back to full per-epoch eval.

        Deliberate deviations from the reference (docs/PARITY.md):

        - pretrain val masking folds the same base ``rng`` by batch index
          every epoch, so every epoch evaluates the same mask draw.  The
          reference's Lightning loop advances its generator across epochs,
          making val loss a noisier monitor; a fixed draw makes
          epoch-over-epoch val deltas attributable to the model, not the
          mask lottery.  Set a per-epoch rng at the call site to recover
          reference behavior.
        - val/test loaders are PINNED to epoch 0 here, so every eval pass
          draws the identical batch stream: same shuffle order, same
          drop_last remainder, same per-sample date-window offsets
          (datasets.py ``t0`` is drawn from the per-(seed, epoch, idx) rng
          even with random_dates=False).  The reference re-rolls all of
          these per epoch via its global torch RNG (dataset/dataset.py's
          per-worker seeding advances every epoch), adding sampling
          variance to the monitoring signal.  The pin removes that noise
          AND is what makes the frozen-trunk feature cache exactly
          semantics-preserving rather than an approximation.
        """
        if hasattr(loader, "set_epoch"):
            loader.set_epoch(0)  # epoch-invariant eval stream (see above)
        # device scalars are collected and fetched once after the loop:
        # float()-ing them per step would block the async dispatch pipeline
        losses = []
        if phase == "pretrain":
            # DELIBERATE deviation from the reference: the mask RNG folds in
            # only the batch index, so val masking noise is IDENTICAL across
            # epochs — val loss_rec moves only when the model does (the
            # reference's global torch RNG re-rolls masks every epoch,
            # adding masking variance to the monitoring signal). Training
            # masks are unaffected (fresh rng per step via _run_train_epoch).
            for i, np_batch in enumerate(loader):
                batch = self._device_batch(np_batch)
                logs = eval_step(state.params, batch, jax.random.fold_in(rng, i))
                losses.append(logs["loss_rec"])
            losses = [float(l) for l in jax.device_get(losses)]
            return ({"loss_rec": float(np.mean(losses))} if losses else {}), None

        metric_states = init_metric_states(self.model.head_specs)
        if cache is not None and cache.ready and cache.hit_epochs == 0:
            # first replay only: one extra batch read + feature pass that
            # backstops the epoch-invariance premise independently of the
            # set_epoch pin above (a custom loader without set_epoch, or a
            # dataset with epoch-external randomness, would trip it)
            cache.verify_replay(state.params, loader, self._device_batch)
        if cache is not None and cache.ready:
            # head-only replay: the frozen trunk (and the raster reads
            # feeding it) are skipped entirely.  HBM-resident entries are
            # used as-is (zero transfer); host-spilled ones are put back.
            cache.hit_epochs += 1
            for entry in cache.entries:
                feats = entry.feats
                if not entry.on_device:
                    feats = shard_batch(
                        self.mesh, jax.tree.map(jnp.asarray, feats),
                    )
                labels = self._device_batch(entry.labels)
                metric_states, logs = cache.head_step(
                    state, feats, labels, metric_states,
                )
                losses.append(logs["loss_pred"])
        else:
            for np_batch in loader:
                batch = self._device_batch(np_batch)
                if cache is not None and not cache.disabled:
                    feats = cache.feature_step(state.params, batch)
                    labels = {k: batch[k] for k in cache.label_keys}
                    metric_states, logs = cache.head_step(
                        state, feats, labels, metric_states,
                    )
                    cache.store(
                        feats, {k: np_batch[k] for k in cache.label_keys},
                    )
                else:
                    metric_states, logs = eval_step(state, batch, metric_states)
                losses.append(logs["loss_pred"])
            if cache is not None:
                cache.seal()
        losses = [float(l) for l in jax.device_get(losses)]
        out: dict[str, Any] = compute_metrics(self.model.head_specs, metric_states)
        out["loss_pred"] = float(np.mean(losses)) if losses else 0.0
        return out, metric_states


# --------------------------------------------------------------------------
def resolve_run_handles(run) -> None:
    """Name-based checkpoint discovery (reference hydra_utils.py:17-48).

    ``run.load_name/load_phase[/load_uuid]`` resolve to the newest
    ``{phase}-epoch=N`` checkpoint under ``exp_dir/load_name[/load_uuid]``;
    same for ``fit_*``. Explicit ``*_ckpt_path`` values win.
    """
    for kind in ("load", "fit"):
        if getattr(run, f"{kind}_ckpt_path"):
            continue
        name = getattr(run, f"{kind}_name")
        if not name:
            continue
        base = Path(run.exp_dir) / name
        uid = getattr(run, f"{kind}_uuid")
        if uid:
            base = base / uid
        phase = getattr(run, f"{kind}_phase")
        path = ckpt.find_latest_checkpoint(base, phase)
        if path is None:
            msg = (
                f"run.{kind}_name={name!r}: no '{phase}-epoch=*' checkpoint "
                f"found under {base}"
            )
            raise FileNotFoundError(msg)
        setattr(run, f"{kind}_ckpt_path", str(path))
        log.info("resolved run.%s_name=%s -> %s", kind, name, path)


def run_experiment(
    cfg: ExperimentConfig,
    datasets: DatasetsConfig,
    workdir: str | Path | None = None,
) -> dict[str, PhaseResult]:
    """Sequence pretrain -> probe -> finetune (reference run_experiment.py)."""
    from maestro_tpu.data.loader import pin_loader
    from maestro_tpu.parallel.distributed import initialize_distributed

    initialize_distributed()  # no-op single-host; wires DCN rendezvous on pods
    preempt.install_handlers()  # SIGTERM/SIGINT -> checkpoint + clean exit
    resolve_run_handles(cfg.run)
    pin_loader(cfg.data)  # one loader per run, agreed across hosts

    workdir = Path(workdir or Path(cfg.run.exp_dir) / cfg.run.exp_name)
    exp = Experiment(cfg, datasets, workdir)

    # warm start from a previous experiment's weights (applied at first init)
    if cfg.run.load_ckpt_path:
        if exp._warm_start:
            msg = (
                "both run.load_ckpt_path and model.pretrained_path are set; "
                "pick one warm-start source"
            )
            raise ValueError(msg)
        exp._warm_start = cfg.run.load_ckpt_path

    results: dict[str, PhaseResult] = {}
    phase_opts = (
        ("pretrain", cfg.opt_pretrain),
        ("probe", cfg.opt_probe),
        ("finetune", cfg.opt_finetune),
    )
    try:
        _run_phases(cfg, datasets, exp, phase_opts, results)
    finally:
        exp.close()  # external trackers: one session per run (rank-0 task)
    return results


def _run_phases(cfg, datasets, exp, phase_opts, results) -> None:
    from maestro_tpu.data.loader import make_loader

    for phase, opt in phase_opts:
        if opt.epochs <= 0:
            continue
        if phase != "pretrain" and not datasets.dataset.targets:
            continue  # pretrain-only datasets (S2-NAIP)
        if phase == "pretrain" and exp.is_baseline:
            continue  # baseline adapters only probe/finetune
        # opt.batch_size is per data-parallel shard (reference: per device);
        # each host loads its process-local slice of the global batch
        global_batch = opt.batch_size * num_batch_shards(exp.mesh)
        local_batch = local_batch_slice(global_batch)
        loaders = {}
        for stage in ("train", "val", "test"):
            _, loaders[stage] = make_loader(
                datasets, cfg.data, stage, phase, local_batch,
                seed=cfg.run.seed,
                shard_index=jax.process_index(),
                shard_count=jax.process_count(),
            )
        resume = (
            cfg.run.fit_ckpt_path
            if cfg.run.fit_ckpt_path and cfg.run.fit_phase == phase
            else None
        )
        try:
            results[phase] = exp.fit_phase(
                phase, opt, loaders["train"], loaders["val"], loaders["test"],
                resume_path=resume,
            )
        except preempt.Preempted as p:
            log.warning(
                "%s — resume with run.fit_name=%s run.fit_phase=%s",
                p, cfg.run.exp_name, phase,
            )
            break
        finally:
            # saver thread + TB writer; re-created lazily per phase.
            # Trackers stay open across phases (closed by run_experiment).
            exp.close(trackers=False)


# --------------------------------------------------------------------------
def _merge_params(old, fresh):
    """strict=False carry-over of matching leaves between phase param trees."""
    old_flat = {
        tuple(str(getattr(k, "key", k)) for k in p): v
        for p, v in jax.tree_util.tree_flatten_with_path(old)[0]
    }

    def pick(path, leaf):
        key = tuple(str(getattr(k, "key", k)) for k in path)
        prev = old_flat.get(key)
        if prev is not None and prev.shape == leaf.shape:
            return prev.astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(pick, fresh)


def _flat_metrics(metrics: dict) -> dict[str, float]:
    out = {}
    for k, v in metrics.items():
        if isinstance(v, dict):
            for k2, v2 in v.items():
                out[f"{k}/{k2}"] = float(v2)
        elif isinstance(v, (int, float)):
            out[k] = float(v)
    return out


def _lookup_monitor(
    val_logs: dict, monitor: str, phase: str | None = None,
) -> float | None:
    """Resolve a monitor name against the val metrics, accepting every
    spelling the reference ecosystem uses.

    The reference documents ``monitor=treesat_mlc_thresh/weighted_f1_val``
    (conf/opt.py:43-45) and Lightning actually watches the
    phase-prefixed ``{phase}_{monitor}`` string (train/trainer.py:94-110);
    our metrics dict keys are the bare ``target/metric``.  All three forms
    (plus a ``_test`` suffix) resolve here, so a user pasting a reference
    config never gets a silently-disabled early stop.
    """
    flat = _flat_metrics(val_logs)
    name = monitor
    if phase and name.startswith(f"{phase}_"):
        name = name[len(phase) + 1 :]
    candidates = [monitor, name]
    for suffix in ("_val", "_test"):
        if name.endswith(suffix):
            candidates.append(name.removesuffix(suffix))
    for cand in candidates:
        if cand in flat:
            return flat[cand]
    return None


class _NullWriter:
    def add_scalar(self, *a, **k): ...

    def add_image(self, *a, **k): ...

    def close(self): ...
