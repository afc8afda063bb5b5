"""Jitted train / eval steps for the three SSL phases.

One jitted function per (phase, stage): the whole hot path — resize, embed,
mask, encode, decode, loss, backward, AdamW update — is a single XLA program.
Gradients are averaged across the data axis by jit itself when the batch is
sharded over a mesh (parallel/mesh.py); there is no explicit collective code
here, matching the "let XLA insert collectives" design.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from maestro_tpu.models.mae import MaestroMAE
from maestro_tpu.specs.fusion import FusionPlan
from maestro_tpu.train import metrics as M
from maestro_tpu.train.losses import prediction_losses, reconstruction_loss
from maestro_tpu.train.state import TrainState


# Value-keyed reuse of jitted step callables: rebuilding a step per
# fit_phase / restart would retrace and relower the whole graph even though
# nothing changed.  Keys use repr(model)/repr(plan) (flax modules and the
# FusionPlan render every field deterministically) plus id(tx); the tx object
# is pinned inside the memo value so its id() can never be recycled by a
# different optimizer.
_STEP_MEMO: dict[tuple, tuple] = {}
_STEP_MEMO_MAX = 32  # bound the pinned executables (LRU eviction)


def _memo_step(key: tuple, tx, build: Callable[[], Callable]) -> Callable:
    hit = _STEP_MEMO.get(key)
    if hit is None:
        while len(_STEP_MEMO) >= _STEP_MEMO_MAX:
            _STEP_MEMO.pop(next(iter(_STEP_MEMO)))
        hit = _STEP_MEMO[key] = (build(), tx)
    else:  # refresh LRU order
        _STEP_MEMO[key] = _STEP_MEMO.pop(key)
    return hit[0]


def make_pretrain_step(
    model: MaestroMAE,
    plan: FusionPlan,
    tx: optax.GradientTransformation,
    loss_type: str = "l1_norm",
    donate: bool = True,
    fused_loss: bool = True,
) -> Callable:
    key = ("pretrain", repr(model), repr(plan), id(tx), loss_type, donate,
           fused_loss)
    return _memo_step(
        key, tx,
        lambda: _build_pretrain_step(model, plan, tx, loss_type, donate,
                                     fused_loss),
    )


def pretrain_loss_fn(model, plan, loss_type: str, fused_loss: bool = True):
    """``loss_fn(params, batch, rng)`` for MAE pretraining.

    ``fused_loss=True`` reconstructs in token space (no pixel grid ever
    materialized) through the fused patch-group-norm kernel; the plain path
    keeps the reference's pixel-space formulation for parity checks.
    Shared by the single-step, multi-step and joint-pretraining builders.
    """
    from maestro_tpu.ops.fused_loss import fused_reconstruction_loss

    def loss_fn(params, batch, rng):
        if fused_loss:
            rec, masks, targets = model.apply(
                params, batch, "pretrain", False, rngs={"mask": rng},
            )
            return fused_reconstruction_loss(plan, targets, rec, masks,
                                             loss_type)
        pixels, masks, targets = model.apply(
            params, batch, "pretrain", rngs={"mask": rng},
        )
        return reconstruction_loss(plan, targets, pixels, masks, loss_type)

    return loss_fn


def _build_pretrain_step(model, plan, tx, loss_type, donate, fused_loss):
    loss_fn = pretrain_loss_fn(model, plan, loss_type, fused_loss)

    def step(state: TrainState, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
        )
        return new_state, {"loss_rec": loss}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_pretrain_multistep(
    model: MaestroMAE,
    plan: FusionPlan,
    tx: optax.GradientTransformation,
    loss_type: str = "l1_norm",
    donate: bool = True,
    fused_loss: bool = True,
) -> Callable:
    """K train steps per host dispatch via lax.scan over a stacked super-batch.

    Amortizes per-dispatch host/runtime latency (profiled at ~28 ms/step over
    the remote tunnel).  ``batch_stack`` leaves are [K, B, ...]; returns the
    final state and per-step losses [K].
    """
    key = ("pretrain_multi", repr(model), repr(plan), id(tx), loss_type,
           donate, fused_loss)
    return _memo_step(
        key, tx,
        lambda: _build_pretrain_multistep(model, plan, tx, loss_type, donate,
                                          fused_loss),
    )


def _build_pretrain_multistep(model, plan, tx, loss_type, donate, fused_loss):
    loss_fn = pretrain_loss_fn(model, plan, loss_type, fused_loss)

    def multistep(state: TrainState, batch_stack: dict, rng: jax.Array):
        # identical rng derivation to the single-step path: fold the caller
        # rng by the global step, so K multisteps == K single steps bit-exactly
        def one_step(state: TrainState, batch: dict):
            step_rng = jax.random.fold_in(rng, state.step)
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, batch, step_rng,
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(
                step=state.step + 1, params=params, opt_state=opt_state,
            ), loss

        return jax.lax.scan(one_step, state, batch_stack)

    return jax.jit(multistep, donate_argnums=(0,) if donate else ())


def make_pretrain_eval_step(
    model: MaestroMAE,
    plan: FusionPlan,
    loss_type: str = "l1_norm",
) -> Callable:
    key = ("pretrain_eval", repr(model), repr(plan), loss_type)
    return _memo_step(
        key, None, lambda: _build_pretrain_eval_step(model, plan, loss_type),
    )


def _build_pretrain_eval_step(model, plan, loss_type):
    def step(params, batch: dict, rng: jax.Array):
        pixels, masks, targets = model.apply(
            params, batch, "pretrain", rngs={"mask": rng},
        )
        loss = reconstruction_loss(plan, targets, pixels, masks, loss_type)
        return {"loss_rec": loss}

    return jax.jit(step)


def make_supervised_step(
    model: MaestroMAE,
    phase: str,  # "probe" | "finetune"
    tx: optax.GradientTransformation,
    donate: bool = True,
) -> Callable:
    key = ("supervised", repr(model), phase, id(tx), donate)
    return _memo_step(
        key, tx, lambda: _build_supervised_step(model, phase, tx, donate),
    )


def _build_supervised_step(model, phase, tx, donate):
    head_specs = model.head_specs

    def loss_fn(params, batch):
        logits = model.apply(params, batch, phase)
        return prediction_losses(head_specs, batch, logits)

    def step(state: TrainState, batch: dict, metric_states: dict):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch,
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
        )
        new_metrics = {
            hs.name: M.metric_update(
                hs.type_target, metric_states[hs.name], aux[hs.name],
            )
            for hs in head_specs
        }
        return new_state, new_metrics, {"loss_pred": loss}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_supervised_eval_step(
    model: MaestroMAE,
    phase: str,
    use_ema: bool = False,
) -> Callable:
    """Eval step; finetune val/test runs the EMA weights when available."""
    key = ("supervised_eval", repr(model), phase, use_ema)
    return _memo_step(
        key, None, lambda: _build_supervised_eval_step(model, phase, use_ema),
    )


def _build_supervised_eval_step(model, phase, use_ema):
    head_specs = model.head_specs

    @partial(jax.jit, static_argnames=())
    def step(state: TrainState, batch: dict, metric_states: dict):
        params = (
            state.ema_params
            if (use_ema and state.ema_params is not None)
            else state.params
        )
        logits = model.apply(params, batch, phase)
        loss, aux = prediction_losses(head_specs, batch, logits)
        new_metrics = {
            hs.name: M.metric_update(
                hs.type_target, metric_states[hs.name], aux[hs.name],
            )
            for hs in head_specs
        }
        return new_metrics, {"loss_pred": loss}

    return step


def make_feature_step(model) -> Callable:
    """Jitted ``(params, batch) -> encoded`` frozen-trunk forward.

    ``encoded`` is the grouped-stream feature dict ``compute_logits``
    consumes (model.encode_for_heads).  Used by the probe val feature cache
    (train/eval_cache.py) to compute features once, after which val epochs
    are head-only.
    """
    key = ("features", repr(model))
    return _memo_step(
        key, None,
        lambda: jax.jit(
            lambda params, batch: model.apply(
                params, batch, method=type(model).encode_for_heads,
            ),
        ),
    )


def make_head_eval_step(model, phase: str, use_ema: bool = False) -> Callable:
    """Eval step over precomputed trunk features: heads + losses + metrics.

    ``(state, encoded, labels, metric_states) -> (metric_states, logs)`` —
    the head-only counterpart of ``make_supervised_eval_step`` for phases
    whose trunk is frozen (probe, or a freeze=True baseline finetune).
    ``labels`` carries just the per-target label arrays
    ``prediction_losses`` reads (batch[hs.name]).  ``use_ema`` mirrors the
    plain eval step's finetune choice; a frozen trunk's EMA equals its
    params (the update is a fixed point there), so cached features remain
    valid either way.
    """
    key = ("head_eval", repr(model), phase, use_ema)
    head_specs = model.head_specs

    def build() -> Callable:
        @jax.jit
        def step(state: TrainState, encoded: dict, labels: dict,
                 metric_states: dict):
            params = (
                state.ema_params
                if (use_ema and state.ema_params is not None)
                else state.params
            )
            logits = model.apply(
                params, encoded, phase,
                method=type(model).logits_from_features,
            )
            loss, aux = prediction_losses(head_specs, labels, logits)
            new_metrics = {
                hs.name: M.metric_update(
                    hs.type_target, metric_states[hs.name], aux[hs.name],
                )
                for hs in head_specs
            }
            return new_metrics, {"loss_pred": loss}

        return step

    return _memo_step(key, None, build)


def init_metric_states(head_specs) -> dict[str, Any]:
    return {
        hs.name: M.metric_init(hs.type_target, hs.num_classes) for hs in head_specs
    }


def compute_metrics(head_specs, metric_states) -> dict[str, dict[str, float]]:
    return {
        hs.name: {
            k: float(v)
            for k, v in M.metric_compute(
                hs.type_target, metric_states[hs.name],
            ).items()
        }
        for hs in head_specs
    }
