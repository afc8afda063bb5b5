"""Optimizer construction: AdamW + OneCycle with phase-dependent freezing.

Reference semantics (/root/reference/maestro/train/model.py:120-158):
sqrt batch-size LR scaling ``lr = base_lr * (global_batch / 3)**0.5``,
AdamW(b1, b2, wd), OneCycleLR(pct_start=0.2, div_factor=1000,
final_div_factor=final_factor/1000), stepped per optimizer step.

Phase-dependent trainability replaces torch's grad=None skipping:
  - pretrain: heads frozen (they receive no gradient in the reference);
  - probe: only heads train (encoder features are stop-gradient'ed);
  - finetune: encoder + heads train; the decoder side stays frozen.
Frozen subtrees get ``optax.set_to_zero`` via ``optax.multi_transform`` so
AdamW state/weight-decay never touches them.  The decoder-side subtrees
(decoders/enc_to_dec/pixelify/mask tokens) are labelled separately because
they are absent from the probe/finetune graphs: torch AdamW skips their
``grad=None`` params entirely (no decoupled weight decay), so applying
AdamW to their zero JAX gradients would decay them where the reference
leaves them untouched (verified by tests/test_train_trajectory_parity.py).
"""

from __future__ import annotations

import jax
import optax

from maestro_tpu.conf.core import OptConfig, OptFinetuneConfig


def lr_for(opt: OptConfig, num_devices: int) -> float:
    """Sqrt batch-size scaling (the /3 keeps parity with reference runs)."""
    global_batch = opt.batch_size * opt.accumulate_grad_batches * num_devices
    return opt.base_lr * (global_batch / 3.0) ** 0.5


def onecycle(opt: OptConfig, total_steps: int, num_devices: int) -> optax.Schedule:
    peak = lr_for(opt, num_devices)
    final_factor = (
        opt.final_factor if isinstance(opt, OptFinetuneConfig) else 1e7
    )
    return onecycle_schedule(
        total_steps=max(total_steps, 1),
        peak_value=peak,
        pct_start=0.2,
        div_factor=1000.0,
        final_div_factor=final_factor / 1000.0,
    )


def onecycle_schedule(
    total_steps: int,
    peak_value: float,
    pct_start: float = 0.2,
    div_factor: float = 1000.0,
    final_div_factor: float = 1e4,
) -> optax.Schedule:
    """Cosine one-cycle (torch OneCycleLR semantics), safe for tiny step counts.

    optax's cosine_onecycle_schedule divides by a zero-length warmup interval
    when ``pct_start * total_steps`` rounds to 0, yielding NaN learning rates;
    this formulation clamps both phases to >= 1 step.
    """
    import jax.numpy as jnp

    init_value = peak_value / div_factor
    final_value = init_value / final_div_factor
    up = max(round(pct_start * total_steps), 1)
    down = max(total_steps - up, 1)

    def schedule(count):
        count = jnp.minimum(count, total_steps)
        up_pct = jnp.clip(count / up, 0.0, 1.0)
        down_pct = jnp.clip((count - up) / down, 0.0, 1.0)
        lr_up = peak_value + (init_value - peak_value) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * up_pct)
        )
        lr_down = final_value + (peak_value - final_value) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * down_pct)
        )
        return jnp.where(count <= up, lr_up, lr_down)

    return schedule


_DECODER_PREFIXES = ("decoders_", "enc_to_dec_", "pixelify_", "mask_token_")


def _param_role(path: tuple, _: object) -> str:
    """Heads live under linen-named 'heads_<target>' subtrees; the decoder
    side (reconstruction-only params) under decoders_/enc_to_dec_/pixelify_/
    mask_token_."""
    for k in path:
        key = getattr(k, "key", None)
        if isinstance(key, str):
            if key.startswith("heads_"):
                return "head"
            if key.startswith(_DECODER_PREFIXES):
                return "decoder"
    return "backbone"


def param_labels(params) -> dict:
    """Label each param as 'head' or 'backbone' by its tree path."""
    return jax.tree_util.tree_map_with_path(_param_role, params)


def trainable_roles(phase: str) -> tuple[str, ...]:
    match phase:
        case "pretrain":
            return ("backbone", "decoder")
        case "probe":
            return ("head",)
        case "finetune":
            return ("backbone", "head")
    msg = f"Invalid phase {phase!r}."
    raise ValueError(msg)


# Value-keyed optimizer reuse: two calls with identical config and the same
# param-tree structure produce semantically identical (stateless) optax
# transforms.  Returning the SAME object lets the step-builder memo in
# train/steps.py key on id(tx), so re-running a phase (in-process restart,
# test suite) reuses the jitted step instead of retracing it.
_TX_MEMO: dict[tuple, optax.GradientTransformation] = {}
_TX_MEMO_MAX = 64  # bounded: long-lived sweeps must not pin every config


def _optimizer_key(opt, phase, total_steps, params, num_devices, lw_decay,
                   depth, skip_nonfinite):
    import dataclasses
    import json

    try:
        cfg = json.dumps(dataclasses.asdict(opt), sort_keys=True, default=str)
        treedef = jax.tree_util.tree_structure(params)
    except (TypeError, ValueError):
        return None
    return (type(opt).__name__, cfg, phase, total_steps, num_devices,
            lw_decay, depth, skip_nonfinite, treedef)


def make_optimizer(
    opt: OptConfig,
    phase: str,
    total_steps: int,
    params,
    num_devices: int = 1,
    lw_decay: float | None = None,
    depth: int | None = None,
    skip_nonfinite: bool = False,
) -> optax.GradientTransformation:
    key = _optimizer_key(opt, phase, total_steps, params, num_devices,
                         lw_decay, depth, skip_nonfinite)
    if key is not None and key in _TX_MEMO:
        _TX_MEMO[key] = _TX_MEMO.pop(key)  # refresh LRU order
        return _TX_MEMO[key]
    tx = _build_optimizer(opt, phase, total_steps, params, num_devices,
                          lw_decay, depth, skip_nonfinite)
    if key is not None:
        while len(_TX_MEMO) >= _TX_MEMO_MAX:
            _TX_MEMO.pop(next(iter(_TX_MEMO)))
        _TX_MEMO[key] = tx
    return tx


def _build_optimizer(
    opt, phase, total_steps, params, num_devices, lw_decay, depth,
    skip_nonfinite,
) -> optax.GradientTransformation:
    schedule = onecycle(opt, total_steps, num_devices)
    adamw = optax.adamw(
        learning_rate=schedule, b1=opt.b1, b2=opt.b2, weight_decay=opt.wd,
    )
    if lw_decay is not None:
        adamw = optax.chain(adamw, scale_by_lw_decay(lw_decay, depth or 12))
    roles = trainable_roles(phase)
    labels = param_labels(params)
    tx = optax.multi_transform(
        {
            role: adamw if role in roles else optax.set_to_zero()
            for role in ("backbone", "decoder", "head")
        },
        labels,
    )
    if opt.accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=opt.accumulate_grad_batches)
    if skip_nonfinite:
        # production guard (beyond reference): a step whose grads contain
        # inf/nan is dropped entirely instead of poisoning params/moments;
        # training continues from the next batch (trainer.skip_nonfinite)
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx


def scale_by_lw_decay(rate_decay: float, depth: int) -> optax.GradientTransformation:
    """Layer-wise LR decay (reference baselines/dinov2.py:312-373).

    Encoder block i gets ``rate_decay ** (depth - i)``; patch embeds get
    ``rate_decay ** (depth + 1)``; heads / norms / everything else 1.0.
    Multipliers are derived from the param tree path at update time so the
    transform composes with optax.multi_transform's masked subtrees.
    """
    import re

    block_re = re.compile(r"block(\d+)")

    def mult_for(path) -> float:
        keys = [str(getattr(k, "key", k)) for k in path]
        for k in keys:
            m = block_re.fullmatch(k)
            if m:
                return rate_decay ** (depth - int(m.group(1)))
        if any(k.startswith(("patch_embed", "patch_proj", "embedders")) for k in keys):
            return rate_decay ** (depth + 1)
        return 1.0

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        scaled = jax.tree_util.tree_map_with_path(
            lambda p, u: u * mult_for(p), updates,
        )
        return scaled, state

    return optax.GradientTransformation(init_fn, update_fn)
