"""Train state: params + optimizer state + EMA, as one donatable pytree."""

from __future__ import annotations

from typing import Any

import jax
from flax import struct


@struct.dataclass
class TrainState:
    """Everything a training step mutates, donated in-place under jit."""

    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any = None

    @classmethod
    def create(cls, params, tx, use_ema: bool = False) -> "TrainState":
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), dtype=jnp.int32),
            params=params,
            opt_state=tx.init(params),
            # real copies: EMA must not alias the param buffers (donation)
            ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
        )


@jax.jit
def _ema_tree(ema, params, momentum):
    return jax.tree.map(
        lambda e, p: momentum * e + (1.0 - momentum) * p, ema, params,
    )


def ema_update(state: TrainState, momentum: float) -> TrainState:
    """Per-epoch EMA update (reference train/base.py:267-274).

    One fused jitted graph instead of eager per-leaf dispatch (hundreds of
    tiny kernels on a real device; hundreds of trace+compile on CPU CI).
    """
    if state.ema_params is None:
        return state
    new_ema = _ema_tree(state.ema_params, state.params, momentum)
    return state.replace(ema_params=new_ema)


def ema_momentum(max_epochs: int) -> float:
    return 1.0 - 1.0 / (max_epochs * 0.2)
