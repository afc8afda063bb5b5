"""Production inference / serving surface (beyond the reference).

The reference has no inference entry point: serving a trained MAESTRO model
means re-instantiating the LightningModule and calling its test loop
(/root/reference/maestro/run_experiment.py:101-121).  Here serving is a
first-class TPU-native path:

* ``make_predict_fn``  — jitted logits function for a supervised phase.
* ``make_embed_fn``    — jitted per-modality pooled embeddings (the SSL
  representation, for retrieval / downstream fitting without the heads).
* ``export_predict`` / ``load_exported`` — ahead-of-time compiled
  ``jax.export`` (StableHLO) artifacts with a **symbolic batch dimension**,
  loadable on any PJRT runtime without the Python model code.

Parameters stay function *inputs* in the exported module (the artifact holds
no weights): the server restores weights once via orbax and feeds any batch
size.  EMA weights are preferred when present, matching the reference's
finetune-eval semantics (base.py:263-274).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp


def make_predict_fn(model, phase: str = "finetune") -> Callable:
    """Jitted ``fn(params, batch) -> {head_name: logits}`` (eval mode)."""
    if phase not in ("probe", "finetune"):
        msg = f"predict phase must be probe|finetune, got {phase!r}"
        raise ValueError(msg)

    @jax.jit
    def predict(params, batch):
        return model.apply(params, batch, phase)

    return predict


def _embed_method(model, batch):
    """Supervised-phase encoder forward without heads (mae.py __call__)."""
    batch = model.resize_and_rescale(batch)
    tokens = model.embed_tokens(batch)
    streams = model.plan.group(tokens)
    encoded = model.encode_streams(streams)
    x = model.plan.ungroup(encoded)
    pooled = {
        name: v.reshape(v.shape[0], -1, v.shape[-1]).mean(axis=1)
        for name, v in x.items()
    }
    pooled["joint"] = jnp.concatenate(
        [pooled[name] for name in model.plan.mods], axis=-1,
    )
    return pooled


def make_embed_fn(model) -> Callable:
    """Jitted ``fn(params, batch) -> {modality|'joint': [B, E]}`` embeddings.

    Token features are mean-pooled per modality after the shared trunk —
    the representation the probe head consumes (stop-gradient removed).
    MAE models only: baseline adapters keep their upstream backbone API and
    expose no shared trunk to pool.
    """
    if not hasattr(model, "encode_streams"):
        msg = (
            f"embeddings need a MaestroMAE model (got {type(model).__name__}:"
            " baseline adapters have no encode_streams trunk)"
        )
        raise TypeError(msg)

    @jax.jit
    def embed(params, batch):
        return model.apply(params, batch, method=_embed_method)

    return embed


def serving_params(restored: dict[str, Any]) -> dict[str, Any]:
    """Pick eval weights from a restored checkpoint payload (EMA if saved)."""
    params = restored.get("ema_params") or restored.get("params")
    if params is None:
        msg = "checkpoint payload has neither 'ema_params' nor 'params'"
        raise ValueError(msg)
    if "params" not in params:  # accept bare inner dicts
        params = {"params": params}
    return params


# ---------------------------------------------------------------------------
# jax.export artifacts
# ---------------------------------------------------------------------------
def export_predict(
    model,
    params,
    sample_batch: dict[str, Any],
    phase: str = "finetune",
    *,
    fn: Callable | None = None,
    symbolic_batch: bool = True,
    platforms: tuple[str, ...] | None = None,
) -> bytes:
    """Serialize an AOT-compiled predict (or custom) fn to StableHLO bytes.

    ``symbolic_batch=True`` exports with a polymorphic leading dimension so
    one artifact serves every batch size; pass ``platforms=("tpu", "cpu")``
    to emit a multi-platform module.
    """
    from jax import export as jexport

    if fn is None:
        fn = make_predict_fn(model, phase)
    if symbolic_batch:
        (b,) = jexport.symbolic_shape("b")

        def batch_spec(x):
            x = jnp.asarray(x)
            return jax.ShapeDtypeStruct((b, *x.shape[1:]), x.dtype)
    else:

        def batch_spec(x):
            x = jnp.asarray(x)
            return jax.ShapeDtypeStruct(x.shape, x.dtype)

    params_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        params,
    )
    specs = jax.tree.map(batch_spec, dict(sample_batch))
    kwargs = {"platforms": platforms} if platforms else {}
    exported = jexport.export(fn, **kwargs)(params_spec, specs)
    return bytes(exported.serialize())


def save_exported(path: str | Path, blob: bytes) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(blob)
    return path


def load_exported(path_or_bytes: str | Path | bytes) -> Callable:
    """Deserialize an exported module into ``fn(params, batch)``."""
    from jax import export as jexport

    blob = (
        path_or_bytes
        if isinstance(path_or_bytes, (bytes, bytearray))
        else Path(path_or_bytes).read_bytes()
    )
    exported = jexport.deserialize(bytearray(blob))
    return exported.call
