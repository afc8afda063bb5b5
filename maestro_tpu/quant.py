"""Post-training int8 quantization for serving (beyond the reference).

The reference serves fp32/16 torch modules; it has no quantized path.  On
TPU the MXU runs int8 x int8 -> int32 at twice the bf16 rate (v5e: 394 vs
197 TOPS), and the transformer projections (qkv / out / fc1 / fc2) carry
almost all serving FLOPs, so an int8 path is a first-class serving lever.

Scheme (standard w8a8 PTQ):

* :func:`quantize_params` — symmetric per-output-channel weight quantization
  of the transformer ``nn.Dense`` kernels: the ``kernel`` leaf becomes int8
  and gains a sibling ``kernel_scale`` fp32 leaf ``[out]``.  Biases, norms,
  patch/positional embeddings and the task heads stay in full precision
  (heads are the accuracy-sensitive tail and a rounding-error share of the
  FLOPs).
* :func:`quant_interceptor` — a flax method interceptor that reroutes
  ``nn.Dense.__call__`` through the int8 path whenever the bound params
  carry ``kernel_scale``: dynamic per-token activation scales (max-abs /
  127), int8 x int8 ``dot_general`` with ``preferred_element_type=int32``
  (the MXU-native accumulate), rescale by ``s_x * s_w``, then the fp bias.
* :func:`make_quant_predict_fn` — drop-in for ``serve.make_predict_fn``
  with the interceptor installed; composes with ``serve.export_predict``
  (int8 ``dot_general`` is plain StableHLO, so exported artifacts keep the
  quantized compute).

Only param names that are ``nn.Dense`` modules everywhere in this codebase
are quantized (``qkv``/``out``/``fc1``/``fc2``/``to_kv``/auto-named
``Dense_*``): custom kernel-carrying modules like the patch projection read
their weights directly and must keep fp storage.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

# Param-dict keys that always hold an nn.Dense in this codebase (the
# transformer hot path, incl. the FM baseline adapters' attention blocks —
# exact matches, so the patch projections named proj0/proj1/... stay fp).
# The interceptor additionally checks isinstance(module, nn.Dense), so an
# allowlisted name outside a Dense can never be silently mis-executed — it
# would just never hit the int8 path.
DENSE_NAMES = frozenset(
    {"qkv", "out", "fc1", "fc2", "to_kv", "to_q", "to_k", "to_v", "proj"},
)
_EPS = 1e-8


def _quantize_kernel(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[in, out] fp -> (int8 [in, out], fp32 scale [out]), symmetric."""
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / 127.0, _EPS)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_params(
    params: dict[str, Any],
    min_dim: int = 32,
    skip_prefixes: tuple[str, ...] = ("heads_",),
) -> dict[str, Any]:
    """Quantize transformer Dense kernels in a param tree (pure function).

    Returns a new tree where each selected ``kernel`` is int8 with a sibling
    ``kernel_scale``; all other leaves are untouched.  ``min_dim`` skips
    small projections where quantization saves nothing, ``skip_prefixes``
    excludes subtrees by module-path prefix (default: the task heads).
    """

    def rec(tree, path):
        if not isinstance(tree, dict):
            return tree
        out = {}
        skipped = any(
            p.startswith(pre) for p in path for pre in skip_prefixes
        )
        parent = path[-1] if path else ""
        eligible_parent = parent in DENSE_NAMES or parent.startswith("Dense_")
        for k, v in tree.items():
            if (
                k == "kernel"
                and not skipped
                and eligible_parent
                and getattr(v, "ndim", 0) == 2
                and min(v.shape) >= min_dim
            ):
                q, scale = _quantize_kernel(v)
                out["kernel"] = q
                out["kernel_scale"] = scale
            else:
                out[k] = rec(v, (*path, k))
        return out

    return rec(params, ())


def _quant_dense_call(mod: nn.Dense, x: jnp.ndarray) -> jnp.ndarray:
    w_q = mod.get_variable("params", "kernel")
    s_w = mod.get_variable("params", "kernel_scale")
    xf = x.astype(jnp.float32)
    s_x = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, _EPS,
    )
    x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, w_q,
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * s_x * s_w
    if mod.use_bias:
        y = y + mod.get_variable("params", "bias").astype(jnp.float32)
    return y.astype(mod.dtype or x.dtype)


def quant_interceptor(next_f, args, kwargs, context):
    """flax ``intercept_methods`` hook: int8 path for quantized Denses."""
    mod = context.module
    if (
        isinstance(mod, nn.Dense)
        and context.method_name == "__call__"
        and mod.has_variable("params", "kernel_scale")
    ):
        return _quant_dense_call(mod, args[0])
    return next_f(*args, **kwargs)


def make_quant_predict_fn(model, phase: str = "finetune") -> Callable:
    """Jitted ``fn(quantized_params, batch) -> {head: logits}``.

    Drop-in for :func:`maestro_tpu.serve.make_predict_fn`; feed it the tree
    from :func:`quantize_params`.  Unquantized trees run the normal path
    unchanged (the interceptor keys on ``kernel_scale`` presence).
    """
    if phase not in ("probe", "finetune"):
        msg = f"predict phase must be probe|finetune, got {phase!r}"
        raise ValueError(msg)

    @jax.jit
    def predict(params, batch):
        with nn.intercept_methods(quant_interceptor):
            return model.apply(params, batch, phase)

    return predict


def make_quant_embed_fn(model) -> Callable:
    """Quantized counterpart of ``serve.make_embed_fn`` (retrieval path)."""
    from maestro_tpu.serve import _embed_method, make_embed_fn

    make_embed_fn(model)  # reuse its MAE-only type check

    @jax.jit
    def embed(params, batch):
        with nn.intercept_methods(quant_interceptor):
            return model.apply(params, batch, method=_embed_method)

    return embed
