"""Exact ring attention: sequence-parallel multi-head attention over ICI.

SURVEY.md §5.7 marks context parallelism as a stretch goal beyond parity —
MAESTRO's trunks top out around ~2k tokens, where one chip holds the whole
sequence comfortably.  This module provides the capability for when it
becomes load-bearing (32k+ token trunks, e.g. country-scale tiles or long
time series): the sequence axis is sharded over a mesh axis, each device
keeps its query chunk resident, and k/v chunks rotate around the ring via
``jax.lax.ppermute`` (neighbor ICI links) while the online-softmax (flash)
update accumulates exact attention — numerically the same softmax(QK^T)V as
the dense kernel, with per-layer communication of (n-1) local k/v chunks.

``cp_trunk_forward`` re-expresses the shared inter-modality trunk
(models/vit.py Transformer: pre-LN blocks + final LN) as a pure function of
its param tree so the whole trunk — LN/MLP elementwise work included — runs
inside one ``shard_map`` region with activations sharded over the sequence.
Exactness vs the dense trunk (forward and gradients) is asserted in
tests/test_ring_attention.py on an 8-way CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def ring_mha(
    q: jnp.ndarray,  # [B, Lc, H, D] local query chunk
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    sm_scale: float,
) -> jnp.ndarray:
    """Exact attention with the sequence sharded over ``axis_name``.

    Must run inside ``shard_map``; stats accumulate in fp32 regardless of
    the input dtype (same contract as ops/attention.py).
    """
    n = jax.lax.axis_size(axis_name)
    perm = [(j, (j + 1) % n) for j in range(n)]
    b, lc, h, d = q.shape
    qf = q.astype(jnp.float32)

    # the carry must be marked varying over the ring axis up front: the loop
    # body's outputs are varying (they mix in ppermuted chunks), and
    # fori_loop requires carry input/output types to match under shard_map
    pcast = partial(jax.lax.pcast, axis_name=axis_name, to="varying")
    o = pcast(jnp.zeros((b, lc, h, d), jnp.float32))
    m = pcast(jnp.full((b, h, lc), -jnp.inf, jnp.float32))
    l = pcast(jnp.zeros((b, h, lc), jnp.float32))

    def accumulate(o, m, l, kc, vc):
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", qf, kc.astype(jnp.float32),
        ) * sm_scale
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        pv = jnp.einsum("bhqk,bkhd->bqhd", p, vc.astype(jnp.float32))
        o = o * corr.transpose(0, 2, 1)[..., None] + pv
        return o, m_new, l

    def body(_, carry):
        o, m, l, kc, vc = carry
        o, m, l = accumulate(o, m, l, kc, vc)
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return o, m, l, kc, vc

    # n-1 rotate-and-accumulate hops, then the last chunk folds in outside
    # the loop — collectives in loop bodies are not DCE'd, so an n-iteration
    # loop would pay one extra, unused full k/v ICI transfer per layer
    o, m, l, kc, vc = jax.lax.fori_loop(0, n - 1, body, (o, m, l, k, v))
    o, m, l = accumulate(o, m, l, kc, vc)
    out = o / l.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


# --------------------------------------------------------------------------
# Pure-functional trunk forward (models/vit.py Transformer semantics) so the
# whole stack runs inside shard_map with sequence-sharded activations.
# --------------------------------------------------------------------------
def _ln(x, p, dtype):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    return (y * p["scale"] + p["bias"]).astype(dtype)


def _block(x, p, heads, dim_head, axis_name, dtype):
    y = _ln(x, p["attn"]["norm"], dtype)
    qkv = y @ p["attn"]["qkv"]["kernel"].astype(dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    b, lc, _ = x.shape
    shape = (b, lc, heads, dim_head)
    attn = ring_mha(
        q.reshape(shape), k.reshape(shape), v.reshape(shape),
        axis_name, dim_head**-0.5,
    ).reshape(b, lc, heads * dim_head)
    attn = attn @ p["attn"]["out"]["kernel"].astype(dtype) + p["attn"]["out"][
        "bias"].astype(dtype)
    x = x + attn

    y = _ln(x, p["mlp"]["norm"], dtype)
    y = y @ p["mlp"]["fc1"]["kernel"].astype(dtype) + p["mlp"]["fc1"][
        "bias"].astype(dtype)
    y = jax.nn.gelu(y, approximate=False)
    y = y @ p["mlp"]["fc2"]["kernel"].astype(dtype) + p["mlp"]["fc2"][
        "bias"].astype(dtype)
    return x + y


def _trunk_local(params, x, heads, dim_head, axis_name, dtype):
    depth = sum(1 for k in params if k.startswith("block"))
    for i in range(depth):
        x = _block(x, params[f"block{i}"], heads, dim_head, axis_name, dtype)
    return _ln(x, params["norm"], dtype)


def cp_trunk_forward(
    trunk_params: dict,
    x: jnp.ndarray,  # [B, L, E] full sequence (sharded or not)
    mesh,
    heads: int,
    dim_head: int,
    axis_name: str = "model",
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Run the inter trunk with activations sharded over ``axis_name``.

    ``trunk_params`` is the model's own ``params["params"]["encoder_inter"]``
    subtree — no re-initialization, bit-compatible with checkpoints.  L must
    divide by the axis size.
    """
    fn = partial(
        _trunk_local, heads=heads, dim_head=dim_head, axis_name=axis_name,
        dtype=dtype,
    )
    shard = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis_name, None)),
        out_specs=P(None, axis_name, None),
    )
    x = jax.device_put(x, NamedSharding(mesh, P(None, axis_name, None)))
    return shard(trunk_params, x)
