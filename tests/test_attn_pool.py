"""Parity tests for the fused attentive-pool kernel (ops/attn_pool.py).

Forward and gradients are checked in Pallas interpret mode against the
pure-jax reference implementing the exact AttentiveReduce body
(reference layers/head.py:28-63 over the date axis)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maestro_tpu.ops import attn_pool


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(attn_pool, "INTERPRET", True)


def _make(b, d, l, e, heads, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (b, d, l, e), dtype) * 1.7 + 0.3
    scale = 1.0 + 0.1 * jax.random.normal(ks[1], (e,), jnp.float32)
    bias = 0.1 * jax.random.normal(ks[2], (e,), jnp.float32)
    w_kv = jax.random.normal(ks[3], (e, 2 * e), jnp.float32) / e**0.5
    query = jax.random.normal(ks[4], (e,), jnp.float32)
    return x, scale, bias, w_kv, query


@pytest.mark.parametrize(
    ("b", "d", "l", "e", "heads"),
    [
        (2, 5, 128, 256, 8),   # one position block
        (1, 26, 192, 256, 8),  # FLAIR-like date count, non-128 L (padding)
        (2, 3, 64, 128, 4),    # small block, heads=4
    ],
)
def test_fwd_parity(b, d, l, e, heads):
    x, scale, bias, w_kv, query = _make(b, d, l, e, heads)
    out = attn_pool.attentive_pool(x, scale, bias, w_kv, query, heads)
    want = attn_pool.attentive_pool_reference(x, scale, bias, w_kv, query,
                                              heads)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        atol=2e-4, rtol=2e-3,
    )


def test_fwd_parity_bf16():
    x, scale, bias, w_kv, query = _make(2, 7, 128, 256, 8)
    x = x.astype(jnp.bfloat16)
    out = attn_pool.attentive_pool(x, scale, bias, w_kv, query, 8)
    want = attn_pool.attentive_pool_reference(x, scale, bias, w_kv, query, 8)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_grad_parity():
    b, d, l, e, heads = 2, 6, 128, 256, 8
    x, scale, bias, w_kv, query = _make(b, d, l, e, heads, jnp.float32, seed=3)
    cot = jax.random.normal(jax.random.PRNGKey(9), (b, l, e), jnp.float32)

    def loss_k(x, scale, bias, w_kv, query):
        out = attn_pool.attentive_pool(x, scale, bias, w_kv, query, heads)
        return jnp.sum(out * cot)

    def loss_r(x, scale, bias, w_kv, query):
        out = attn_pool.attentive_pool_reference(
            x, scale, bias, w_kv, query, heads,
        )
        return jnp.sum(out * cot)

    got = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(x, scale, bias, w_kv,
                                                    query)
    want = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, scale, bias, w_kv,
                                                     query)
    names = ("dx", "dscale", "dbias", "dw_kv", "dquery")
    for name, gk, gr in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(gk, np.float32), np.asarray(gr, np.float32),
            atol=5e-3, rtol=5e-3, err_msg=name,
        )


@pytest.mark.parametrize(
    ("d", "l"),
    [
        (26, 64),  # FLAIR seg-chunk regime: divisor dblk=13, no date pad
        (23, 64),  # prime date count: falls back to the padded fixed block
    ],
)
def test_grad_parity_date_blocking(d, l):
    """_pick_dblk's divisor and pad fallback paths both match reference."""
    from maestro_tpu.ops.attn_pool import _pick_dblk

    b, e, heads = 1, 256, 8
    dblk, dpad = _pick_dblk(d, min(attn_pool._BWD_BL, l))
    assert (dpad == 0) == (d % dblk == 0 and dpad == 0)
    if d == 26:
        assert dblk == 13 and dpad == 0
    if d == 23:
        assert dpad > 0
    x, scale, bias, w_kv, query = _make(b, d, l, e, heads, jnp.float32, seed=7)
    cot = jax.random.normal(jax.random.PRNGKey(4), (b, l, e), jnp.float32)

    def loss(fn):
        return lambda x, w: jnp.sum(
            fn(x, scale, bias, w, query, heads) * cot,
        )

    got = jax.grad(loss(attn_pool.attentive_pool), argnums=(0, 1))(x, w_kv)
    want = jax.grad(
        loss(attn_pool.attentive_pool_reference), argnums=(0, 1),
    )(x, w_kv)
    for name, gk, gr in zip(("dx", "dw_kv"), got, want):
        np.testing.assert_allclose(
            np.asarray(gk, np.float32), np.asarray(gr, np.float32),
            atol=5e-3, rtol=5e-3, err_msg=name,
        )


def test_grad_parity_padded():
    """L not a multiple of the bwd block exercises the m/den re-padding."""
    b, d, l, e, heads = 1, 4, 72, 128, 4
    x, scale, bias, w_kv, query = _make(b, d, l, e, heads, jnp.float32, seed=5)
    cot = jax.random.normal(jax.random.PRNGKey(2), (b, l, e), jnp.float32)

    gk = jax.grad(lambda x: jnp.sum(
        attn_pool.attentive_pool(x, scale, bias, w_kv, query, heads) * cot,
    ))(x)
    gr = jax.grad(lambda x: jnp.sum(
        attn_pool.attentive_pool_reference(
            x, scale, bias, w_kv, query, heads) * cot,
    ))(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               atol=5e-3, rtol=5e-3)


def test_attentive_reduce_module_fused_matches_xla():
    """AttentiveReduce with the fused kernel (interpret mode) must match its
    own XLA body — same params, fwd and grads."""
    from maestro_tpu.models.vit import AttentiveReduce

    b, d, l, e = 2, 6, 64, 256
    x = jax.random.normal(jax.random.PRNGKey(0), (b, d, l, e), jnp.float32)
    mod = AttentiveReduce(dim=e, heads=8, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), x)
    # the fused path creates the identical param tree
    params_fused = mod.init(jax.random.PRNGKey(1), x)
    assert jax.tree.map(jnp.shape, params) == jax.tree.map(
        jnp.shape, params_fused)

    def run(p, xx):
        return mod.apply(p, xx)

    want = run(params, x)
    want_gx, want_gp = jax.grad(
        lambda xx, p: jnp.sum(jnp.square(run(p, xx))), argnums=(0, 1),
    )(x, params)

    import maestro_tpu.ops.attn_pool as ap
    old = ap.INTERPRET
    ap.INTERPRET = True
    try:
        mod_f = AttentiveReduce(dim=e, heads=8, dtype=jnp.float32)
        got = mod_f.apply(params, x)
        got_gx, got_gp = jax.grad(
            lambda xx, p: jnp.sum(jnp.square(mod_f.apply(p, xx))),
            argnums=(0, 1),
        )(x, params)
    finally:
        ap.INTERPRET = old

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(want_gx),
                               atol=5e-3, rtol=5e-3)
    for pk, pg in zip(jax.tree_util.tree_leaves_with_path(got_gp),
                      jax.tree_util.tree_leaves_with_path(want_gp)):
        np.testing.assert_allclose(
            np.asarray(pk[1]), np.asarray(pg[1]), atol=5e-3, rtol=5e-3,
            err_msg=str(pk[0]),
        )
