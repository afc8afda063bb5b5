"""Attention kernel parity tests (CPU: einsum fallback + Pallas interpreter).

The TPU compiled paths are exercised on hardware by the bench; here the same
kernel bodies run under the Pallas interpreter so CPU CI checks the math:
the head-packed lane-blocked kernel (ops/attention.py) must agree exactly
with the plain einsum formulation used by the reference
(/root/reference/maestro/ssl/mae.py:135-176 via vit_pytorch Attention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maestro_tpu.ops import attention as A


def _ref_blhd(q, k, v, sm_scale):
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32),
    )
    p = jax.nn.softmax(logits * sm_scale, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


def test_mha_blhd_cpu_fallback_matches_reference():
    b, l, h, d = 2, 50, 3, 16
    q, k, v = (_rand((b, l, h, d), s) for s in range(3))
    out = A.mha_blhd(q, k, v, d**-0.5)
    ref = _ref_blhd(q, k, v, d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize(
    ("l", "h", "d"),
    [(130, 4, 128), (256, 12, 64), (140, 16, 32)],
    ids=["d128-padded", "d64-pack2", "d32-pack4"],
)
def test_packed_kernel_interpret_parity(monkeypatch, l, h, d):
    monkeypatch.setattr(A, "INTERPRET", True)
    b = 2
    q, k, v = (_rand((b, l, h, d), s) for s in range(3))
    sm = d**-0.5
    out = A.packed_single_block_attention(q, k, v, sm)
    ref = _ref_blhd(q, k, v, sm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    # gradients through the custom VJP
    gp = jax.grad(lambda q, k, v: jnp.sum(
        A.packed_single_block_attention(q, k, v, sm) ** 2), argnums=(0, 1, 2),
    )(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(
        _ref_blhd(q, k, v, sm) ** 2), argnums=(0, 1, 2),
    )(q, k, v)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3)


@pytest.mark.parametrize(
    ("l", "h", "d"),
    [(1880, 4, 128), (1600, 16, 32), (1536, 6, 128)],
    ids=["flair-decoder", "d32-pack4", "exact-1536"],
)
def test_qblock_kernel_interpret_parity(monkeypatch, l, h, d):
    """Long-sequence tier: q-blocked, k/v-resident, zero-transpose layout.

    1880 = the FLAIR group-mode decoder / supervised trunk length (the tier
    that previously transposed into the stock flash kernel)."""
    monkeypatch.setattr(A, "INTERPRET", True)
    b = 1
    q, k, v = (_rand((b, l, h, d), s) for s in range(3))
    sm = d**-0.5
    out = A.packed_qblock_attention(q, k, v, sm)
    ref = _ref_blhd(q, k, v, sm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    gp = jax.grad(lambda q, k, v: jnp.sum(
        A.packed_qblock_attention(q, k, v, sm) ** 2), argnums=(0, 1, 2),
    )(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(
        _ref_blhd(q, k, v, sm) ** 2), argnums=(0, 1, 2),
    )(q, k, v)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3)


def test_single_block_kernel_interpret_parity(monkeypatch):
    monkeypatch.setattr(A, "INTERPRET", True)
    b, h, l, d = 2, 3, 130, 64  # l=130 exercises the pad-to-128 mask path
    q, k, v = (_rand((b, h, l, d), s) for s in range(3))
    sm = d**-0.5
    out = A.single_block_attention(q, k, v, sm)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * sm
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_packed_kernel_spmd_partitioning(monkeypatch):
    """The kernel partitions over (batch, head) mesh axes without gathers.

    pallas_call lowers to an opaque custom call GSPMD cannot split; the
    custom_partitioning wrapper declares (B, H) shardable so a dp x tp jit
    runs the kernel on local shards. Exactness vs the unsharded kernel is
    the proof that the local lowering + sharding rule are consistent.
    """
    monkeypatch.setattr(A, "INTERPRET", True)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from maestro_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4, 2)
    b, l, h, d = 8, 130, 4, 128
    q, k, v = (_rand((b, l, h, d), s) for s in range(3))
    sm = d**-0.5

    ref = A.packed_single_block_attention(q, k, v, sm)
    sh = NamedSharding(mesh, P("data", None, "model", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    out = jax.jit(
        lambda q, k, v: A.packed_single_block_attention(q, k, v, sm),
    )(qs, ks, vs)
    assert "data" in str(out.sharding)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    loss = lambda q, k, v: jnp.sum(
        A.packed_single_block_attention(q, k, v, sm) ** 2)
    g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g_sh = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks, vs)
    for a, b_ in zip(g_sh, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3)


def test_pk_width_divides_local_shards():
    """Lane-block width must divide h*d for LOCAL (sharded) head counts."""
    assert A._pk_width(4, 128) == 128
    assert A._pk_width(12, 64) == 128
    assert A._pk_width(16, 32) == 128
    # 12x64 heads split 4-way: 3 local heads, 192 lanes — max(d,128) would
    # leave lanes 128-191 unwritten (grid 192//128 == 1)
    assert A._pk_width(3, 64) == 64
    for h, d in [(3, 64), (1, 32), (5, 96), (12, 64), (4, 128)]:
        w = A._pk_width(h, d)
        assert (h * d) % w == 0
        assert w % d == 0


def test_packed_kernel_interpret_parity_odd_local_heads(monkeypatch):
    """The 3x64 shape a 4-way tensor-parallel shard of ViT-B sees."""
    monkeypatch.setattr(A, "INTERPRET", True)
    b, l, h, d = 2, 130, 3, 64
    q, k, v = (_rand((b, l, h, d), s) for s in range(3))
    sm = d**-0.5
    out = A.packed_single_block_attention(q, k, v, sm)
    ref = _ref_blhd(q, k, v, sm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    gp = jax.grad(lambda q, k, v: jnp.sum(
        A.packed_single_block_attention(q, k, v, sm) ** 2), argnums=(0, 1, 2),
    )(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(
        _ref_blhd(q, k, v, sm) ** 2), argnums=(0, 1, 2),
    )(q, k, v)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3)


def test_packed_kernel_spmd_non_dividing_head_shard(monkeypatch):
    """h*d not a lane multiple per shard: 12x64 heads over a 4-way model axis."""
    monkeypatch.setattr(A, "INTERPRET", True)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from maestro_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(2, 4)
    b, l, h, d = 4, 130, 12, 64
    q, k, v = (_rand((b, l, h, d), s) for s in range(3))
    sm = d**-0.5
    ref = A.packed_single_block_attention(q, k, v, sm)
    sh = NamedSharding(mesh, P("data", None, "model", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    out = jax.jit(
        lambda q, k, v: A.packed_single_block_attention(q, k, v, sm),
    )(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
