"""Attention dispatch: XLA einsum for short sequences, Pallas flash for long.

The fusion-mode sequences are short for encoders after masking (50-470
tokens) where XLA's fused softmax is fine, but decoder sequences (full token
sets, e.g. FLAIR group-mode 1880 tokens x 16 heads) materialize multi-GB fp32
score tensors per layer — the dominant HBM traffic of the pretrain step.
Those route to the Pallas TPU flash-attention kernel (online softmax, scores
never leave VMEM), with sequence padding to the 128-token block size handled
via segment ids.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

FLASH_MIN_SEQ = 1536  # above: online-softmax flash (scores exceed VMEM)
SINGLE_BLOCK_MIN_SEQ = 128  # below: XLA fused path is fine
_BLOCK = 128
INTERPRET = False  # set True in tests to run kernels via the Pallas interpreter


def mha_blhd(
    q: jnp.ndarray,  # [B, L, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    sm_scale: float,
) -> jnp.ndarray:
    """Multi-head attention on head-packed [B, L, H, D] layout.

    With D a multiple of the 128 MXU lanes (the TPU-default decoder layout,
    4 heads x 128), the Pallas kernel reads q/k/v blocks straight out of the
    [B, L, H*D] projection output: no [B,L,H,D]->[B,H,L,D] layout transposes
    (which showed up as ~45 ms/step of pure copies in the r2 profile) and
    full K-dim MXU utilization in the score matmuls (the reference's 16x32
    decoder split runs them at 25%).
    """
    b, l, h, d = q.shape
    on_tpu = jax.default_backend() == "tpu"
    packable = (h * d) % 128 == 0 and (d % 128 == 0 or 128 % d == 0)
    if on_tpu and packable and SINGLE_BLOCK_MIN_SEQ <= l < FLASH_MIN_SEQ:
        return packed_single_block_attention(q, k, v, sm_scale)
    if on_tpu and packable and l >= FLASH_MIN_SEQ:
        return packed_qblock_attention(q, k, v, sm_scale)
    if on_tpu and l >= FLASH_MIN_SEQ:
        t = lambda x: x.transpose(0, 2, 1, 3)
        return t(mha(t(q), t(k), t(v), sm_scale))
    # XLA path straight on the [B, L, H, D] layout — no explicit transposes
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32,
    )
    attn = jax.nn.softmax(logits * sm_scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


def mha(
    q: jnp.ndarray,  # [B, H, L, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    sm_scale: float,
    use_flash: bool | None = None,
) -> jnp.ndarray:
    """Multi-head attention; returns [B, H, L, D]."""
    seq = q.shape[2]
    on_tpu = jax.default_backend() == "tpu"
    if use_flash is None:
        use_flash = on_tpu and seq >= FLASH_MIN_SEQ
    if use_flash:
        return _flash(q, k, v, sm_scale)
    if on_tpu and SINGLE_BLOCK_MIN_SEQ <= seq < FLASH_MIN_SEQ:
        return single_block_attention(q, k, v, sm_scale)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32,
    )
    attn = jax.nn.softmax(logits * sm_scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


def _flash(q, k, v, sm_scale):
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, h, l, d = q.shape
    # pad to a multiple of the (larger) block size so blocks divide the seq
    block = _BLOCK * 4 if l >= _BLOCK * 4 else _BLOCK
    pad = (-l) % block
    if pad:
        padding = ((0, 0), (0, 0), (0, pad), (0, 0))
        q = jnp.pad(q, padding)
        k = jnp.pad(k, padding)
        v = jnp.pad(v, padding)
        # valid tokens segment 1, padding segment 0 -> no cross attention
        seg = jnp.concatenate(
            [jnp.ones((b, l), jnp.int32), jnp.zeros((b, pad), jnp.int32)], axis=1,
        )
        segment_ids = fa.SegmentIds(q=seg, kv=seg)
    else:
        segment_ids = None

    inner = min(_BLOCK * 2, block)
    sizes = fa.BlockSizes(
        block_q=block, block_k_major=block, block_k=inner,
        block_b=1,
        block_q_major_dkv=block, block_k_major_dkv=block,
        block_k_dkv=inner, block_q_dkv=block,
        block_k_major_dq=block, block_k_dq=inner,
        block_q_dq=block,
    )
    out = fa.flash_attention(
        q, k, v, segment_ids=segment_ids, causal=False, sm_scale=sm_scale,
        block_sizes=sizes,
    )
    return out[:, :, :l] if pad else out


# --------------------------------------------------------------------------
# single-block attention: whole (batch, head) attention resident in VMEM.
# For 256-512 token sequences the full [L, L] scores tile is ~1 MB — no
# online softmax needed and zero HBM traffic for scores; sidesteps both
# the flash kernel's per-block grid overhead and XLA's materialized scores.
# --------------------------------------------------------------------------
def _sb_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, valid_len):
    q = q_ref[0].astype(jnp.float32)  # [L, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * sm_scale
    l = q.shape[0]
    if valid_len < l:  # mask padded keys
        col = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
        s = jnp.where(col < valid_len, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o_ref[0] = jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _sb_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                   *, sm_scale, valid_len):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * sm_scale
    l = q.shape[0]
    if valid_len < l:
        col = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
        s = jnp.where(col < valid_len, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq_ref[0] = (sm_scale * jax.lax.dot(
        ds, k, preferred_element_type=jnp.float32,
    )).astype(dq_ref.dtype)
    dk_ref[0] = (sm_scale * jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )).astype(dk_ref.dtype)
    dv_ref[0] = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)


def _sb_specs(bh: int, l: int, d: int):
    spec = pl.BlockSpec((1, l, d), lambda i: (i, 0, 0))
    return spec


def _attn_cost(bh: int, lp: int, d: int, bwd: bool = False):
    """Executed-flop estimate for one attention pass over bh (batch*head)
    sequences of lp (padded) tokens.  XLA scores opaque custom calls at ~0
    flops; without this, every Pallas attention tier silently deflates the
    MFU that bench.py derives from compiled.cost_analysis()."""
    matmuls = 10 if bwd else 4  # fwd: scores+pv; bwd: recompute+dp+ds+dq+dk+dv
    return pl.CostEstimate(
        flops=matmuls * bh * lp * lp * d,
        transcendentals=bh * lp * lp * (2 if bwd else 1),
        bytes_accessed=(14 if bwd else 8) * bh * lp * d * 2,
    )


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def single_block_attention(q, k, v, sm_scale):
    """[B, H, L, D] attention with VMEM-resident scores per (b, h)."""
    return _sb_impl(q, k, v, sm_scale)


def _sb_pad(x, pad):
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x


def _sb_impl(q, k, v, sm_scale):
    b, h, l, d = q.shape
    pad = (-l) % _BLOCK
    lp = l + pad
    qf = _sb_pad(q.reshape(b * h, l, d), pad)
    kf = _sb_pad(k.reshape(b * h, l, d), pad)
    vf = _sb_pad(v.reshape(b * h, l, d), pad)
    spec = _sb_specs(b * h, lp, d)
    out = pl.pallas_call(
        partial(_sb_fwd_kernel, sm_scale=sm_scale, valid_len=l),
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, lp, d), q.dtype),
        compiler_params=_sb_params(),
        cost_estimate=_attn_cost(b * h, lp, d),
        interpret=INTERPRET,
    )(qf, kf, vf)
    return out[:, :l].reshape(b, h, l, d)


def _sb_params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(dimension_semantics=("parallel",))


def _sb_fwd(q, k, v, sm_scale):
    return _sb_impl(q, k, v, sm_scale), (q, k, v)


def _sb_bwd(sm_scale, res, do):
    q, k, v = res
    b, h, l, d = q.shape
    pad = (-l) % _BLOCK
    lp = l + pad
    qf = _sb_pad(q.reshape(b * h, l, d), pad)
    kf = _sb_pad(k.reshape(b * h, l, d), pad)
    vf = _sb_pad(v.reshape(b * h, l, d), pad)
    dof = _sb_pad(do.reshape(b * h, l, d), pad)
    spec = _sb_specs(b * h, lp, d)
    shape = jax.ShapeDtypeStruct((b * h, lp, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        partial(_sb_bwd_kernel, sm_scale=sm_scale, valid_len=l),
        grid=(b * h,),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[shape, shape, shape],
        compiler_params=_sb_params(),
        cost_estimate=_attn_cost(b * h, lp, d, bwd=True),
        interpret=INTERPRET,
    )(qf, kf, vf, dof)
    unpad = lambda x: x[:, :l].reshape(b, h, l, d)
    return unpad(dq), unpad(dk), unpad(dv)


single_block_attention.defvjp(_sb_fwd, _sb_bwd)


# --------------------------------------------------------------------------
# head-packed single-block attention: operates on [B, L, H, D] directly.
# Heads are folded into the lane axis ([B, L, H*D] rank-3 view — a free
# reshape of the fused qkv projection output) and each grid cell (b, j)
# reads a (1, Lp, max(D, 128)) lane-block, so XLA inserts no layout copies.
# When D < 128 (e.g. the ViT-B encoder's 12 x 64 split), each block carries
# 128/D heads and the kernel loops over the lane slices — the per-head score
# matmuls are unchanged, only the HBM layout and grid bookkeeping differ.
# --------------------------------------------------------------------------
def _pk_spec(lp: int, width: int):
    return pl.BlockSpec((1, lp, width), lambda b, j: (b, 0, j))


def _pk_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, valid_len, dh):
    for h in range(q_ref.shape[-1] // dh):
        sl = slice(h * dh, (h + 1) * dh)
        q = q_ref[0, :, sl].astype(jnp.float32)  # [Lp, dh]
        k = k_ref[0, :, sl].astype(jnp.float32)
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * sm_scale
        l = q.shape[0]
        if valid_len < l:
            col = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
            s = jnp.where(col < valid_len, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        o_ref[0, :, sl] = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _pk_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                   *, sm_scale, valid_len, dh):
    for h in range(q_ref.shape[-1] // dh):
        sl = slice(h * dh, (h + 1) * dh)
        q = q_ref[0, :, sl].astype(jnp.float32)
        k = k_ref[0, :, sl].astype(jnp.float32)
        v = v_ref[0, :, sl].astype(jnp.float32)
        do = do_ref[0, :, sl].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * sm_scale
        l = q.shape[0]
        if valid_len < l:
            col = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
            s = jnp.where(col < valid_len, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq_ref[0, :, sl] = (sm_scale * jax.lax.dot(
            ds, k, preferred_element_type=jnp.float32,
        )).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = (sm_scale * jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )).astype(dk_ref.dtype)
        dv_ref[0, :, sl] = jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)


def _pk_pad(x, pad):
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x


def _pk_width(h: int, d: int) -> int:
    """Lane-block width: a multiple of d that divides h*d, preferring the
    smallest multiple of the 128 MXU lanes (full occupancy).

    The choice must hold for the LOCAL shard shapes: under tensor-parallel
    head sharding (custom_partitioning below keeps the h axis sharded) a
    fixed max(d, 128) can stop dividing h*d — e.g. 12x64 heads split 4-way
    leave 3x64=192 lanes, and a (b, 192//128=1) grid would silently never
    write lanes 128-191.  Falling back to width=d is correct at reduced
    lane occupancy."""
    for m in range(1, h + 1):
        w = m * d
        if (h * d) % w == 0 and w % 128 == 0:
            return w
    return d


def _pk_params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(dimension_semantics=("parallel", "parallel"))


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def packed_single_block_attention(q, k, v, sm_scale):
    """[B, L, H, D] attention, VMEM-resident scores per (b, h), no transposes."""
    return _pk_impl(q, k, v, sm_scale)


def _pk_impl_local(q, k, v, sm_scale):
    b, l, h, d = q.shape
    pad = (-l) % _BLOCK
    lp = l + pad
    width = _pk_width(h, d)
    spec = _pk_spec(lp, width)
    flat = lambda x: _pk_pad(x.reshape(b, l, h * d), pad)
    out = pl.pallas_call(
        partial(_pk_fwd_kernel, sm_scale=sm_scale, valid_len=l, dh=d),
        grid=(b, h * d // width),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, lp, h * d), q.dtype),
        compiler_params=_pk_params(),
        cost_estimate=_attn_cost(b * h, lp, d),
        interpret=INTERPRET,
    )(flat(q), flat(k), flat(v))
    return out[:, :l].reshape(b, l, h, d)


def _pk_bwd_local(do, q, k, v, sm_scale):
    b, l, h, d = q.shape
    pad = (-l) % _BLOCK
    lp = l + pad
    width = _pk_width(h, d)
    spec = _pk_spec(lp, width)
    flat = lambda x: _pk_pad(x.reshape(b, l, h * d), pad)
    shape = jax.ShapeDtypeStruct((b, lp, h * d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        partial(_pk_bwd_kernel, sm_scale=sm_scale, valid_len=l, dh=d),
        grid=(b, h * d // width),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[shape, shape, shape],
        compiler_params=_pk_params(),
        cost_estimate=_attn_cost(b * h, lp, d, bwd=True),
        interpret=INTERPRET,
    )(flat(q), flat(k), flat(v), flat(do))
    unpad = lambda x: x[:, :l].reshape(b, l, h, d)
    return unpad(dq), unpad(dk), unpad(dv)


# ---- SPMD partitioning ----------------------------------------------------
# pallas_call lowers to an opaque Mosaic custom call, which GSPMD cannot
# partition by itself: under a jit with a sharded batch it would all-gather
# the q/k/v activations onto every chip. Attention is independent across
# (batch, head), so both grid axes shard freely; custom_partitioning
# declares that and runs the kernel on the local shard. Sequence and
# head_dim must stay unsharded (scores need all keys of a head).
def _pk_sharding_rule(mesh, arg_shapes, shape):
    from jax.sharding import NamedSharding, PartitionSpec

    spec = arg_shapes[0].sharding.spec
    b_axis = spec[0] if len(spec) > 0 else None
    h_axis = spec[2] if len(spec) > 2 else None
    return NamedSharding(mesh, PartitionSpec(b_axis, None, h_axis, None))


def _spmd(n_out: int, n_args: int, local_fn):
    """custom_partitioning wrapper: shard (B, H), replicate (L, D).

    ``local_fn(*tensors, sm_scale)`` with sm_scale static (last positional).
    """
    from jax.experimental.custom_partitioning import custom_partitioning

    def infer(sm_scale, mesh, arg_shapes, result_shape):
        s = _pk_sharding_rule(mesh, arg_shapes, None)
        return (s,) * n_out if n_out > 1 else s

    def partition(sm_scale, mesh, arg_shapes, result_shape):
        s = _pk_sharding_rule(mesh, arg_shapes, None)
        out_s = (s,) * n_out if n_out > 1 else s
        lower = lambda *tensors: local_fn(*tensors, sm_scale)
        return mesh, lower, out_s, (s,) * n_args

    operand = "b l h d"
    rule = (
        ", ".join([operand] * n_args) + " -> " + ", ".join([operand] * n_out)
    )
    wrapped = custom_partitioning(local_fn, static_argnums=(n_args,))
    wrapped.def_partition(
        infer_sharding_from_operands=infer, partition=partition,
        # Shardy propagation rule; the partition callback still forces
        # (L, D) to be replicated on the actual lowering
        sharding_rule=rule,
    )
    return wrapped


_SPMD_CACHE: dict[str, object] = {}


def _get_spmd():
    if not _SPMD_CACHE:
        _SPMD_CACHE["fwd"] = _spmd(1, 3, _pk_impl_local)
        _SPMD_CACHE["bwd"] = _spmd(3, 4, _pk_bwd_local)
    return _SPMD_CACHE["fwd"], _SPMD_CACHE["bwd"]


def _pk_impl(q, k, v, sm_scale):
    fwd, _ = _get_spmd()
    return fwd(q, k, v, sm_scale)


def _pk_fwd(q, k, v, sm_scale):
    return _pk_impl(q, k, v, sm_scale), (q, k, v)


def _pk_bwd(sm_scale, res, do):
    q, k, v = res
    _, bwd = _get_spmd()
    return bwd(do, q, k, v, sm_scale)


packed_single_block_attention.defvjp(_pk_fwd, _pk_bwd)


# --------------------------------------------------------------------------
# q-blocked head-packed attention for long sequences (>= FLASH_MIN_SEQ).
# Extends the zero-transpose [B, L, H*D] layout to the tier that previously
# transposed into the stock flash kernel: with a 128-lane head block, the
# ENTIRE k/v of one (batch, lane-block) is < 1 MB even at 1920 tokens, so
# k/v stay VMEM-resident while q is streamed in row blocks and the [QB, L]
# score tile gets an exact (single-pass, not online) softmax.  The q-block
# grid axis is innermost and the k/v BlockSpecs are constant along it, so
# Mosaic revisits the same VMEM block without re-fetching from HBM.
# --------------------------------------------------------------------------
def _qb_block(lp: int) -> int:
    """Largest multiple-of-128 divisor of lp that is <= 512."""
    for qb in (512, 384, 256, 128):
        if lp % qb == 0:
            return qb
    return 128


def _qb_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, valid_len, dh):
    for h in range(q_ref.shape[-1] // dh):
        sl = slice(h * dh, (h + 1) * dh)
        q = q_ref[0, :, sl].astype(jnp.float32)  # [QB, dh]
        k = k_ref[0, :, sl].astype(jnp.float32)  # [Lp, dh]
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * sm_scale
        lp = k.shape[0]
        if valid_len < lp:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < valid_len, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        o_ref[0, :, sl] = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _qb_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                   dk_acc, dv_acc, *, sm_scale, valid_len, dh):
    qi = pl.program_id(2)
    n_q = pl.num_programs(2)

    @pl.when(qi == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    for h in range(q_ref.shape[-1] // dh):
        sl = slice(h * dh, (h + 1) * dh)
        q = q_ref[0, :, sl].astype(jnp.float32)   # [QB, dh]
        k = k_ref[0, :, sl].astype(jnp.float32)   # [Lp, dh]
        v = v_ref[0, :, sl].astype(jnp.float32)
        do = do_ref[0, :, sl].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * sm_scale
        lp = k.shape[0]
        if valid_len < lp:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < valid_len, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)            # [QB, Lp]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq_ref[0, :, sl] = (sm_scale * jax.lax.dot(
            ds, k, preferred_element_type=jnp.float32,
        )).astype(dq_ref.dtype)
        dk_acc[:, sl] += sm_scale * jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dv_acc[:, sl] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    @pl.when(qi == n_q - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _qb_params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )


def _qb_impl_local(q, k, v, sm_scale):
    b, l, h, d = q.shape
    pad = (-l) % _BLOCK
    lp = l + pad
    qb = _qb_block(lp)
    width = _pk_width(h, d)
    flat = lambda x: _pk_pad(x.reshape(b, l, h * d), pad)
    q_spec = pl.BlockSpec((1, qb, width), lambda b_, j, i: (b_, i, j))
    kv_spec = pl.BlockSpec((1, lp, width), lambda b_, j, i: (b_, 0, j))
    out = pl.pallas_call(
        partial(_qb_fwd_kernel, sm_scale=sm_scale, valid_len=l, dh=d),
        grid=(b, h * d // width, lp // qb),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, lp, h * d), q.dtype),
        compiler_params=_qb_params(),
        cost_estimate=_attn_cost(b * h, lp, d),
        interpret=INTERPRET,
    )(flat(q), flat(k), flat(v))
    return out[:, :l].reshape(b, l, h, d)


def _qb_bwd_local(do, q, k, v, sm_scale):
    from jax.experimental.pallas import tpu as pltpu

    b, l, h, d = q.shape
    pad = (-l) % _BLOCK
    lp = l + pad
    qb = _qb_block(lp)
    width = _pk_width(h, d)
    flat = lambda x: _pk_pad(x.reshape(b, l, h * d), pad)
    q_spec = pl.BlockSpec((1, qb, width), lambda b_, j, i: (b_, i, j))
    kv_spec = pl.BlockSpec((1, lp, width), lambda b_, j, i: (b_, 0, j))
    shape = jax.ShapeDtypeStruct((b, lp, h * d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        partial(_qb_bwd_kernel, sm_scale=sm_scale, valid_len=l, dh=d),
        grid=(b, h * d // width, lp // qb),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec],
        out_specs=[q_spec, kv_spec, kv_spec],
        out_shape=[shape, shape, shape],
        scratch_shapes=[
            pltpu.VMEM((lp, width), jnp.float32),
            pltpu.VMEM((lp, width), jnp.float32),
        ],
        compiler_params=_qb_params(),
        cost_estimate=_attn_cost(b * h, lp, d, bwd=True),
        interpret=INTERPRET,
    )(flat(q), flat(k), flat(v), flat(do))
    unpad = lambda x: x[:, :l].reshape(b, l, h, d)
    return unpad(dq), unpad(dk), unpad(dv)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def packed_qblock_attention(q, k, v, sm_scale):
    """[B, L, H, D] long-sequence attention; k/v VMEM-resident, q-blocked."""
    return _qb_impl(q, k, v, sm_scale)


def _qb_impl(q, k, v, sm_scale):
    fwd, _ = _get_qb_spmd()
    return fwd(q, k, v, sm_scale)


_QB_SPMD_CACHE: dict[str, object] = {}


def _get_qb_spmd():
    if not _QB_SPMD_CACHE:
        _QB_SPMD_CACHE["fwd"] = _spmd(1, 3, _qb_impl_local)
        _QB_SPMD_CACHE["bwd"] = _spmd(3, 4, _qb_bwd_local)
    return _QB_SPMD_CACHE["fwd"], _QB_SPMD_CACHE["bwd"]


def _qb_fwd(q, k, v, sm_scale):
    return _qb_impl(q, k, v, sm_scale), (q, k, v)


def _qb_bwd(sm_scale, res, do):
    q, k, v = res
    _, bwd = _get_qb_spmd()
    return bwd(do, q, k, v, sm_scale)


packed_qblock_attention.defvjp(_qb_fwd, _qb_bwd)
