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
    )(qf, kf, vf, dof)
    unpad = lambda x: x[:, :l].reshape(b, h, l, d)
    return unpad(dq), unpad(dk), unpad(dv)


single_block_attention.defvjp(_sb_fwd, _sb_bwd)
