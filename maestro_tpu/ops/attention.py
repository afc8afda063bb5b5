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

import jax
import jax.numpy as jnp

FLASH_MIN_SEQ = 512  # below this, XLA's fused path is as fast
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
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu" and seq >= FLASH_MIN_SEQ
    if use_flash:
        return _flash(q, k, v, sm_scale)
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
