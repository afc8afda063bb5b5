"""Transformer encoder/decoder blocks (pre-LN ViT).

Block structure mirrors the reference's encoder stack (vit_pytorch Transformer
used at /root/reference/maestro/ssl/mae.py:133-176): pre-LayerNorm attention
(qkv bias-free, output projection with bias) and pre-LayerNorm MLP with exact
GELU, residual connections, and a final LayerNorm after the last block.

TPU-first notes: computation runs in ``dtype`` (bf16 by default) with fp32
params and fp32 softmax; attention is a plain batched matmul formulation that
XLA fuses well at these sequence lengths (<= a few thousand tokens), with a
Pallas flash-attention path for the long-sequence configs (ops/attention.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class Attention(nn.Module):
    """Multi-head self-attention; inner width = heads * dim_head."""

    dim: int
    heads: int
    dim_head: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        b, l, _ = x.shape
        shape = (b, l, self.heads, self.dim_head)
        q = q.reshape(shape)
        k = k.reshape(shape)
        v = v.reshape(shape)

        from maestro_tpu.ops.attention import mha_blhd

        out = mha_blhd(q, k, v, sm_scale=self.dim_head**-0.5)
        out = out.reshape(b, l, inner)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(out)


class FeedForward(nn.Module):
    """Pre-LN MLP with exact GELU."""

    dim: int
    hidden_dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from jax.ad_checkpoint import checkpoint_name

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        y = checkpoint_name(y, "mlp_ln")
        y = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(y)
        y = checkpoint_name(y, "mlp_fc1")
        # under the "gelu" remat policy only the two named tensors are saved:
        # the [.., hidden_dim] GELU output is recomputed from fc1's output in
        # the backward pass instead of being written to HBM a second time
        # (checkpoint_name is a no-op without remat)
        y = nn.gelu(y, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)


class Block(nn.Module):
    """Pre-LN transformer block: x + attn(ln(x)); x + mlp(ln(x))."""

    dim: int
    heads: int
    dim_head: int
    mlp_dim: int
    dtype: Dtype = jnp.bfloat16
    remat_mlp: bool | str = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x + Attention(
            self.dim, self.heads, self.dim_head, dtype=self.dtype, name="attn",
        )(x)
        if self.remat_mlp == "gelu":
            ff_cls = nn.remat(
                FeedForward,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "mlp_ln", "mlp_fc1",
                ),
            )
        elif self.remat_mlp:
            ff_cls = nn.remat(FeedForward)
        else:
            ff_cls = FeedForward
        return x + ff_cls(self.dim, self.mlp_dim, dtype=self.dtype, name="mlp")(x)


class Transformer(nn.Module):
    """Stack of blocks + final LayerNorm.

    ``remat`` trades activation memory for recompute (enables big batches):
      False        — save everything (fastest per step, most memory)
      True/"full"  — rematerialize whole blocks
      "dots"       — rematerialize blocks but save matmul outputs
                     (recomputes LN/GELU/softmax only — the usual sweet spot)
      "mlp"        — rematerialize only the MLPs, attention saved
    """

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dtype: Dtype = jnp.bfloat16
    remat: Any = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        remat_mlp = False
        if self.remat in (True, "full"):
            block_cls = nn.remat(Block)
        elif self.remat == "dots":
            block_cls = nn.remat(
                Block,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        elif self.remat == "gelu":
            # MLP-scoped: save only the LN and fc1 outputs; the GELU output
            # (the second [.., hidden_dim] HBM write) is recomputed in bwd
            block_cls, remat_mlp = Block, "gelu"
        elif self.remat == "mlp":
            block_cls, remat_mlp = Block, True
        else:
            block_cls = Block
        for i in range(self.depth):
            x = block_cls(
                self.dim,
                self.heads,
                self.dim_head,
                self.mlp_dim,
                dtype=self.dtype,
                remat_mlp=remat_mlp,
                name=f"block{i}",
            )(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class AttentiveReduce(nn.Module):
    """Single-learned-query multi-head attention pooling.

    Reference: /root/reference/maestro/layers/head.py:28-63.
    [B, L, C] -> [B, C], or [B, D, L, C] -> [B, L, C] (reduce axis 1).

    The rank-4 form is layout-native for the segmentation head: the caller's
    [B, dates, positions, C] tensor is pooled over the date axis in place —
    no [B, D, L, C] -> [B*L, D, C] transpose before and no un-transpose
    after.  Those copies (plus their recompute under the head's remat) were
    ~1/3 of the r2 finetune segmentation-head time.  All contractions keep
    the position axis minor-adjacent so XLA lowers them as reductions over
    the sublane (date) axis with no layout changes.
    """

    dim: int
    heads: int = 8
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        squeeze = x.ndim == 3
        if squeeze:  # [B, D, C] == [B, D, 1, C] pooled over D
            x = x[:, :, None, :]
        b, d, l, _ = x.shape
        dh = self.dim // self.heads

        if self._use_fused_pool(x):
            return self._fused_pool(x)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        kv = nn.Dense(self.dim * 2, use_bias=False, dtype=self.dtype, name="to_kv")(y)
        k, v = jnp.split(kv, 2, axis=-1)
        k = k.reshape(b, d, l, self.heads, dh)
        v = v.reshape(b, d, l, self.heads, dh)

        query = self.param(
            "query", nn.initializers.normal(1.0), (self.dim,), jnp.float32,
        )
        q = query.reshape(self.heads, dh).astype(self.dtype)
        logits = jnp.einsum(
            "he,bdlhe->bdlh", q, k, preferred_element_type=jnp.float32,
        ) * dh**-0.5
        attn = jax.nn.softmax(logits, axis=1).astype(self.dtype)
        out = jnp.einsum("bdlh,bdlhe->blhe", attn, v)
        out = out.reshape(b, l, self.dim)
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_fc")(out)
        return out[:, 0] if squeeze else out

    def _use_fused_pool(self, x: jnp.ndarray) -> bool:
        """Fused Pallas pool for the hot many-position date reduction.

        The segmentation-head regime — pool a short date axis at every ref
        position — spends more on LN/kv HBM round-trips than on math in the
        XLA formulation; ops/attn_pool.py streams it through VMEM once.
        The kernel needs 128-aligned lanes; anything else (including the
        rank-3 classification pool, where positions==1) keeps the XLA path.
        """
        from maestro_tpu.ops import attn_pool as ap

        if not (jax.default_backend() == "tpu" or ap.INTERPRET):
            return False
        b, d, l, e = x.shape
        return (
            l >= 32
            and d >= 2
            and e == self.dim
            and e % 128 == 0
            and e % self.heads == 0
        )

    def _fused_pool(self, x: jnp.ndarray) -> jnp.ndarray:
        from maestro_tpu.ops.attn_pool import attentive_pool

        # materialize the XLA path's params (same tree: norm/to_kv/query)
        # on a 1-token probe; the dead probe ops are DCE'd by XLA
        norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        to_kv = nn.Dense(self.dim * 2, use_bias=False, dtype=self.dtype,
                         name="to_kv")
        _ = to_kv(norm(jax.lax.stop_gradient(x[:1, :1, :1])))
        query = self.param(
            "query", nn.initializers.normal(1.0), (self.dim,), jnp.float32,
        )
        ln = self.get_variable("params", "norm")
        wkv = self.get_variable("params", "to_kv")["kernel"]
        out = attentive_pool(
            x.astype(self.dtype), ln["scale"], ln["bias"], wkv, query,
            self.heads,
        )
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_fc")(out)
