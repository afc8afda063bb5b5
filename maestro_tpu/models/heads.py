"""Downstream heads (classification / dense segmentation).

Reference: /root/reference/maestro/layers/head.py:66-130.  Probe-phase feature
detaching (head.py:17-25) is done with ``lax.stop_gradient`` at the call site.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import image as jax_image

from maestro_tpu.models.vit import AttentiveReduce
from maestro_tpu.ops.patch import unpatchify_pixels

Dtype = Any


def resize_matrix(in_grid: int, out_grid: int) -> jnp.ndarray:
    """[out, in] matrix form of bilinear 1-D interpolation.

    Linear resize is separable and linear, so the 2-D grid resize equals
    ``A @ X @ A.T`` — which lets a row slice of the output be computed
    without materializing the full resized grid (A[rows] @ X @ A.T).
    antialias=False matches the reference's F.interpolate (mim.py:362-366),
    which applies no prefilter when a modality grid DOWNsamples to the ref
    grid (e.g. PASTIS spot 10 -> s2 8).
    """
    return jax_image.resize(jnp.eye(in_grid), (out_grid, in_grid), "linear",
                            antialias=False)


class ClassificationHead(nn.Module):
    """[B, N, C] -> [B, num_classes] via mean or attentive pooling."""

    type_head: str  # "linear" (mean pooling) | "attentive"
    dim: int
    num_classes: int
    heads: int = 8
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.type_head == "attentive":
            pooled = AttentiveReduce(
                self.dim, heads=self.heads, dtype=self.dtype, name="reduce",
            )(x)
        else:
            pooled = jnp.mean(x, axis=1)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="linear")(
            pooled.astype(jnp.float32),
        )
        return logits


class ChunkedSegHead(nn.Module):
    """Segmentation head over per-modality token grids, chunked by ref rows.

    Functionally ``PixelifyHead(concat_mods(resize_to_ref_grid(x)))`` — the
    reference's segmentation path (mim.py:343-394 + head.py:96-130) — but the
    [B, sum(dates), ref_grid^2, E] date-stacked tensor is never materialized:
    the bilinear resize is applied in matrix form per row-chunk of the ref
    grid and the (per-position independent) date reduction + projection run
    inside a ``lax.scan`` over chunks.  This is what lets FLAIR-scale
    finetune fit v5e HBM.  Parameter tree ("reduce", "proj") is identical to
    PixelifyHead, so checkpoints are interchangeable.
    """

    type_head: str
    dim: int
    num_classes: int
    patch_size: int  # target pixels per ref-grid token
    ref_grid: int
    mod_grids: tuple[int, ...]  # native token grid per modality (plan order)
    heads: int = 8
    chunk_rows: int = 2  # ref-grid rows per scan step
    # lax.scan unroll factor for the chunk loop: >1 replicates the (remat'd)
    # body in the compiled graph, trading compile time + a little HBM for
    # the per-iteration loop/dispatch overhead and cross-chunk overlap
    unroll: int = 1
    dtype: Dtype = jnp.bfloat16

    def setup(self) -> None:
        if self.type_head == "attentive":
            self.reduce = AttentiveReduce(
                self.dim, heads=self.heads, dtype=self.dtype, name="reduce",
            )
        # proj runs in the compute dtype (bf16 on TPU, like the reference's
        # 16-mixed autocast); fp32 params, logits cast fp32 by the loss
        self.proj = nn.Dense(
            self.num_classes * self.patch_size**2, dtype=self.dtype,
            name="proj",
        )

    def _chunk(self, carry, a_rows, xs):
        """One ref-grid row chunk: resize-slice + concat + reduce + proj.

        The column resize runs in-chunk (A[rows] @ X @ A_full^T) rather than
        hoisted before the scan: hoisting saves redundant FLOPs but keeps
        ~500 MB of column-resized grids live through the scan bwd, which
        pushed bs32 finetune back over v5e HBM (measured).
        """
        parts = []
        full_mats = [resize_matrix(g, self.ref_grid) for g in self.mod_grids]
        for a, x, g, a_full in zip(a_rows, xs, self.mod_grids, full_mats):
            b, dg, l, e = x.shape
            xg = x.reshape(b, dg, g, g, e)
            part = jnp.einsum(
                "rg,bdghe,sh->bdrse", a.astype(x.dtype), xg,
                a_full.astype(x.dtype),
            )
            parts.append(part.reshape(b, dg, -1, e))
        x_ref = jnp.concatenate(parts, axis=1)  # [B, DG_tot, r*G, E]
        b, d, l, c = x_ref.shape
        if self.type_head == "attentive":
            # layout-native rank-4 reduce over the date axis — no
            # [B,D,L,C] <-> [B*L,D,C] transposes inside the remat'd chunk
            y = self.reduce(x_ref)  # [B, r*G, dim]
        else:
            y = jnp.mean(x_ref, axis=1)
        y = self.proj(y)  # [B, r*G, K*p^2]
        # pixel-shuffle inside the chunk: a whole-grid unpatchify transpose
        # has (p, p) minor dims that lane-pad 8x on TPU (a 1.9 GB temp at
        # FLAIR scale); per chunk it stays bounded. Feature order (C, ph, pw)
        # as in ops/patch.unpatchify_pixels.
        g = self.ref_grid
        r = l // g
        p, k = self.patch_size, self.num_classes
        y = y.reshape(b, r, g, k, p, p).transpose(0, 3, 1, 4, 2, 5)
        return carry, y.reshape(b, k, r * p, g * p)

    def __call__(self, xs: tuple[jnp.ndarray, ...]) -> jnp.ndarray:
        grid = self.ref_grid
        rows = self.chunk_rows if grid % self.chunk_rows == 0 else 1
        n = grid // rows
        a_stacks = tuple(
            resize_matrix(g, grid).reshape(n, rows, g)
            for g in self.mod_grids
        )
        if n > 1:
            # remat-scan: without remat on the body, scan's autodiff stacks
            # every iteration's residuals — rebuilding the full date-stacked
            # grid the chunking exists to avoid.  The policy keeps the fused
            # pool's named residuals (out/m/den, ~L*E per chunk — see
            # ops/attn_pool._vjp_fwd): the recompute pass then only replays
            # the resize einsum that rebuilds x, not the pool kernel itself,
            # which was a full quarter of the pool's step time (the r4 probe
            # trace showed the fwd pallas_call twice per chunk at 27.5 ms a
            # pass).
            scan = nn.scan(
                nn.remat(
                    ChunkedSegHead._chunk,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "attn_pool_residuals",
                    ),
                ),
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=(0, nn.broadcast), out_axes=0,
                unroll=self.unroll if n % self.unroll == 0 else 1,
            )
            _, ys = scan(self, None, a_stacks, xs)  # [n, B, K, r*p, W]
            b, k, w = ys.shape[1], ys.shape[2], ys.shape[4]
            pixels = ys.transpose(1, 2, 0, 3, 4).reshape(b, k, w, w)
        else:
            _, pixels = self._chunk(None, tuple(a[0] for a in a_stacks), xs)
        return pixels[:, None]  # [B, 1, K, H, W]


class PixelifyHead(nn.Module):
    """[B, D, L, C] -> dense logits [B, 1, num_classes, H, W].

    Attentive (or mean) reduction over the date axis per location, then a
    dense pixel-shuffle upsampling to the target grid.
    """

    type_head: str
    dim: int
    num_classes: int
    patch_size: int  # upsampling factor: target pixels per ref-grid token
    heads: int = 8
    dtype: Dtype = jnp.bfloat16

    # cap on the fp32 footprint of one date-reduce chunk; the per-position
    # reductions are independent, so rows are scanned in slices — without
    # this, FLAIR-scale inputs ([B, ~65 dates, 1024 positions, 768]) upcast
    # inside the reduce's LayerNorm dominate finetune HBM (v5e OOM)
    _CHUNK_BYTES = 256 * 1024 * 1024

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, d, l, c = x.shape
        if self.type_head == "attentive":
            reduce = AttentiveReduce(
                self.dim, heads=self.heads, dtype=self.dtype, name="reduce",
            )
            # layout-native rank-4 reduce over the date axis; position-axis
            # chunks are scanned so the fp32 LN upcast stays bounded
            n = max(1, -(-b * l * d * c * 4 // self._CHUNK_BYTES))
            while n < l and l % n:
                n += 1
            if n > 1:
                def body(mdl, carry, xs):
                    return carry, mdl(xs)

                scan = nn.scan(
                    body, variable_broadcast="params",
                    split_rngs={"params": False},
                )
                xs = jnp.moveaxis(x.reshape(b, d, n, l // n, c), 2, 0)
                _, y = scan(reduce, None, xs)  # [n, B, l/n, dim]
                y = jnp.moveaxis(y, 0, 1).reshape(b, 1, l, self.dim)
            else:
                y = reduce(x).reshape(b, 1, l, self.dim)
        else:
            y = jnp.mean(x, axis=1, keepdims=True)
        y = nn.Dense(
            self.num_classes * self.patch_size**2, dtype=jnp.float32, name="proj",
        )(y.astype(jnp.float32))
        return unpatchify_pixels(y, self.patch_size, self.num_classes)
