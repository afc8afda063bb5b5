"""Analytic model FLOPs for the MAE train step (strict MFU accounting).

``mfu_executed`` (bench.py) counts what the compiled program executes —
including padded sequence tiles, backward-pass score recomputes inside
custom kernels, and any rematerialization.  Strict *model* MFU divides by
the FLOPs the MODEL mathematically requires: matmul terms only, unpadded
sequence lengths, backward = 2x forward, no recompute.  This module derives
that count from the static FusionPlan/MAEArch geometry, so it is independent
of both XLA's cost analysis and builder-supplied Pallas CostEstimates.

Conventions (standard transformer accounting, e.g. the PaLM appendix):
  dense [m, k] @ [k, n]          -> 2*m*k*n
  attention scores + mix         -> 2*l*l*inner each, per sample
  backward                       -> 2x forward for every matmul
  frozen submodules (probe)      -> forward only (1x)
Elementwise ops, norms, softmax and the loss are excluded (<1% of a ViT).
"""

from __future__ import annotations


def _block_flops(l: float, e: int, inner: int, mlp_dim: int) -> float:
    """One pre-LN transformer block forward, per sample of length l."""
    f = 2.0 * l * e * 3 * inner  # qkv
    f += 2.0 * l * l * inner * 2  # scores + attn @ v
    f += 2.0 * l * inner * e  # out proj
    f += 2.0 * l * e * mlp_dim * 2  # mlp fc1 + fc2
    return f


def _embed_flops(plan, e_enc: int, batch: int) -> float:
    """Patchify dense: every (date, band-group, position) token projected."""
    f = 0.0
    for spec in plan.mod_specs.values():
        for chans in spec.band_groups:
            tokens = spec.num_dates * spec.tokens_per_date
            f += 2.0 * batch * tokens * (chans * spec.patch_size**2) * e_enc
    return f


def _encoder_flops(plan, arch, inter_depth: int, batch: int,
                   masked: bool) -> float:
    """Per-stream encoders + shared trunk, at kept (masked) or full length."""
    enc_depth = arch.depth - inter_depth
    inner = arch.heads * arch.dim_head
    mlp = arch.embed_dim * arch.mlp_ratio
    f = 0.0
    kept_total = 0.0
    for s in plan.streams.values():
        l = s.seq_len - (s.num_masked if masked else 0)
        f += batch * s.batch_factor * enc_depth * _block_flops(
            l, arch.embed_dim, inner, mlp,
        )
        kept_total += l * s.batch_factor
    if inter_depth:
        # trunk concatenates the streams (mod/group modes: batch_factor == 1)
        f += batch * inter_depth * _block_flops(
            kept_total, arch.embed_dim, inner, mlp,
        )
    return f


def _decoder_flops(plan, arch, batch: int) -> float:
    """enc_to_dec + decoder blocks at FULL length + pixelify projections."""
    inner = arch.decoder_heads * arch.decoder_dim_head
    mlp = arch.decoder_dim * arch.decoder_mlp_ratio
    f = 0.0
    for s in plan.streams.values():
        kept = s.seq_len - s.num_masked
        f += 2.0 * batch * s.batch_factor * kept * arch.embed_dim * arch.decoder_dim
        f += batch * s.batch_factor * arch.decoder_depth * _block_flops(
            s.seq_len, arch.decoder_dim, inner, mlp,
        )
    for spec in plan.mod_specs.values():
        for chans in spec.band_groups:
            tokens = spec.num_dates * spec.tokens_per_date
            f += 2.0 * batch * tokens * arch.decoder_dim * (
                chans * spec.patch_size**2
            )
    return f


def _heads_flops(plan, arch, head_specs, ref_input: str | None,
                 batch: int) -> float:
    """Classification (attentive pool over all tokens) + segmentation
    (per-modality resize to ref grid, date-axis attentive reduce, pixel
    projection) — matmul terms only."""
    e = arch.embed_dim
    total_tokens = sum(
        s.seq_len * s.batch_factor for s in plan.streams.values()
    )
    f = 0.0
    for hs in head_specs:
        if hs.type_target == "segment":
            if ref_input is None:
                continue
            ref_l = plan.mod_specs[ref_input].tokens_per_date
            dates_total = sum(
                spec.num_dates * spec.len_bands
                for spec in plan.mod_specs.values()
            )
            # bilinear resize in matrix form: A[G,g] @ X[g,g] @ A^T per
            # (date, channel) — two small matmuls per modality
            for spec in plan.mod_specs.values():
                g = spec.grid
                big = int(ref_l**0.5)
                d = spec.num_dates * spec.len_bands
                f += 2.0 * batch * d * e * (big * g * g + big * big * g)
            # attentive date-reduce at the ref grid: LN + kv proj dominate
            f += 2.0 * batch * dates_total * ref_l * e * (2 * e)
            f += 2.0 * batch * ref_l * e * hs.num_classes * hs.pixel_patch**2
        else:
            # attentive pool over the concatenated token set + linear
            f += 2.0 * batch * total_tokens * e * (2 * e)
            f += 2.0 * batch * e * hs.num_classes
    return f


def mae_model_flops(plan, arch, inter_depth: int, phase: str,
                    batch_size: int, head_specs=(), ref_input=None) -> float:
    """Model FLOPs for ONE optimizer step of the given phase.

    pretrain: embed + masked-length encoder/trunk + full-length decoder,
              everything trained -> 3x forward.
    finetune: embed + full-length encoder/trunk + heads, all trained -> 3x.
    probe:    encoder side is frozen (stop_gradient) -> forward only;
              heads train -> 3x.
    """
    embed = _embed_flops(plan, arch.embed_dim, batch_size)
    if phase == "pretrain":
        fwd = (
            embed
            + _encoder_flops(plan, arch, inter_depth, batch_size, masked=True)
            + _decoder_flops(plan, arch, batch_size)
        )
        return 3.0 * fwd
    enc = embed + _encoder_flops(plan, arch, inter_depth, batch_size,
                                 masked=False)
    heads = _heads_flops(plan, arch, head_specs, ref_input, batch_size)
    if phase == "probe":
        return enc + 3.0 * heads
    return 3.0 * (enc + heads)
