"""Port reference (torch / vit-pytorch) MAESTRO checkpoints to JAX params.

The released checkpoints (HuggingFace, reference README.md:37-39) are
pytorch-lightning .ckpt files whose ``state_dict`` uses the reference module
layout (ssl/mae.py + layers/embed.py + layers/head.py, with vit-pytorch
Transformer naming: ``layers.{i}.0`` = attention, ``layers.{i}.1`` = MLP,
MLP Sequential indices 0/1/4 = LN/fc1/fc2).  This module maps those tensors
onto the maestro_tpu param tree:

  torch Conv2d(k=p, s=p) [E, C, p, p]  ->  Dense kernel [C*p*p, E]
  torch Linear [out, in]               ->  Dense kernel [in, out]
  GroupNorm(1) weight/bias             ->  norm{g}_scale / norm{g}_bias
  Pixelify 1x1 conv [C*p^2, E, 1, 1]   ->  Dense kernel [E, C*p^2]

Unmatched keys are reported, not fatal (strict=False semantics, matching
run_experiment.py:66-74 warm starts).
"""

from __future__ import annotations

import logging
from typing import Any

import numpy as np

log = logging.getLogger("maestro_tpu.port")


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a torch .ckpt/.pth into numpy (lightning 'state_dict' unwrapped)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in state.items()}


def _conv_to_dense(w: np.ndarray) -> np.ndarray:
    """[E, C, p, p] -> [C*p*p, E] (feature order (C, ph, pw))."""
    e = w.shape[0]
    return w.reshape(e, -1).T


def _conv1x1_to_dense(w: np.ndarray) -> np.ndarray:
    """[out, in, 1, 1] -> [in, out]."""
    return w[:, :, 0, 0].T


def _pixelify_kernel(w: np.ndarray, patch: int, channels: int) -> np.ndarray:
    """Pixelify 1x1 conv [C*p*p, E, 1, 1] -> Dense kernel [E, C*p*p].

    The reference pixel-shuffles with output features in (ph, pw, C) order
    ("(p1 p2 c) h w", embed.py:154-160); maestro_tpu token space uses
    (C, ph, pw) everywhere, so the output features are permuted here.
    """
    dense = w[:, :, 0, 0].T  # [E, out] in (ph, pw, C) order
    e = dense.shape[0]
    out = dense.reshape(e, patch, patch, channels)
    return out.transpose(0, 3, 1, 2).reshape(e, -1)


def _pixelify_bias(b: np.ndarray, patch: int, channels: int) -> np.ndarray:
    """(ph, pw, C)-ordered bias -> (C, ph, pw)."""
    return b.reshape(patch, patch, channels).transpose(2, 0, 1).reshape(-1)


def _linear(w: np.ndarray) -> np.ndarray:
    return w.T


def map_transformer(src: dict, prefix: str, depth: int) -> dict[str, Any]:
    """vit-pytorch Transformer -> models/vit.py Transformer params."""
    out: dict[str, Any] = {}
    for i in range(depth):
        attn, mlp = f"{prefix}layers.{i}.0.", f"{prefix}layers.{i}.1."
        out[f"block{i}"] = {
            "attn": {
                "norm": {"scale": src[f"{attn}norm.weight"],
                         "bias": src[f"{attn}norm.bias"]},
                "qkv": {"kernel": _linear(src[f"{attn}to_qkv.weight"])},
                "out": {"kernel": _linear(src[f"{attn}to_out.0.weight"]),
                        "bias": src[f"{attn}to_out.0.bias"]},
            },
            "mlp": {
                "norm": {"scale": src[f"{mlp}net.0.weight"],
                         "bias": src[f"{mlp}net.0.bias"]},
                "fc1": {"kernel": _linear(src[f"{mlp}net.1.weight"]),
                        "bias": src[f"{mlp}net.1.bias"]},
                "fc2": {"kernel": _linear(src[f"{mlp}net.4.weight"]),
                        "bias": src[f"{mlp}net.4.bias"]},
            },
        }
    out["norm"] = {"scale": src[f"{prefix}norm.weight"],
                   "bias": src[f"{prefix}norm.bias"]}
    return out


def map_attentive_reduce(src: dict, prefix: str) -> dict[str, Any]:
    return {
        "norm": {"scale": src[f"{prefix}norm.weight"],
                 "bias": src[f"{prefix}norm.bias"]},
        "norm_fc": {"scale": src[f"{prefix}norm_fc.weight"],
                    "bias": src[f"{prefix}norm_fc.bias"]},
        "to_kv": {"kernel": _linear(src[f"{prefix}to_kv.weight"])},
        "query": src[f"{prefix}query"],
    }


def port_mae_state_dict(
    src: dict[str, np.ndarray],
    plan,
    head_specs=(),
    torch_prefix: str = "model.",
) -> dict[str, Any]:
    """Reference MAE state dict -> {'params': ...} tree for MaestroMAE."""
    src = {k.removeprefix(torch_prefix): v for k, v in src.items()
           if k.startswith(torch_prefix)}
    params: dict[str, Any] = {}

    embeds_done = set()
    for name, spec in plan.mod_specs.items():
        embed = spec.name_embed
        if embed in embeds_done:
            continue
        embeds_done.add(embed)
        pe: dict[str, Any] = {}
        pr: dict[str, Any] = {}
        for g in range(spec.len_bands):
            conv = f"patch_embed.{embed}.patchify_bands.{g}."
            pe[f"proj{g}"] = {
                "kernel": _conv_to_dense(src[f"{conv}conv.weight"]),
                "bias": src[f"{conv}conv.bias"],
            }
            pe[f"norm{g}_scale"] = src[f"{conv}norm.weight"]
            pe[f"norm{g}_bias"] = src[f"{conv}norm.bias"]
            rec = f"embed_to_rec.{embed}.pixelify_bands.{g}."
            chans = spec.band_groups[g]
            pr[f"proj{g}"] = {
                "kernel": _pixelify_kernel(
                    src[f"{rec}conv.weight"], spec.patch_size, chans,
                ),
                "bias": _pixelify_bias(
                    src[f"{rec}conv.bias"], spec.patch_size, chans,
                ),
            }
        params[f"patch_embed_{embed}"] = pe
        params[f"pixelify_{embed}"] = pr

    for name in plan.mods:
        key = f"mask_token.{name}"
        if key in src:
            params[f"mask_token_{name}"] = src[key]

    for enc in plan.encoder_names:
        if f"encoder.{enc}.norm.weight" in src:
            depth = _count_blocks(src, f"encoder.{enc}.layers.")
            params[f"encoders_{enc}"] = map_transformer(
                src, f"encoder.{enc}.", depth,
            )
        if f"enc_to_dec.{enc}.weight" in src:
            params[f"enc_to_dec_{enc}"] = {
                "kernel": _linear(src[f"enc_to_dec.{enc}.weight"]),
                "bias": src[f"enc_to_dec.{enc}.bias"],
            }
        if f"decoder.{enc}.norm.weight" in src:
            depth = _count_blocks(src, f"decoder.{enc}.layers.")
            params[f"decoders_{enc}"] = map_transformer(
                src, f"decoder.{enc}.", depth,
            )
    if "encoder_inter.norm.weight" in src:
        depth = _count_blocks(src, "encoder_inter.layers.")
        params["encoder_inter"] = map_transformer(src, "encoder_inter.", depth)

    for hs in head_specs:
        prefix = f"heads.{hs.name}."
        if f"{prefix}linear.weight" in src:  # classification head
            head = {
                "linear": {"kernel": _linear(src[f"{prefix}linear.weight"]),
                           "bias": src[f"{prefix}linear.bias"]},
            }
            if f"{prefix}reduce.query" in src:
                head["reduce"] = map_attentive_reduce(src, f"{prefix}reduce.")
            params[f"heads_{hs.name}"] = head
        elif f"{prefix}conv.weight" in src:  # pixelify (segmentation) head
            head = {
                "proj": {
                    "kernel": _pixelify_kernel(
                        src[f"{prefix}conv.weight"], hs.pixel_patch,
                        hs.num_classes,
                    ),
                    "bias": _pixelify_bias(
                        src[f"{prefix}conv.bias"], hs.pixel_patch,
                        hs.num_classes,
                    ),
                },
            }
            if f"{prefix}reduce.query" in src:
                head["reduce"] = map_attentive_reduce(src, f"{prefix}reduce.")
            params[f"heads_{hs.name}"] = head

    return {"params": params}


def _count_blocks(src: dict, prefix: str) -> int:
    idxs = set()
    for k in src:
        if k.startswith(prefix):
            idxs.add(int(k[len(prefix):].split(".")[0]))
    return max(idxs) + 1 if idxs else 0


def merge_into_template(ported, template) -> tuple[Any, list[str], list[str]]:
    """Copy ported leaves into a fresh-init template (strict=False).

    Returns (params, used_paths, missing_paths).
    """
    import jax

    flat_ported = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(ported)[0]:
        flat_ported[tuple(str(getattr(k, "key", k)) for k in path)] = leaf

    used, missing = [], []

    def pick(path, leaf):
        key = tuple(str(getattr(k, "key", k)) for k in path)
        src = flat_ported.get(key)
        if src is not None and np.shape(src) == np.shape(leaf):
            used.append("/".join(key))
            return np.asarray(src, dtype=leaf.dtype)
        missing.append("/".join(key))
        return leaf

    merged = jax.tree_util.tree_map_with_path(pick, template)
    if missing:
        log.info("port: %d leaves matched, %d kept fresh init",
                 len(used), len(missing))
    return merged, used, missing
