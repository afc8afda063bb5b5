"""MAE checkpoint-port roundtrip: params -> torch-layout dict -> params.

Builds the inverse mapping in the test (JAX params to a reference-layout
state dict) and checks ``port_mae_state_dict`` restores every leaf, proving
the key naming and layout transposes are mutually consistent.
"""

import jax
import jax.numpy as jnp
import numpy as np

from maestro_tpu.conf import DatasetsConfig, MaskConfig, ModelConfig
from maestro_tpu.models.mae import build_model
from maestro_tpu.port.torch_port import merge_into_template, port_mae_state_dict


def _to_torch_layout(params, plan) -> dict[str, np.ndarray]:
    """Inverse of the porter: my param tree -> reference-style state dict."""
    src: dict[str, np.ndarray] = {}
    p = params["params"]

    def put_transformer(prefix, tree):
        depth = len([k for k in tree if k.startswith("block")])
        for i in range(depth):
            blk = tree[f"block{i}"]
            a, m = f"{prefix}layers.{i}.0.", f"{prefix}layers.{i}.1."
            src[f"{a}norm.weight"] = blk["attn"]["norm"]["scale"]
            src[f"{a}norm.bias"] = blk["attn"]["norm"]["bias"]
            src[f"{a}to_qkv.weight"] = np.asarray(blk["attn"]["qkv"]["kernel"]).T
            src[f"{a}to_out.0.weight"] = np.asarray(blk["attn"]["out"]["kernel"]).T
            src[f"{a}to_out.0.bias"] = blk["attn"]["out"]["bias"]
            src[f"{m}net.0.weight"] = blk["mlp"]["norm"]["scale"]
            src[f"{m}net.0.bias"] = blk["mlp"]["norm"]["bias"]
            src[f"{m}net.1.weight"] = np.asarray(blk["mlp"]["fc1"]["kernel"]).T
            src[f"{m}net.1.bias"] = blk["mlp"]["fc1"]["bias"]
            src[f"{m}net.4.weight"] = np.asarray(blk["mlp"]["fc2"]["kernel"]).T
            src[f"{m}net.4.bias"] = blk["mlp"]["fc2"]["bias"]
        src[f"{prefix}norm.weight"] = tree["norm"]["scale"]
        src[f"{prefix}norm.bias"] = tree["norm"]["bias"]

    for key, tree in p.items():
        if key.startswith("patch_embed_"):
            embed = key.removeprefix("patch_embed_")
            g = 0
            while f"proj{g}" in tree:
                conv = f"patch_embed.{embed}.patchify_bands.{g}."
                kern = np.asarray(tree[f"proj{g}"]["kernel"])  # [C*p*p, E]
                spec = next(s for s in plan.mod_specs.values()
                            if s.name_embed == embed)
                c = spec.band_groups[g]
                pp = spec.patch_size
                src[f"{conv}conv.weight"] = kern.T.reshape(-1, c, pp, pp)
                src[f"{conv}conv.bias"] = tree[f"proj{g}"]["bias"]
                src[f"{conv}norm.weight"] = tree[f"norm{g}_scale"]
                src[f"{conv}norm.bias"] = tree[f"norm{g}_bias"]
                g += 1
        elif key.startswith("pixelify_"):
            embed = key.removeprefix("pixelify_")
            g = 0
            while f"proj{g}" in tree:
                rec = f"embed_to_rec.{embed}.pixelify_bands.{g}."
                spec = next(s for s in plan.mod_specs.values()
                            if s.name_embed == embed)
                c, pp = spec.band_groups[g], spec.patch_size
                kern = np.asarray(tree[f"proj{g}"]["kernel"])  # [E, C*p*p]
                e = kern.shape[0]
                # our (C, ph, pw) -> torch pixel-shuffle (ph, pw, C) order
                k = kern.reshape(e, c, pp, pp).transpose(0, 2, 3, 1)
                src[f"{rec}conv.weight"] = (
                    k.reshape(e, -1).T[:, :, None, None]
                )
                bias = np.asarray(tree[f"proj{g}"]["bias"])
                src[f"{rec}conv.bias"] = (
                    bias.reshape(c, pp, pp).transpose(1, 2, 0).reshape(-1)
                )
                g += 1
        elif key.startswith("mask_token_"):
            src[f"mask_token.{key.removeprefix('mask_token_')}"] = tree
        elif key.startswith("encoders_"):
            put_transformer(f"encoder.{key.removeprefix('encoders_')}.", tree)
        elif key.startswith("decoders_"):
            put_transformer(f"decoder.{key.removeprefix('decoders_')}.", tree)
        elif key == "encoder_inter":
            put_transformer("encoder_inter.", tree)
        elif key.startswith("enc_to_dec_"):
            name = key.removeprefix("enc_to_dec_")
            src[f"enc_to_dec.{name}.weight"] = np.asarray(tree["kernel"]).T
            src[f"enc_to_dec.{name}.bias"] = tree["bias"]
        elif key.startswith("heads_"):
            name = key.removeprefix("heads_")
            if "linear" in tree:
                src[f"heads.{name}.linear.weight"] = np.asarray(
                    tree["linear"]["kernel"],
                ).T
                src[f"heads.{name}.linear.bias"] = tree["linear"]["bias"]
            if "reduce" in tree:
                r = tree["reduce"]
                pre = f"heads.{name}.reduce."
                src[f"{pre}norm.weight"] = r["norm"]["scale"]
                src[f"{pre}norm.bias"] = r["norm"]["bias"]
                src[f"{pre}norm_fc.weight"] = r["norm_fc"]["scale"]
                src[f"{pre}norm_fc.bias"] = r["norm_fc"]["bias"]
                src[f"{pre}to_kv.weight"] = np.asarray(r["to_kv"]["kernel"]).T
                src[f"{pre}query"] = r["query"]
    return {f"model.{k}": np.asarray(v) for k, v in src.items()}


def test_port_roundtrip(datasets_treesat):
    cfg = ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1)
    model, plan = build_model(datasets_treesat, MaskConfig(), cfg,
                              dtype=jnp.float32)
    from maestro_tpu.utils.testing import make_synthetic_batch

    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(datasets_treesat.dataset, 1).items()}
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, "pretrain"),
    )(batch)

    torch_sd = _to_torch_layout(jax.tree.map(np.asarray, params), plan)
    ported = port_mae_state_dict(torch_sd, plan, model.head_specs)
    merged, used, missing = merge_into_template(ported, params)

    # every leaf must come from the ported dict, none left at fresh init
    assert not missing, f"unported leaves: {missing[:10]}"
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(merged)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))
