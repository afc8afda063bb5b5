"""scripts/port_fm.py end-to-end: synthetic released-layout checkpoint per
adapter -> orbax warm start -> probe-phase params whose backbone leaves match
the source through the documented surgery.

The synthetic sources follow each release's on-disk layout (reference
surgery semantics: utils.py:24-121, dofa.py:460-678, croma.py:386-436,
satmae.py:252-330, prithvi.py:154-182) at the test-only micro sizes.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import jax.numpy as jnp  # noqa: E402

import port_fm  # noqa: E402
from maestro_tpu.conf import (  # noqa: E402
    DataConfig,
    DatasetsConfig,
    ExperimentConfig,
    ModelConfig,
    RunConfig,
    TrainerConfig,
)
from maestro_tpu.train.runtime import Experiment  # noqa: E402
from maestro_tpu.utils.testing import make_synthetic_batch  # noqa: E402

D = 64  # micro embed dim

_RNG = np.random.default_rng(42)


def _rand(*shape):
    # fresh draw per call: identically-shaped tensors must differ, so a
    # port map that swaps two same-shaped leaves fails the equality checks
    return _RNG.normal(0, 0.05, shape).astype(np.float32)


def _timm_block(prefix: str, dim: int, ls: bool = False) -> dict:
    out = {
        f"{prefix}norm1.weight": _rand(dim), f"{prefix}norm1.bias": _rand(dim),
        f"{prefix}attn.qkv.weight": _rand(3 * dim, dim),
        f"{prefix}attn.qkv.bias": _rand(3 * dim),
        f"{prefix}attn.proj.weight": _rand(dim, dim),
        f"{prefix}attn.proj.bias": _rand(dim),
        f"{prefix}norm2.weight": _rand(dim), f"{prefix}norm2.bias": _rand(dim),
        f"{prefix}mlp.fc1.weight": _rand(4 * dim, dim),
        f"{prefix}mlp.fc1.bias": _rand(4 * dim),
        f"{prefix}mlp.fc2.weight": _rand(dim, 4 * dim),
        f"{prefix}mlp.fc2.bias": _rand(dim),
    }
    if ls:
        out[f"{prefix}ls1.gamma"] = _rand(dim)
        out[f"{prefix}ls2.gamma"] = _rand(dim)
    return out


def _dofa_source() -> dict:
    wg = "patch_embed.weight_generator."
    te = f"{wg}transformer_encoder.layers.0."
    src = {
        f"{wg}weight_tokens": _rand(128, 128),
        f"{wg}bias_token": _rand(1, 128),
        f"{wg}fc_weight.weight": _rand(16 * 16 * D, 128),
        f"{wg}fc_weight.bias": _rand(16 * 16 * D),
        f"{wg}fc_bias.weight": _rand(D, 128),
        f"{wg}fc_bias.bias": _rand(D),
        f"{te}self_attn.in_proj_weight": _rand(384, 128),
        f"{te}self_attn.in_proj_bias": _rand(384),
        f"{te}self_attn.out_proj.weight": _rand(128, 128),
        f"{te}self_attn.out_proj.bias": _rand(128),
        f"{te}linear1.weight": _rand(2048, 128),
        f"{te}linear1.bias": _rand(2048),
        f"{te}linear2.weight": _rand(128, 2048),
        f"{te}linear2.bias": _rand(128),
        f"{te}norm1.weight": _rand(128), f"{te}norm1.bias": _rand(128),
        f"{te}norm2.weight": _rand(128), f"{te}norm2.bias": _rand(128),
        "patch_embed.fclayer.w1.weight": _rand(128, 128),
        "patch_embed.fclayer.w1.bias": _rand(128),
        "patch_embed.fclayer.w2.weight": _rand(128, 128),
        "patch_embed.fclayer.w2.bias": _rand(128),
        "cls_token": _rand(1, 1, D),
        "pos_embed": _rand(1, 14 * 14 + 1, D),
        "norm.weight": _rand(D), "norm.bias": _rand(D),
    }
    for i in range(2):
        src.update(_timm_block(f"blocks.{i}.", D))
    return src


def _dinov2_source() -> dict:
    src = {
        "embeddings.cls_token": _rand(1, 1, D),
        "embeddings.mask_token": _rand(1, D),
        "embeddings.position_embeddings": _rand(1, 37 * 37 + 1, D),
        "embeddings.patch_embeddings.projection.weight": _rand(D, 3, 14, 14),
        "embeddings.patch_embeddings.projection.bias": _rand(D),
        "layernorm.weight": _rand(D), "layernorm.bias": _rand(D),
    }
    for i in range(2):
        p = f"encoder.layer.{i}."
        src.update({
            f"{p}norm1.weight": _rand(D), f"{p}norm1.bias": _rand(D),
            f"{p}norm2.weight": _rand(D), f"{p}norm2.bias": _rand(D),
            f"{p}layer_scale1.lambda1": _rand(D),
            f"{p}layer_scale2.lambda1": _rand(D),
            f"{p}attention.output.dense.weight": _rand(D, D),
            f"{p}attention.output.dense.bias": _rand(D),
            f"{p}mlp.fc1.weight": _rand(4 * D, D),
            f"{p}mlp.fc1.bias": _rand(4 * D),
            f"{p}mlp.fc2.weight": _rand(D, 4 * D),
            f"{p}mlp.fc2.bias": _rand(D),
        })
        for n in ("query", "key", "value"):
            src[f"{p}attention.attention.{n}.weight"] = _rand(D, D)
            src[f"{p}attention.attention.{n}.bias"] = _rand(D)
    return src


def _croma_vit(depth: int, in_feats: int) -> dict:
    sub = {
        "linear_input.weight": _rand(D, in_feats),
        "linear_input.bias": _rand(D),
        "transformer.norm_out.weight": _rand(D),
        "transformer.norm_out.bias": _rand(D),
    }
    for i in range(depth):
        a, f = f"transformer.layers.{i}.0.", f"transformer.layers.{i}.1."
        sub.update({
            f"{a}input_norm.weight": _rand(D), f"{a}input_norm.bias": _rand(D),
            f"{a}to_qkv.weight": _rand(3 * D, D),
            f"{a}to_out.weight": _rand(D, D), f"{a}to_out.bias": _rand(D),
            f"{f}input_norm.weight": _rand(D), f"{f}input_norm.bias": _rand(D),
            f"{f}net.0.weight": _rand(4 * D, D), f"{f}net.0.bias": _rand(4 * D),
            f"{f}net.3.weight": _rand(D, 4 * D), f"{f}net.3.bias": _rand(D),
        })
    return sub


def _croma_source() -> dict:
    joint = {
        "norm_out.weight": _rand(D), "norm_out.bias": _rand(D),
    }
    for i in range(1):  # micro depth//2
        sa, xa, ffn = (f"layers.{i}.{j}." for j in range(3))
        joint.update({
            f"{sa}input_norm.weight": _rand(D), f"{sa}input_norm.bias": _rand(D),
            f"{sa}to_qkv.weight": _rand(3 * D, D),
            f"{sa}to_out.weight": _rand(D, D), f"{sa}to_out.bias": _rand(D),
            f"{xa}input_norm.weight": _rand(D), f"{xa}input_norm.bias": _rand(D),
            f"{xa}to_q.weight": _rand(D, D),
            f"{xa}to_k.weight": _rand(D, D),
            f"{xa}to_v.weight": _rand(D, D),
            f"{xa}to_out.weight": _rand(D, D), f"{xa}to_out.bias": _rand(D),
            f"{ffn}input_norm.weight": _rand(D), f"{ffn}input_norm.bias": _rand(D),
            f"{ffn}net.0.weight": _rand(4 * D, D), f"{ffn}net.0.bias": _rand(4 * D),
            f"{ffn}net.3.weight": _rand(D, 4 * D), f"{ffn}net.3.bias": _rand(D),
        })
    return {
        "s1_encoder": {k: torch.from_numpy(v)
                       for k, v in _croma_vit(1, 8 * 8 * 2).items()},
        "s2_encoder": {k: torch.from_numpy(v)
                       for k, v in _croma_vit(2, 8 * 8 * 12).items()},
        "joint_encoder": {k: torch.from_numpy(v) for k, v in joint.items()},
    }


def _satmae_source() -> dict:
    dim = 448  # micro SatMAE keeps the 3x128 timestamp channels
    src = {
        "patch_embed.proj.weight": _rand(dim, 10, 16, 16),
        "patch_embed.proj.bias": _rand(dim),
        "cls_token": _rand(1, 1, dim),
        "norm.weight": _rand(dim), "norm.bias": _rand(dim),
    }
    for i in range(2):
        src.update(_timm_block(f"blocks.{i}.", dim))
    return src


def _prithvi_source() -> dict:
    src = {
        "patch_embed.proj.weight": _rand(D, 6, 1, 16, 16),
        "patch_embed.proj.bias": _rand(D),
        "cls_token": _rand(1, 1, D),
        "norm.weight": _rand(D), "norm.bias": _rand(D),
        "temporal_embed_enc.weight": _rand(D, D),
        "temporal_embed_enc.bias": _rand(D),
    }
    for i in range(2):
        src.update(_timm_block(f"blocks.{i}.", D))
    return src


CASES = {
    # model -> (source builder, extra overrides, leaf checks)
    "dinov2": (
        _dinov2_source,
        ["model.fusion_mode=shared"],
        [(("params", "encoders_shared", "block0", "proj", "kernel"),
          lambda s: s["encoder.layer.0.attention.output.dense.weight"].T),
         (("params", "cls_s2"), lambda s: s["embeddings.cls_token"])],
    ),
    "dofa": (
        _dofa_source,
        ["model.fusion_mode=shared"],
        [(("params", "blocks_shared_1", "qkv", "kernel"),
          lambda s: s["blocks.1.attn.qkv.weight"].T),
         (("params", "embedders_s2", "fc_weight", "kernel"),
          lambda s: s["patch_embed.weight_generator.fc_weight.weight"].T),
         (("params", "pos_s1_asc"), lambda s: s["pos_embed"])],
    ),
    "croma": (
        _croma_source,
        ["model.fusion_mode=inter-croma"],
        [(("params", "s2_encoder", "attn1", "qkv", "kernel"),
          lambda s: s["s2_encoder"]["transformer.layers.1.0.to_qkv.weight"]
          .numpy().T),
         (("params", "cross_attns_0", "to_q", "kernel"),
          lambda s: s["joint_encoder"]["layers.0.1.to_q.weight"].numpy().T)],
    ),
    "satmae": (
        _satmae_source,
        ["model.fusion_mode=mod", "datasets.pastis_hd.filter_inputs=[\"s2\"]"],
        [(("params", "patch_proj", "kernel"),
          lambda s: s["patch_embed.proj.weight"].reshape(448, -1).T),
         (("params", "final_norm", "scale"), lambda s: s["norm.weight"])],
    ),
    "prithvi": (
        _prithvi_source,
        ["model.fusion_mode=mod", "model.version=v2",
         "datasets.pastis_hd.filter_inputs=[\"s2\"]"],
        [(("params", "temp_proj", "kernel"),
          lambda s: s["temporal_embed_enc.weight"].T),
         (("params", "blocks_0", "fc1", "bias"),
          lambda s: s["blocks.0.mlp.fc1.bias"])],
    ),
}


def _leaf(tree, path):
    for k in path:
        tree = tree[k]
    return np.asarray(tree)


@pytest.mark.parametrize("model", list(CASES))
def test_port_fm_roundtrip_into_probe(model, tmp_path):
    """torch.save(synthetic release) -> port_fm CLI -> model.pretrained_path
    warm start -> probe params carry the source backbone leaves."""
    build_src, extra, checks = CASES[model]
    src = build_src()
    ckpt_file = tmp_path / f"{model}.pth"
    torch.save(src, ckpt_file)

    out = tmp_path / "ported"
    overrides = [
        "model.model=" + model, "model.model_size=micro",
        "datasets.name_dataset=pastis_hd", *extra,
    ]
    port_fm.main(["--ckpt", str(ckpt_file), "--out", str(out), *overrides])
    ported_dir = out / "fm-epoch=0"
    assert (ported_dir / "state").exists()

    # warm-start a probe experiment from the ported checkpoint
    datasets = DatasetsConfig(name_dataset="pastis_hd")
    if model in ("satmae", "prithvi"):
        datasets.pastis_hd.filter_inputs = ["s2"]
        datasets.pastis_hd.__post_init__()
    fusion = {
        "dinov2": "shared", "dofa": "shared", "croma": "inter-croma",
        "satmae": "mod", "prithvi": "mod",
    }[model]
    cfg = ExperimentConfig(
        run=RunConfig(exp_dir=str(tmp_path), exp_name=model, seed=0),
        data=DataConfig(num_workers=1),
        model=ModelConfig(
            model=model, model_size="micro", fusion_mode=fusion,
            use_ema=False, pretrained_path=str(ported_dir),
            version="v2" if model == "prithvi" else None,
        ),
        trainer=TrainerConfig(mesh_data=1, compute_dtype="float32"),
    )
    exp = Experiment(cfg, datasets, tmp_path / "work")
    batch = {k: jnp.asarray(v)
             for k, v in make_synthetic_batch(datasets.dataset, 2).items()}
    params = exp.init_params("probe", batch, seed=0)

    for path, want_fn in checks:
        got = _leaf(params, path)
        want = np.asarray(want_fn(src))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7,
                                   err_msg=f"{model} leaf {'/'.join(path)}")


def test_pretrained_path_rejects_torch_file(tmp_path):
    f = tmp_path / "weights.pth"
    f.write_bytes(b"x")
    cfg = ExperimentConfig(
        model=ModelConfig(model="dofa", model_size="micro",
                          fusion_mode="shared", pretrained_path=str(f)),
    )
    with pytest.raises(ValueError, match="port_fm"):
        Experiment(cfg, DatasetsConfig(name_dataset="pastis_hd"),
                   tmp_path / "w")


def test_pretrained_path_rejects_non_baseline(tmp_path):
    cfg = ExperimentConfig(
        model=ModelConfig(model_size="micro", fusion_mode="group",
                          pretrained_path=str(tmp_path)),
    )
    with pytest.raises(ValueError, match="baseline"):
        Experiment(cfg, DatasetsConfig(name_dataset="pastis_hd"),
                   tmp_path / "w")


def test_pretrained_path_missing_state_dir(tmp_path):
    cfg = ExperimentConfig(
        model=ModelConfig(model="dofa", model_size="micro",
                          fusion_mode="shared",
                          pretrained_path=str(tmp_path / "nope")),
    )
    with pytest.raises(FileNotFoundError, match="state"):
        Experiment(cfg, DatasetsConfig(name_dataset="pastis_hd"),
                   tmp_path / "w")
