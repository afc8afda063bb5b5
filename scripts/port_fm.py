"""Port a released foundation-model checkpoint into a baseline warm start.

All five adapters (reference Table 2, README.md:120-129) consume their
publicly released torch checkpoints through this CLI; the output is an orbax
checkpoint whose backbone leaves warm-start a probe/finetune experiment via
``model.pretrained_path``.

Usage (same dotted overrides as main.py, so the adapter template is built
from EXACTLY the experiment config you will train with):

    python scripts/port_fm.py --ckpt DOFA_ViT_base_e100.pth --out runs/dofa \\
        model.model=dofa model.model_size=base model.fusion_mode=shared \\
        datasets.name_dataset=pastis_hd

    python main.py model.model=dofa ... \\
        model.pretrained_path=runs/dofa/fm-epoch=0

Source layouts per adapter (reference surgery semantics):
  dinov2  HF Dinov2Model state dict, or a raw ``backbone.*`` dump
          (utils.py:24-78 rename + qkv split), quantized linears unpacked
          (utils.py:81-98); channel-pad + CLS-aware pos-embed handled by
          port/dinov2_port.py.
  dofa    torchgeo OFAViT (dofa.py:460-678): weight-generator transformer,
          FCResLayer, timm blocks; one released patch_embed/pos_embed
          replicated into every modality (dofa.py:202-204).
  croma   release dict of sub-state-dicts s1_encoder / s2_encoder /
          joint_encoder (croma.py:386-436).
  satmae  MaskedAutoencoderViT encoder (satmae.py:252-330).
  prithvi terratorch PrithviViT: Conv3d patch kernel with the HLS->S2
          ORIG_BANDS channel surgery (prithvi.py:154-182), temporal-encoder
          linear for the v2 "_tl" variant.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def port_fm_params(model_name: str, src: dict, model, datasets) -> dict:
    """Dispatch a released state dict to the adapter's port map."""
    from maestro_tpu.port import fm_port

    plan = model.plan
    if model_name == "dinov2":
        from maestro_tpu.baselines.dinov2 import DINOV2_ARCHS
        from maestro_tpu.port.dinov2_port import port_dinov2

        if any(k.startswith("backbone.") for k in src):
            src = fm_port.rename_dinov2_backbone(src)
        depth = DINOV2_ARCHS[model.backbone_size][1]
        mods = {m: plan.mod_specs[m].num_channels for m in plan.mods}
        return port_dinov2(src, mods, plan.encoder_names, depth,
                           keep_norm=model.keep_norm)
    if model_name == "dofa":
        from maestro_tpu.baselines.dofa import DOFA_ARCHS

        depth = DOFA_ARCHS[model.backbone_size][1]
        return fm_port.port_dofa(src, depth, tuple(plan.mods),
                                 plan.encoder_names)
    if model_name == "croma":
        return fm_port.port_croma(src)
    if model_name == "satmae":
        from maestro_tpu.baselines.satmae import SATMAE_ARCHS

        depth = SATMAE_ARCHS[model.backbone_size][1]
        bands = datasets.dataset.inputs["s2"].bands
        band_idx = (
            tuple(range(bands)) if isinstance(bands, int)
            else tuple(i for grp in bands for i in grp)
        )
        return fm_port.port_satmae(src, depth, band_idx)
    if model_name == "prithvi":
        from maestro_tpu.baselines.prithvi import PRITHVI_ARCHS

        depth = PRITHVI_ARCHS[model.backbone_size][1]
        bands = datasets.dataset.inputs["s2"].bands
        band_idx = (
            tuple(range(bands)) if isinstance(bands, int)
            else tuple(i for grp in bands for i in grp)
        )
        return fm_port.port_prithvi(src, depth, band_idx)
    msg = f"No port map for baseline {model_name!r}."
    raise SystemExit(msg)


def load_fm_checkpoint(path: str, model_name: str) -> dict:
    """torch.load a release; CROMA keeps its per-encoder sub-dicts, others
    flatten to numpy (quantized linears unpacked first)."""
    import numpy as np
    import torch

    from maestro_tpu.port.fm_port import dequantize_state_dict

    blob = torch.load(path, map_location="cpu", weights_only=False)
    blob = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    if model_name == "croma":
        return {
            enc: {k: np.asarray(v.detach() if hasattr(v, "detach") else v)
                  for k, v in sub.items()}
            for enc, sub in blob.items()
            if isinstance(sub, dict)
        }
    if any("_packed_params" in k for k in blob):
        return dequantize_state_dict(blob)
    return {
        k: (v.detach().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in blob.items()
    }


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    ap.add_argument("--ckpt", required=True, help="released torch checkpoint")
    ap.add_argument("--out", required=True, help="orbax output directory")
    ap.add_argument(
        "--allow-missing", action="store_true",
        help="tolerate backbone leaves that kept fresh init (default: error)",
    )
    ap.add_argument(
        "--manifest", default="auto",
        help="release key-manifest to verify coverage against: a name from "
             "maestro_tpu.port.manifests.ALL_MANIFESTS, 'auto' (pick by "
             "model+size; skip with a warning if none registered), or "
             "'none' to disable the check",
    )
    ap.add_argument("overrides", nargs="*",
                    help="main.py-style group.field=value overrides")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    import main as cli
    from maestro_tpu.models.factory import build_experiment_model
    from maestro_tpu.port.torch_port import merge_into_template
    from maestro_tpu.train import checkpoint as ckpt
    from maestro_tpu.train.state import TrainState
    from maestro_tpu.utils.testing import make_synthetic_batch

    cfg, datasets = cli.parse_cli(args.overrides)
    model, _plan, is_baseline = build_experiment_model(
        datasets, cfg, dtype=jnp.float32,
    )
    if not is_baseline:
        msg = (
            f"model.model={cfg.model.model!r} is the flagship MAE; use "
            "scripts/port_checkpoint.py for reference MAE checkpoints."
        )
        raise SystemExit(msg)

    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(datasets.dataset, 1).items()}
    key = jax.random.PRNGKey(0)
    template = jax.eval_shape(
        lambda: model.init({"params": key}, batch, "finetune"),
    )
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)

    from maestro_tpu.port import manifests as mf

    src = load_fm_checkpoint(args.ckpt, cfg.model.model)
    recorder = mf.RecordingDict(src)
    ported = port_fm_params(cfg.model.model, recorder, model, datasets)

    # released-checkpoint contract: every source key consumed or explicitly
    # skip-listed, every key the port reads present, shapes as transcribed
    # (r4 VERDICT item 4 — day one on real files is a checksum, not a
    # debugging session)
    manifest_name = args.manifest
    renamed_sat_dump = cfg.model.model == "dinov2" and any(
        k.startswith("backbone.") for k in src
    )
    if manifest_name == "auto":
        manifest_name = mf.DEFAULT_FOR.get(
            (cfg.model.model, cfg.model.model_size), "none",
        )
        if manifest_name == "none":
            print(f"no release manifest registered for "
                  f"({cfg.model.model}, {cfg.model.model_size}); "
                  "coverage check skipped")
        if renamed_sat_dump:
            # the raw backbone.* sat dump was renamed in-place before the
            # port ran; its key space no longer matches the HF manifest
            manifest_name = "none"
            print("dinov2 'sat' backbone.* dump detected; HF manifest "
                  "does not apply, coverage check skipped")
    if manifest_name != "none":
        manifest = mf.ALL_MANIFESTS[manifest_name]()
        try:
            mf.verify_coverage(manifest, src, recorder.accessed)
        except mf.CoverageError as e:
            raise SystemExit(str(e)) from None
        print(f"manifest {manifest_name}: all {len(manifest['keys'])} "
              "release keys consumed or skip-listed, shapes match")

    merged, used, missing = merge_into_template(ported, template)
    heads_fresh = [m for m in missing if "heads_" in m]
    backbone_fresh = [m for m in missing if "heads_" not in m]
    print(f"ported {len(used)} leaves; {len(heads_fresh)} head leaves fresh "
          f"(expected); {len(backbone_fresh)} backbone leaves fresh")
    for m in backbone_fresh[:20]:
        print("  fresh backbone leaf:", m)
    if backbone_fresh and not args.allow_missing:
        msg = (
            f"{len(backbone_fresh)} backbone leaves were not covered by the "
            f"released checkpoint — wrong --ckpt / model size / fusion mode? "
            "(--allow-missing to override)"
        )
        raise SystemExit(msg)

    state = TrainState.create(merged, optax.sgd(0.0))
    path = ckpt.save_checkpoint(
        args.out, "fm", 0, state,
        extra={"source": str(args.ckpt), "model": cfg.model.model,
               "model_size": cfg.model.model_size,
               "fusion_mode": cfg.model.fusion_mode},
    )
    print("saved", path)
    print(f"train with: model.pretrained_path={path}")


if __name__ == "__main__":
    main()
