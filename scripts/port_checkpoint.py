"""Port a released reference checkpoint to a maestro_tpu orbax checkpoint.

Usage:
    python scripts/port_checkpoint.py \
        --ckpt MAESTRO_FLAIR-HUB_base.ckpt \
        --dataset flair --fusion-mode group --model-size medium \
        --inter-depth 3 --out runs/ported

The input is a pytorch-lightning .ckpt of the reference (HuggingFace
releases, reference README.md:37-39); the output is a ``pretrain-epoch=0``
orbax checkpoint loadable via run.load_ckpt_path.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--dataset", default="flair",
                    choices=["treesatai_ts", "pastis_hd", "flair", "s2_naip"])
    ap.add_argument("--fusion-mode", default="group")
    ap.add_argument("--model-size", default="medium")
    ap.add_argument("--inter-depth", type=int, default=3)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from maestro_tpu.conf import DatasetsConfig, MaskConfig, ModelConfig
    from maestro_tpu.models.mae import build_model
    from maestro_tpu.port.torch_port import (
        load_torch_state_dict,
        merge_into_template,
        port_mae_state_dict,
    )
    from maestro_tpu.train import checkpoint as ckpt
    from maestro_tpu.train.state import TrainState
    from maestro_tpu.utils.testing import make_synthetic_batch

    datasets = DatasetsConfig(name_dataset=args.dataset)
    model, plan = build_model(
        datasets, MaskConfig(),
        ModelConfig(model_size=args.model_size, fusion_mode=args.fusion_mode,
                    inter_depth=args.inter_depth),
    )
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(datasets.dataset, 1).items()}
    key = jax.random.PRNGKey(0)
    template = jax.eval_shape(
        lambda: model.init({"params": key, "mask": key}, batch, "pretrain"),
    )
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)

    src = load_torch_state_dict(args.ckpt)
    ported = port_mae_state_dict(src, plan, model.head_specs)
    merged, used, missing = merge_into_template(ported, template)
    print(f"ported {len(used)} leaves; {len(missing)} kept fresh init")
    for m in missing[:20]:
        print("  fresh:", m)

    # reference torch head splits (vit-pytorch defaults, mae.py:345-360) —
    # attention math depends on the split even though param shapes do not
    ref_encoder_heads = {"tiny": 3, "small": 6, "medium": 12, "base": 12,
                         "large": 16}.get(args.model_size)
    overrides = (
        {
            "encoder_heads": ref_encoder_heads, "encoder_dim_head": 64,
            "decoder_heads": 16, "decoder_dim_head": 32,
        }
        if ref_encoder_heads
        else {}  # test-only sizes: no reference split to restore
    )
    state = TrainState.create(merged, optax.sgd(0.0))
    path = ckpt.save_checkpoint(args.out, "pretrain", 0, state,
                                extra={"source": args.ckpt, **overrides})
    print("saved", path)
    print("run with the reference head splits, e.g.:",
          " ".join(f"model.{k}={v}" for k, v in overrides.items()))


if __name__ == "__main__":
    main()
