"""Export a trained model as a serving artifact (StableHLO via jax.export).

Usage::

    python scripts/export_model.py OUT.stablehlo \
        datasets.name_dataset=flair model.model_size=medium \
        run.load_ckpt_path=/path/to/finetune-epoch=42 \
        [--phase=finetune|probe|embed] [--platforms=tpu,cpu] \
        [--fixed-batch=N] [--quantize=int8]

``--quantize=int8`` exports the w8a8 serving path (maestro_tpu.quant):
transformer Dense kernels stored int8 with per-channel scales, activations
dynamically quantized per token, matmuls run int8 on the MXU.

Positional dotted overrides are the same ``group.field=value`` CLI as
``main.py``.  The artifact takes (params, batch) as inputs — weights are NOT
baked in; restore them with orbax at serving time (``maestro_tpu.serve``).
Default export uses a symbolic batch dimension so one artifact serves any
batch size.  The reference has no comparable surface (serving a MAESTRO
model requires the full Lightning stack).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv: list[str]) -> None:
    out_path = None
    phase = "finetune"
    platforms = None
    fixed_batch = None
    quantize = None
    overrides = []
    for arg in argv:
        if arg.startswith("--phase="):
            phase = arg.split("=", 1)[1]
        elif arg.startswith("--platforms="):
            platforms = tuple(arg.split("=", 1)[1].split(","))
        elif arg.startswith("--fixed-batch="):
            fixed_batch = int(arg.split("=", 1)[1])
        elif arg.startswith("--quantize="):
            quantize = arg.split("=", 1)[1]
            if quantize not in ("int8",):
                msg = f"--quantize supports int8, got {quantize!r}"
                raise SystemExit(msg)
        elif "=" in arg:
            overrides.append(arg)
        elif out_path is None:
            out_path = arg
        else:
            msg = f"unexpected argument {arg!r}"
            raise SystemExit(msg)
    if out_path is None:
        raise SystemExit(__doc__)

    import jax
    from main import parse_cli

    from maestro_tpu.models.factory import build_experiment_model
    from maestro_tpu.serve import (
        export_predict,
        make_embed_fn,
        make_predict_fn,
        save_exported,
    )
    from maestro_tpu.train import checkpoint as ckpt
    from maestro_tpu.utils.testing import make_synthetic_batch

    cfg, datasets = parse_cli(overrides)
    model, _, _ = build_experiment_model(datasets, cfg)

    bs = fixed_batch or 2
    batch = {
        k: jax.numpy.asarray(v)
        for k, v in make_synthetic_batch(datasets.dataset, bs).items()
    }
    key = jax.random.PRNGKey(cfg.run.seed)
    init_phase = "probe" if phase == "embed" else phase
    variables = jax.eval_shape(
        lambda b: model.init({"params": key, "mask": key}, b, init_phase),
        batch,
    )
    params = jax.tree.map(
        lambda s: jax.numpy.zeros(s.shape, s.dtype), variables,
    )
    if cfg.run.load_ckpt_path:
        # EMA weights when the checkpoint has them (finetune-eval semantics)
        unmatched: list[str] = []
        ema = ckpt.load_ema_weights(cfg.run.load_ckpt_path, params,
                                    unmatched_out=unmatched)
        params = (
            ema if ema is not None
            else ckpt.load_weights(cfg.run.load_ckpt_path, params,
                                   unmatched_out=unmatched)
        )
        if unmatched:
            # the template is zeros, so an unmatched leaf would silently
            # serve a zero-weight layer - refuse to export
            msg = (
                f"checkpoint {cfg.run.load_ckpt_path} does not cover "
                f"{len(unmatched)} model leaves (config/checkpoint "
                f"mismatch?): {unmatched[:5]}{'...' if len(unmatched) > 5 else ''}"
            )
            raise SystemExit(msg)

    if quantize == "int8":
        from maestro_tpu.quant import (
            make_quant_embed_fn,
            make_quant_predict_fn,
            quantize_params,
        )

        params = quantize_params(params)
        fn = (
            make_quant_embed_fn(model)
            if phase == "embed"
            else make_quant_predict_fn(model, phase)
        )
    elif phase == "embed":
        fn = make_embed_fn(model)
    else:
        fn = make_predict_fn(model, phase)
    blob = export_predict(
        model, params, batch, phase if phase != "embed" else "probe",
        fn=fn,
        symbolic_batch=fixed_batch is None,
        platforms=platforms,
    )
    save_exported(out_path, blob)
    manifest = {
        "phase": phase,
        "dataset": datasets.name_dataset,
        "model_size": cfg.model.model_size,
        # int8 artifacts take the quantize_params() tree as input: restore
        # the fp checkpoint with orbax, then maestro_tpu.quant.quantize_params
        "quantize": quantize,
        "symbolic_batch": fixed_batch is None,
        "platforms": list(platforms) if platforms else ["default"],
        "inputs": {
            k: [list(v.shape), str(v.dtype)] for k, v in batch.items()
        },
        "bytes": len(blob),
    }
    Path(str(out_path) + ".json").write_text(json.dumps(manifest, indent=2))
    print(json.dumps({"written": str(out_path), **manifest}))


if __name__ == "__main__":
    main(sys.argv[1:])
