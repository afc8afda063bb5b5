"""Batch inference over a dataset split: predictions to disk.

Usage::

    python scripts/predict.py OUT_DIR \
        datasets.name_dataset=flair datasets.root_dir=/data \
        model.model_size=medium run.load_ckpt_path=runs/.../finetune-epoch=49 \
        [--split=test] [--batch-size=32] [--probs] [--quantize=int8]

Writes one ``.npy`` per target head:

* classification / multilabel heads -> ``{head}/probs.npy`` ([N, C],
  sigmoid/softmax) or with ``--probs`` omitted just ``{head}/preds.npy``
  (argmax / thresholded 0-1 int8)
* segmentation heads -> ``{head}/preds_{i:05d}.npy`` per tile (argmax class
  mask, [D, H, W] int16), plus a ``probs_*`` variant with ``--probs``

The reference has no inference CLI (serving requires re-building the
Lightning stack and its test loop, run_experiment.py:101-121); this is the
deployment path for a trained maestro-tpu checkpoint.  EMA weights are used
when the checkpoint carries them (finetune-eval semantics).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv: list[str]) -> None:
    out_dir, split, batch_size, want_probs = None, "test", 32, False
    quantize = None
    overrides = []
    for arg in argv:
        if arg.startswith("--split="):
            split = arg.split("=", 1)[1]
        elif arg.startswith("--batch-size="):
            batch_size = int(arg.split("=", 1)[1])
        elif arg == "--probs":
            want_probs = True
        elif arg.startswith("--quantize="):
            quantize = arg.split("=", 1)[1]
            if quantize not in ("int8",):
                msg = f"--quantize supports int8, got {quantize!r}"
                raise SystemExit(msg)
        elif "=" in arg:
            overrides.append(arg)
        elif out_dir is None:
            out_dir = Path(arg)
        else:
            msg = f"unexpected argument {arg!r}"
            raise SystemExit(msg)
    if out_dir is None:
        raise SystemExit(__doc__)

    import jax

    from main import parse_cli

    from maestro_tpu.data.loader import make_loader
    from maestro_tpu.models.factory import build_experiment_model
    from maestro_tpu.serve import make_predict_fn
    from maestro_tpu.train import checkpoint as ckpt

    cfg, datasets = parse_cli(overrides)
    if not datasets.dataset.targets:
        msg = f"dataset {datasets.name_dataset} has no targets to predict"
        raise SystemExit(msg)
    model, _, _ = build_experiment_model(datasets, cfg)

    _, loader = make_loader(
        datasets, cfg.data, split, "finetune", batch_size, seed=cfg.run.seed,
    )
    loader.shuffle = False  # stable tile order for the output files
    loader.drop_last = False

    key = jax.random.PRNGKey(cfg.run.seed)
    first = next(iter(loader))
    batch0 = {k: jax.numpy.asarray(v) for k, v in first.items()}
    params = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, "finetune"),
    )(batch0)
    if not cfg.run.load_ckpt_path:
        raise SystemExit("run.load_ckpt_path is required for prediction")
    unmatched: list[str] = []
    ema = ckpt.load_ema_weights(cfg.run.load_ckpt_path, params,
                                unmatched_out=unmatched)
    params = ema if ema is not None else ckpt.load_weights(
        cfg.run.load_ckpt_path, params, unmatched_out=unmatched,
    )
    if unmatched:
        msg = (
            f"checkpoint does not cover {len(unmatched)} model leaves: "
            f"{unmatched[:5]}{'...' if len(unmatched) > 5 else ''}"
        )
        raise SystemExit(msg)

    if quantize == "int8":
        from maestro_tpu.quant import make_quant_predict_fn, quantize_params

        params = quantize_params(params)
        predict = make_quant_predict_fn(model, "finetune")
    else:
        predict = make_predict_fn(model, "finetune")
    head_specs = {hs.name: hs for hs in model.head_specs}
    for hs in head_specs.values():
        (out_dir / hs.name).mkdir(parents=True, exist_ok=True)

    counts = dict.fromkeys(head_specs, 0)
    flat_probs: dict[str, list[np.ndarray]] = {
        n: [] for n, hs in head_specs.items() if hs.type_target != "segment"
    }
    for np_batch in loader:
        batch = {k: jax.numpy.asarray(v) for k, v in np_batch.items()}
        logits = jax.device_get(predict(params, batch))
        for name, hs in head_specs.items():
            arr = np.asarray(logits[name], np.float32)
            if hs.type_target == "segment":
                # [B, D, C, H, W] -> per-tile class masks
                preds = arr.argmax(axis=-3).astype(np.int16)
                for b in range(preds.shape[0]):
                    i = counts[name]
                    np.save(out_dir / name / f"preds_{i:05d}.npy", preds[b])
                    if want_probs:
                        probs = _softmax(arr[b], axis=-3)
                        np.save(out_dir / name / f"probs_{i:05d}.npy", probs)
                    counts[name] += 1
            else:
                probs = (
                    _sigmoid(arr)
                    if hs.type_target == "multilabel_classif"
                    else _softmax(arr, axis=-1)
                )
                flat_probs[name].append(probs)
                counts[name] += arr.shape[0]

    for name, chunks in flat_probs.items():
        hs = head_specs[name]
        probs = np.concatenate(chunks, axis=0)
        if want_probs:
            np.save(out_dir / name / "probs.npy", probs)
        preds = (
            (probs >= 0.5).astype(np.int8)
            if hs.type_target == "multilabel_classif"
            else probs.argmax(axis=-1).astype(np.int32)
        )
        np.save(out_dir / name / "preds.npy", preds)

    manifest = {
        "split": split, "dataset": datasets.name_dataset,
        "checkpoint": cfg.run.load_ckpt_path,
        "ema": ema is not None,
        "tiles": {k: int(v) for k, v in counts.items()},
    }
    (out_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))
    print(json.dumps(manifest))


def _softmax(x: np.ndarray, axis: int) -> np.ndarray:
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


if __name__ == "__main__":
    main(sys.argv[1:])
