"""Day-one accuracy-parity one-shot vs the reference's published tables.

Given real dataset roots and finetuned checkpoints (flagship MAESTRO runs
and/or the five FM baselines warm-started from released weights via
scripts/port_fm.py), this runs ``run.eval_only`` for every configured
(row, dataset) cell and emits ONE table diffable against BASELINE.md
Tables 1-2, with the 0.5-pt acceptance gate applied per cell
(reference values: /root/reference/README.md:103-129).

Usage:
    python scripts/eval_parity.py --config parity.json [--out report.json]

``parity.json``::

    {
      "gate": 0.5,
      "runs": [
        {"row": "maestro", "dataset": "treesatai_ts",
         "root": "/data/treesat",
         "ckpt": "runs/maestro_treesat/<uuid>/checkpoints/finetune-epoch=49",
         "overrides": ["model.model_size=medium"]},
        {"row": "dinov2", "dataset": "pastis_hd", "root": "/data/pastis",
         "ckpt": "runs/dino_pastis/.../finetune-epoch=99"}
      ]
    }

Per run: ``row`` picks the reference table row (and the adapter's default
model overrides), ``dataset`` one of treesatai_ts / pastis_hd / flair2 /
flair_hub, ``ckpt`` the finetuned checkpoint to score (run.load_ckpt_path),
``overrides`` extra main.py-style dotted overrides.  A run may set
``"target": null`` to report without gating (used by the CI rehearsal) or a
numeric target to override the table.

The gate is one-sided: a cell PASSES when metric >= target - gate (beating
the reference is success, BASELINE.md "within 0.5 pts").  Exit code 1 if
any gated cell fails; the table prints either way.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# (row, dataset) -> reference percentage (BASELINE.md Tables 1-2;
# /root/reference/README.md:103-129). flair2/flair_hub both use the flair
# config (datasets.flair.version switches).
TARGETS: dict[tuple[str, str], float] = {
    ("maestro", "treesatai_ts"): 78.8,
    ("maestro", "pastis_hd"): 68.6,
    ("maestro", "flair2"): 62.6,
    ("maestro", "flair_hub"): 65.9,
    ("maestro_2x", "treesatai_ts"): 79.4,
    ("maestro_2x", "pastis_hd"): 69.0,
    ("maestro_2x", "flair2"): 63.3,
    ("maestro_2x", "flair_hub"): 65.8,
    ("maestro_flairhub", "treesatai_ts"): 79.6,
    ("maestro_flairhub", "pastis_hd"): 68.0,
    ("maestro_s2naip", "treesatai_ts"): 78.8,
    ("maestro_s2naip", "pastis_hd"): 67.4,
    ("maestro_s2naip", "flair2"): 62.6,
    ("maestro_s2naip", "flair_hub"): 64.6,
    ("dinov2", "treesatai_ts"): 76.7,
    ("dinov2", "pastis_hd"): 64.4,
    ("dinov2", "flair2"): 64.2,
    ("dinov2", "flair_hub"): 66.0,
    ("dinov2_sat", "treesatai_ts"): 76.3,
    ("dinov2_sat", "pastis_hd"): 64.0,
    ("dinov2_sat", "flair2"): 63.5,
    ("dinov2_sat", "flair_hub"): 66.0,
    ("dofa", "treesatai_ts"): 76.0,
    ("dofa", "pastis_hd"): 62.9,
    ("dofa", "flair2"): 62.3,
    ("dofa", "flair_hub"): 65.1,
    ("croma", "treesatai_ts"): 70.5,
    ("croma", "pastis_hd"): 65.0,
    ("croma", "flair2"): 39.0,
    ("croma", "flair_hub"): 44.3,
    ("prithvi", "treesatai_ts"): 75.6,
    ("prithvi", "pastis_hd"): 66.2,
    ("prithvi", "flair2"): 41.8,
    ("prithvi", "flair_hub"): 44.9,
    ("satmae", "treesatai_ts"): 76.9,
    ("satmae", "pastis_hd"): 66.6,
    ("satmae", "flair2"): 42.5,
    ("satmae", "flair_hub"): 45.0,
}

# dataset key -> (name_dataset, extra overrides, headline metric)
DATASETS: dict[str, tuple[str, list[str], str]] = {
    "treesatai_ts": ("treesatai_ts", [],
                     "treesat_mlc_thresh/weighted_f1"),
    "pastis_hd": ("pastis_hd", [], "pastis_seg/average_iou"),
    "flair2": ("flair", ["datasets.flair.version=flair2"],
               "cosia/average_iou"),
    "flair_hub": ("flair", [], "cosia/average_iou"),
}

# row -> default model overrides (user overrides win, appended later)
ROW_DEFAULTS: dict[str, list[str]] = {
    "maestro": ["model.model_size=medium", "model.fusion_mode=group",
                "model.inter_depth=3"],
    "maestro_2x": ["model.model_size=medium", "model.fusion_mode=group",
                   "model.inter_depth=3"],
    "maestro_flairhub": ["model.model_size=medium",
                         "model.fusion_mode=group", "model.inter_depth=3"],
    "maestro_s2naip": ["model.model_size=medium", "model.fusion_mode=group",
                       "model.inter_depth=3"],
    "dinov2": ["model.model=dinov2", "model.model_size=large",
               "model.fusion_mode=shared"],
    "dinov2_sat": ["model.model=dinov2", "model.model_size=large",
                   "model.fusion_mode=shared", "model.weight_source=sat"],
    "dofa": ["model.model=dofa", "model.model_size=large",
             "model.fusion_mode=shared"],
    "croma": ["model.model=croma", "model.model_size=large",
              "model.fusion_mode=inter-croma"],
    "prithvi": ["model.model=prithvi", "model.model_size=large",
                "model.version=v2"],
    "satmae": ["model.model=satmae", "model.model_size=large"],
}


def run_cell(run: dict) -> dict:
    """Execute one eval_only run and return its report row."""
    import main as cli
    from maestro_tpu.train.runtime import run_experiment

    row, ds_key = run["row"], run["dataset"]
    name_ds, ds_extra, metric_key = DATASETS[ds_key]
    overrides = [
        f"datasets.name_dataset={name_ds}",
        f"datasets.root_dir={run['root']}",
        *ds_extra,
        *ROW_DEFAULTS.get(row, []),
        "run.eval_only=true",
        f"run.load_ckpt_path={run['ckpt']}",
        "run.exp_name=" + run.get("exp_name", f"parity_{row}_{ds_key}"),
        "opt_pretrain.epochs=0", "opt_probe.epochs=0",
        "opt_finetune.epochs=1",
        *run.get("overrides", []),
    ]
    cfg, datasets = cli.parse_cli(overrides)
    results = run_experiment(cfg, datasets)
    metrics = results["finetune"].test_metrics or results["finetune"].val_metrics
    got = 100.0 * float(metrics[metric_key])
    target = run.get("target", TARGETS.get((row, ds_key)))
    return {
        "row": row, "dataset": ds_key, "metric": metric_key,
        "value_pct": round(got, 2), "target_pct": target,
        "delta_pts": None if target is None else round(got - target, 2),
    }


def render(report: list[dict], gate: float) -> tuple[str, bool]:
    lines = [
        f"| row | dataset | metric | ours (%) | reference (%) | delta (pts)"
        f" | gate +-{gate} |",
        "|---|---|---|---|---|---|---|",
    ]
    ok = True
    for r in report:
        if "error" in r:
            ok = False
            lines.append(f"| {r['row']} | {r['dataset']} | — | ERROR | "
                         f"{r.get('target_pct', '—')} | — | FAIL |")
            continue
        if r["target_pct"] is None:
            verdict = "n/a"
        elif r["value_pct"] >= r["target_pct"] - gate:
            verdict = "PASS"
        else:
            verdict = "FAIL"
            ok = False
        lines.append(
            f"| {r['row']} | {r['dataset']} | {r['metric']} | "
            f"{r['value_pct']} | {r['target_pct']} | {r['delta_pts']} | "
            f"{verdict} |")
    return "\n".join(lines), ok


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--config", required=True,
                    help="JSON file: {gate, runs: [...]}")
    ap.add_argument("--out", default="parity_report.json",
                    help="JSON report output path")
    args = ap.parse_args(argv)

    spec = json.loads(Path(args.config).read_text())
    gate = float(spec.get("gate", 0.5))
    report: list[dict] = []
    for run in spec["runs"]:
        label = f"{run['row']} x {run['dataset']}"
        print(f"== {label} ...", file=sys.stderr)
        try:
            report.append(run_cell(run))
        except Exception as e:  # noqa: BLE001 - one bad cell must not kill
            msg = f"{type(e).__name__}: {e}"  # the sweep
            print(f"{label} FAILED: {msg}", file=sys.stderr)
            report.append({
                "row": run["row"], "dataset": run["dataset"],
                "target_pct": run.get(
                    "target", TARGETS.get((run["row"], run["dataset"]))),
                "error": msg,
            })

    table, ok = render(report, gate)
    print(table)
    Path(args.out).write_text(json.dumps(
        {"gate": gate, "report": report}, indent=2) + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
