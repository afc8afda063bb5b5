"""Host input-pipeline throughput benchmark (loader samples/s).

The FLAIR pretrain step consumes ~200 samples/s/chip at the current device
step time (bench.py); the host pipeline must decode 512^2 4-band aerial +
DEM + three sentinel time-series stacks at that rate.  This script builds a
synthetic FLAIR-sized dataset and measures end-to-end loader throughput for
the thread-pool loader and (if grain is installed) the grain multiprocess
loader, at several worker counts.

Usage:  python scripts/bench_input.py [--tiles N] [--batches N] [--tif]

Reference equivalent: 12-worker torch DataLoader
(/root/reference/maestro/conf/data.py:13, train/data.py:38-44).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=64)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--tif", action="store_true",
                    help="multiband GeoTIFF stacks instead of .npy mirrors")
    ap.add_argument("--root", default="/tmp/bench_input_ds")
    args = ap.parse_args()

    from fixtures import write_flair_fixture

    root = Path(args.root) / ("tif" if args.tif else "npy")
    if not (root / "train.csv").exists():
        write_flair_fixture(root, num_tiles=args.tiles, use_tif=args.tif)

    from maestro_tpu.conf import DataConfig, DatasetsConfig
    from maestro_tpu.data.loader import make_loader

    from maestro_tpu.conf.dataset.flair import FLAIRConfig

    datasets = DatasetsConfig(
        name_dataset="flair", root_dir=str(root), flair=FLAIRConfig(rel_dir=""),
    )

    results = []
    for loader_kind in ("threads", "grain"):
        for workers in (4, 8, 16):
            data_cfg = DataConfig(num_workers=workers, loader=loader_kind,
                                  use_transform=True)
            try:
                _, loader = make_loader(
                    datasets, data_cfg, "train", "pretrain", args.batch_size,
                )
            except ImportError:
                print(f"# {loader_kind}: unavailable, skipped", file=sys.stderr)
                break
            it = iter(loader)
            next(it)  # warm: open files, fill prefetch
            t0 = time.perf_counter()
            n = 0
            for _ in range(args.batches):
                batch = next(it, None)
                if batch is None:
                    break
                n += args.batch_size
            dt = time.perf_counter() - t0
            results.append({
                "loader": loader_kind, "num_workers": workers,
                "samples_per_sec": round(n / dt, 1),
                "batch_size": args.batch_size,
                "format": "tif" if args.tif else "npy",
            })
            print(json.dumps(results[-1]))

    if results:
        best = max(results, key=lambda r: r["samples_per_sec"])
        print(json.dumps({"metric": "input_pipeline_best", **best}))


if __name__ == "__main__":
    main()
