"""Synthetic on-disk dataset fixtures (the reference checks in one real tile;
here tiles are generated so tests stay hermetic and license-free)."""

from __future__ import annotations

import json
from pathlib import Path

import h5py
import numpy as np
import pandas as pd
from PIL import Image

TREESAT_SPECIES = [f"species_{i}" for i in range(15)]

REPO_ROOT = Path(__file__).resolve().parent.parent


def load_script(name: str):
    """Import a scripts/<name>.py CLI module for in-process testing."""
    import importlib.util
    import sys

    if str(REPO_ROOT) not in sys.path:
        sys.path.insert(0, str(REPO_ROOT))
    spec = importlib.util.spec_from_file_location(
        f"{name}_cli", REPO_ROOT / "scripts" / f"{name}.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def write_treesat_fixture(root: Path, num_tiles: int = 2, seed: int = 0) -> None:
    """TreeSatAI-TS: aerial 304x304 4-band tif + sentinel .h5 + split CSVs."""
    rng = np.random.default_rng(seed)
    (root / "aerial").mkdir(parents=True, exist_ok=True)
    (root / "sentinel-ts").mkdir(parents=True, exist_ok=True)

    rows = []
    for i in range(num_tiles):
        name = f"tile_{i}"
        aerial = rng.integers(0, 255, (304, 304, 4), dtype=np.uint8)
        Image.fromarray(aerial, mode="RGBA").save(root / "aerial" / f"{name}.tif")

        t_s2, t_s1 = 35, 10
        with h5py.File(root / "sentinel-ts" / f"{name}.h5", "w") as f:
            f["sen-2-data"] = rng.integers(0, 10000, (t_s2, 10, 6, 6)).astype(np.int16)
            f["sen-2-masks"] = (rng.random((t_s2, 1, 6, 6)) < 0.1).astype(np.uint8)
            # acquisition date sits at split("_")[-5] in ESA product names
            f["sen-2-products"] = np.array(
                [f"S2A_MSIL2A_2020{m:02d}{d:02d}T000000_R_T_X_{i}".encode()
                 for m, d in zip(rng.integers(1, 13, t_s2), rng.integers(1, 28, t_s2))],
            )
            for asc in ("asc", "des"):
                f[f"sen-1-{asc}-data"] = np.abs(
                    rng.normal(1.0, 0.3, (t_s1, 2, 6, 6)),
                ).astype(np.float32)
                f[f"sen-1-{asc}-products"] = np.array(
                    [f"S1A_IW_GRDH_2020{m:02d}{d:02d}T000000_R_T_X_{i}".encode()
                     for m, d in zip(rng.integers(1, 13, t_s1),
                                     rng.integers(1, 28, t_s1))],
                )
        fracs = rng.random(15) * 0.3
        rows.append({
            "aerial_name": f"{name}.tif",
            "aerial_date": "2020-06-15",
            "sen_name": f"{name}.h5",
            **dict(zip(TREESAT_SPECIES, fracs)),
        })

    df = pd.DataFrame(rows)
    for split in ("train", "val", "test"):
        df.to_csv(root / f"{split}.csv", index=False)


def write_pastis_fixture(root: Path, num_tiles: int = 1, seed: int = 0) -> None:
    """PASTIS-HD: spot tif(.npy mirror) + S2/S1 npy stacks + annotations."""
    rng = np.random.default_rng(seed)
    spot_dir = root / "DATA_SPOT" / "PASTIS_SPOT6_RVB_1M00_2019"
    for d in (spot_dir, root / "DATA_S2", root / "DATA_S1A", root / "DATA_S1D",
              root / "ANNOTATIONS"):
        d.mkdir(parents=True, exist_ok=True)

    features = []
    ids = [10000 + i for i in range(num_tiles)]
    for iid in ids:
        spot = rng.integers(0, 255, (1280, 1280, 3), dtype=np.uint8)
        Image.fromarray(spot, mode="RGB").save(
            spot_dir / f"SPOT6_RVB_1M00_2019_{iid}.tif",
        )
        t_s2, t_s1 = 20, 12
        np.save(root / "DATA_S2" / f"S2_{iid}.npy",
                rng.integers(0, 10000, (t_s2, 10, 128, 128)).astype(np.int16))
        np.save(root / "DATA_S1A" / f"S1A_{iid}.npy",
                np.abs(rng.normal(1, 0.3, (t_s1, 3, 128, 128))).astype(np.float32))
        np.save(root / "DATA_S1D" / f"S1D_{iid}.npy",
                np.abs(rng.normal(1, 0.3, (t_s1, 3, 128, 128))).astype(np.float32))
        np.save(root / "ANNOTATIONS" / f"TARGET_{iid}.npy",
                rng.integers(0, 20, (3, 128, 128)).astype(np.int16))

        def date_dict(n):
            return {
                str(k): int(f"2019{m:02d}{d:02d}")
                for k, (m, d) in enumerate(
                    zip(rng.integers(1, 13, n), rng.integers(1, 28, n)),
                )
            }

        features.append({
            "type": "Feature",
            "geometry": None,
            "properties": {
                "id": iid,
                "dates-S2": json.dumps(date_dict(t_s2)),
                "dates-S1A": json.dumps(date_dict(t_s1)),
                "dates-S1D": json.dumps(date_dict(t_s1)),
            },
        })

    with open(root / "metadata.geojson", "w") as f:
        json.dump({"type": "FeatureCollection", "features": features}, f)

    df = pd.DataFrame({"image": ids})
    for split in ("train", "val", "test"):
        df.to_csv(root / f"{split}.csv", index=False)


def write_s2naip_fixture(root: Path, num_tiles: int = 2, seed: int = 0) -> None:
    """S2-NAIP urban: NAIP png + stacked sentinel npy mirrors + date txts."""
    rng = np.random.default_rng(seed)
    for d in ("naip", "landsat", "sentinel2", "sentinel1",
              "dates/naip", "dates/landsat", "dates/s2", "dates/s1"):
        (root / d).mkdir(parents=True, exist_ok=True)

    names = [f"tile_{i}" for i in range(num_tiles)]
    for name in names:
        naip = rng.integers(0, 255, (512, 512, 4), dtype=np.uint8)
        Image.fromarray(naip, mode="RGBA").save(root / "naip" / f"{name}.png")
        (root / "dates" / "naip" / f"{name}.txt").write_text(
            f"m_naip_x_20200615_{name}_20200615",
        )
        t_ls, t_s2, t_s1 = 18, 20, 10
        np.save(root / "landsat" / f"{name}_stacked.npy",
                rng.integers(0, 8000, (t_ls, 11, 64, 64)).astype(np.int16))
        np.save(root / "sentinel2" / f"{name}_stacked.npy",
                rng.integers(0, 8000, (t_s2, 10, 64, 64)).astype(np.int16))
        np.save(root / "sentinel1" / f"{name}.npy",
                np.abs(rng.normal(1, 0.3, (t_s1, 2, 64, 64))).astype(np.float32))

        def prods(n, idx):
            out = []
            for m, d in zip(rng.integers(1, 13, n), rng.integers(1, 28, n)):
                parts = ["P"] * (idx + 2)
                parts[-idx] = f"2020{m:02d}{d:02d}T000000"
                out.append("_".join(parts))
            return "\n".join(out)

        (root / "dates" / "landsat" / f"{name}.txt").write_text(prods(t_ls, 4))
        (root / "dates" / "s2" / f"{name}.txt").write_text(prods(t_s2, 5))
        (root / "dates" / "s1" / f"{name}.txt").write_text(prods(t_s1, 5))

    df = pd.DataFrame({"name": names})
    for split in ("train", "val", "test"):
        df.to_csv(root / f"{split}.csv", index=False)


def write_flair_fixture(
    root: Path, num_tiles: int = 1, seed: int = 0, use_tif: bool = False,
) -> None:
    """FLAIR-HUB: per-modality tiles + CSV date metadata.

    ``use_tif=True`` writes real multiband GeoTIFF stacks ([T*C, H, W] band
    layout, the reference's on-disk format, dataset/flair.py) via imageio;
    the default writes ``.npy`` mirrors (same array layout, faster IO).
    """
    rng = np.random.default_rng(seed)
    mods = {
        "aerial": ("AERIAL_RGBI", (1, 4, 512, 512), np.uint8),
        "dem": ("DEM_ELEV", (1, 2, 512, 512), np.float32),
        "s2": ("SENTINEL2_TS", (20, 10, 10, 10), np.int16),
        "s2_mask": ("SENTINEL2_MSK-SC", (20, 1, 10, 10), np.uint8),
        "s1_asc": ("SENTINEL1-ASC_TS", (12, 2, 10, 10), np.float32),
        "s1_des": ("SENTINEL1-DESC_TS", (12, 2, 10, 10), np.float32),
        "cosia": ("AERIAL_LABEL-COSIA", (1, 1, 512, 512), np.uint8),
    }
    patch_ids = [f"D01_Z{z}_p1" for z in range(num_tiles)]
    (root / "GLOBAL_ALL_MTD").mkdir(parents=True, exist_ok=True)

    for pid in patch_ids:
        domain, area, pos = pid.split("_")
        for _name, (flair, shape, dtype) in mods.items():
            d = root / f"{domain}_{flair}" / area
            d.mkdir(parents=True, exist_ok=True)
            if dtype == np.uint8:
                arr = rng.integers(0, 20, shape).astype(dtype)
            elif dtype == np.int16:
                arr = rng.integers(0, 10000, shape).astype(dtype)
            else:
                arr = np.abs(rng.normal(1, 0.5, shape)).astype(dtype)
            tile = d / f"{domain}_{flair}_{area}_{pos}"
            if use_tif:
                import imageio.v3 as iio

                t, c, h, w = arr.shape
                iio.imwrite(
                    tile.with_suffix(".tif"),
                    arr.reshape(t * c, h, w).transpose(1, 2, 0),
                )
            else:
                np.save(tile.with_suffix(".npy"), arr)

    def s2_dates(n):
        return json.dumps({
            str(k): int(f"2021{m:02d}{d:02d}")
            for k, (m, d) in enumerate(
                zip(rng.integers(1, 13, n), rng.integers(1, 28, n)), start=1,
            )
        })

    for name, col_tbl in (("AERIAL", "date"), ("SPOT", "date")):
        pd.DataFrame({
            "patch_id": patch_ids,
            col_tbl: ["20210615"] * len(patch_ids),
        }).to_csv(root / "GLOBAL_ALL_MTD" / f"GLOBAL_{name}_MTD_DATES.csv",
                  index=False)
    for name, n in (("SENTINEL2", 20), ("SENTINEL1-ASC", 12),
                    ("SENTINEL1-DESC", 12)):
        pd.DataFrame({
            "patch_id": [f"{pid.split('_')[0]}_{pid.split('_')[1]}_x"
                         for pid in patch_ids],
            "acquisition_dates": [s2_dates(n) for _ in patch_ids],
        }).to_csv(root / "GLOBAL_ALL_MTD" / f"GLOBAL_{name}_MTD_DATES.csv",
                  index=False)

    df = pd.DataFrame({"patch_id": patch_ids})
    for split in ("train", "val", "test"):
        df.to_csv(root / f"{split}.csv", index=False)
