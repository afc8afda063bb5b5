"""Multiband GeoTIFF stack reads: the real FLAIR on-disk layout.

The reference reads FLAIR tiles as windowed multiband GeoTIFF stacks
([T*C, H, W] band layout, /root/reference/maestro/dataset/dataset.py:155-186,
dataset/flair.py).  This sandbox has no rasterio, so the imageio fallback in
``io.read_image_window`` carries the tif path; these tests prove (a) the
fallback round-trips N-band stacks bit-exactly, and (b) a FLAIR dataset built
over real ``.tif`` stacks yields samples identical to the ``.npy``-mirror
fixture with the same seed.
"""

from __future__ import annotations

import numpy as np

from maestro_tpu.conf import DatasetsConfig
from maestro_tpu.data import io
from maestro_tpu.data.datasets import FLAIRDataset

from fixtures import write_flair_fixture


def test_read_image_window_multiband(tmp_path):
    import imageio.v3 as iio

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 10000, (200, 32, 32)).astype(np.int16)  # 20 dates x 10 bands
    path = tmp_path / "stack.tif"
    iio.imwrite(path, arr.transpose(1, 2, 0))

    full = io.read_image_window(path, 0, 32, 0, 32)
    np.testing.assert_array_equal(full, arr)
    win = io.read_image_window(path, 4, 20, 8, 24)
    np.testing.assert_array_equal(win, arr[:, 4:20, 8:24])


def test_flair_tif_stack_matches_npy_mirror(tmp_path):
    roots = {}
    for kind, use_tif in (("npy", False), ("tif", True)):
        root = tmp_path / kind
        write_flair_fixture(root, num_tiles=1, seed=0, use_tif=use_tif)
        roots[kind] = root

    def build(root):
        cfg = DatasetsConfig(name_dataset="flair", root_dir=str(root))
        return FLAIRDataset(
            cfg.dataset, root, "train", use_transform=False,
            random_dates=False, random_crop=False, ssl_phase="finetune",
            seed=0,
        )

    ds_npy, ds_tif = build(roots["npy"]), build(roots["tif"])
    assert len(ds_npy) == len(ds_tif) > 0
    a, b = ds_npy[0], ds_tif[0]
    assert a.keys() == b.keys()
    for key in a:
        np.testing.assert_array_equal(a[key], b[key], err_msg=key)
    assert np.isfinite(a["aerial"]).all()


def test_convert_dataset_cli(tmp_path):
    """scripts/convert_dataset.py writes [T, C, H, W] mirrors the loader
    prefers; converted reads match the direct-npy fixture bit-exactly."""
    from fixtures import load_script

    for kind, use_tif in (("npy", False), ("tif", True)):
        write_flair_fixture(tmp_path / kind, num_tiles=1, seed=0,
                            use_tif=use_tif)

    cli = load_script("convert_dataset")
    cli.main([
        "datasets.name_dataset=flair",
        f"datasets.root_dir={tmp_path / 'tif'}",
        "datasets.flair.rel_dir=", "--splits=train", "--check",
    ])
    mirrors = list((tmp_path / "tif").rglob("*.npy"))
    assert mirrors, "converter wrote no mirrors"
    # every mirror is [T, C, H, W]
    assert all(np.load(m, mmap_mode="r").ndim == 4 for m in mirrors)

    def build(root):
        cfg = DatasetsConfig(name_dataset="flair", root_dir=str(root))
        return FLAIRDataset(
            cfg.dataset, root, "train", use_transform=False,
            random_dates=False, random_crop=False, ssl_phase="finetune",
            seed=0,
        )

    a = build(tmp_path / "npy")[0]
    b = build(tmp_path / "tif")[0]  # now reads the converted mirrors
    for key in a:
        np.testing.assert_array_equal(a[key], b[key], err_msg=key)
