"""S2-NAIP urban dataset config (pretrain-only).

Values mirror /root/reference/maestro/conf/dataset/s2_naip.py:15-105:
640 m tiles (512 px x 1.25 m) cropped to 120 m with 5x5 crop grid, NAIP
aerial (NIR-first reorder), NAIP-derived "spot", Landsat/Sentinel-2 16-date
stacks and a combined Sentinel-1 series.  No downstream targets.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from maestro_tpu.conf.dataset.base import (
    DatasetConfig,
    InputRasterConfig,
    PatchSizeConfig,
    TargetRasterConfig,
)


@dataclass
class S2NAIPConfig(DatasetConfig):
    rel_dir: str = "s2-naip-urban"
    val_pretrain: bool = True
    test_pretrain: bool = True
    repeats: int = 5
    crop_meters: float = 120.0
    total_meters: float = 640.0
    grid_pos_enc: int | None = 192

    ref_input: str | None = None
    log_inputs: list[str] = field(default_factory=lambda: ["aerial", "spot"])
    filter_inputs: list[str] = field(
        default_factory=lambda: ["aerial", "spot", "s2", "s1"],
    )
    filter_targets: list[str] = field(default_factory=list)

    aerial: InputRasterConfig = field(
        default_factory=lambda: InputRasterConfig(
            image_size=384,
            patch_size=PatchSizeConfig(mae=16),
            bands=[[3, 0, 1, 2]],
            norm_bands=[1, 3],
            norm_fac=255.0,
        ),
    )
    spot: InputRasterConfig = field(
        default_factory=lambda: InputRasterConfig(
            image_size=128,
            patch_size=PatchSizeConfig(mae=16),
            bands=3,
            norm_fac=255.0,
        ),
    )
    landsat: InputRasterConfig = field(
        default_factory=lambda: InputRasterConfig(
            image_size=12,
            patch_size=PatchSizeConfig(mae=2),
            bands=11,
            num_dates=16,
            norm_fac=5000.0,
        ),
    )
    s2: InputRasterConfig = field(
        default_factory=lambda: InputRasterConfig(
            image_size=12,
            patch_size=PatchSizeConfig(mae=2),
            bands=10,
            norm_bands=[4, 4, 2],
            num_dates=16,
            norm_fac=5000.0,
        ),
    )
    s1: InputRasterConfig = field(
        default_factory=lambda: InputRasterConfig(
            image_size=12,
            patch_size=PatchSizeConfig(mae=2),
            bands=2,
            norm_bands=[1, 1],
            num_dates=4,
            norm_fac=20.0,
        ),
    )

    def __post_init__(self) -> None:
        self.osm_seg = TargetRasterConfig(
            type_target="segment", num_classes=6, missing_val=-1, bands=1,
        )
        self.finalize(
            resolutions_meters={
                "osm_seg": 1.25,
                "aerial": 1.25,
                "spot": 1.25,
                "landsat": 10.0,
                "s2": 10.0,
                "s1": 10.0,
            },
        )
