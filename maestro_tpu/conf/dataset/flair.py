"""FLAIR / FLAIR-HUB dataset config.

Values mirror /root/reference/maestro/conf/dataset/flair.py:15-138:
102.4 m tiles, 0.2 m aerial (NIR-first band reorder), DEM/DSM elevation pair,
SPOT, Sentinel-2 16-date and Sentinel-1 asc/des series, with COSIA 15-class
(or LPIS 74-class) segmentation at 0.2 m on the aerial grid.  ``version``
switches FLAIR#2 ignore-label handling in the data reader.
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
class FLAIRConfig(DatasetConfig):
    rel_dir: str = "FLAIR-HUB"
    csv_dir: str | None = None
    version: str | None = None
    val_pretrain: bool = True
    filter_percent: int | None = None
    repeats: int = 1
    crop_meters: float = 102.4
    total_meters: float = 102.4
    grid_pos_enc: int | None = 160

    ref_input: str | None = "aerial"
    log_inputs: list[str] = field(default_factory=lambda: ["aerial", "spot"])
    filter_inputs: list[str] = field(
        default_factory=lambda: ["aerial", "dem", "s2", "s1_asc", "s1_des"],
    )
    filter_targets: list[str] = field(default_factory=lambda: ["cosia"])

    aerial: InputRasterConfig = field(
        default_factory=lambda: InputRasterConfig(
            image_size=512,
            patch_size=PatchSizeConfig(mae=16),
            bands=[[3, 0, 1, 2]],
            norm_bands=[1, 3],
            norm_fac=255.0,
        ),
    )
    dem: InputRasterConfig = field(
        default_factory=lambda: InputRasterConfig(
            image_size=512,
            patch_size=PatchSizeConfig(mae=32),
            bands=2,
            norm_fac=1000.0,
            rescale_elev=True,
        ),
    )
    spot: InputRasterConfig = field(
        default_factory=lambda: InputRasterConfig(
            image_size=64,
            patch_size=PatchSizeConfig(mae=4),
            bands=4,
            norm_fac=2000.0,
        ),
    )
    s2: InputRasterConfig = field(
        default_factory=lambda: InputRasterConfig(
            image_size=10,
            patch_size=PatchSizeConfig(mae=2),
            bands=10,
            norm_bands=[4, 4, 2],
            num_dates=16,
            mask_threshold=0.0,
            norm_fac=5000.0,
        ),
    )
    s1_asc: InputRasterConfig = field(
        default_factory=lambda: InputRasterConfig(
            image_size=10,
            patch_size=PatchSizeConfig(mae=2),
            bands=2,
            norm_bands=[1, 1],
            num_dates=4,
            norm_fac=5.0,
            log_scale=True,
            name_group="s1",
        ),
    )
    s1_des: InputRasterConfig = field(
        default_factory=lambda: InputRasterConfig(
            image_size=10,
            patch_size=PatchSizeConfig(mae=2),
            bands=2,
            norm_bands=[1, 1],
            num_dates=4,
            norm_fac=5.0,
            log_scale=True,
            name_group="s1",
        ),
    )

    def __post_init__(self) -> None:
        self.cosia = TargetRasterConfig(
            type_target="segment", num_classes=15, missing_val=-1, bands=1,
        )
        self.lpis = TargetRasterConfig(
            type_target="segment", num_classes=74, missing_val=-1, bands=1,
        )
        self.finalize(
            resolutions_meters={
                "cosia": 0.2,
                "lpis": 0.2,
                "aerial": 0.2,
                "dem": 0.2,
                "spot": 1.6,
                "s2": 10.24,
                "s1_asc": 10.24,
                "s1_des": 10.24,
            },
        )
