"""PASTIS-HD dataset config.

Values mirror /root/reference/maestro/conf/dataset/pastis_hd.py:16-100:
1280 m tiles cropped to 160 m (8x8 crop grid via ``repeats=8``), SPOT VHR RGB,
Sentinel-2 16-date series, Sentinel-1 asc/des fused as "s1", 19-class crop
segmentation target on the S2 grid.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from maestro_tpu.conf.dataset.base import (
    DatasetConfig,
    InputRasterConfig,
    PatchSizeConfig,
    TargetConfig,
    TargetRasterConfig,
)


@dataclass
class PASTISHDConfig(DatasetConfig):
    rel_dir: str = "PASTIS-HD"
    val_pretrain: bool = True
    filter_percent: int | None = None
    fold: int | None = None
    repeats: int = 8
    crop_meters: float = 160.0
    total_meters: float = 1280.0
    grid_pos_enc: int | None = 256

    ref_input: str | None = "s2"
    log_inputs: list[str] = field(default_factory=lambda: ["spot"])
    filter_inputs: list[str] = field(
        default_factory=lambda: ["spot", "s2", "s1_asc", "s1_des"],
    )
    filter_targets: list[str] = field(default_factory=lambda: ["pastis_seg"])

    spot: InputRasterConfig = field(
        default_factory=lambda: InputRasterConfig(
            image_size=160,
            patch_size=PatchSizeConfig(mae=16),
            bands=3,
            norm_fac=255.0,
        ),
    )
    s2: InputRasterConfig = field(
        default_factory=lambda: InputRasterConfig(
            image_size=16,
            patch_size=PatchSizeConfig(mae=2),
            bands=10,
            norm_bands=[4, 4, 2],
            num_dates=16,
            norm_fac=10000.0,
        ),
    )
    s1_asc: InputRasterConfig = field(
        default_factory=lambda: InputRasterConfig(
            image_size=16,
            patch_size=PatchSizeConfig(mae=2),
            bands=[[0, 1]],
            norm_bands=[1, 1],
            num_dates=4,
            norm_fac=20.0,
            name_group="s1",
        ),
    )
    s1_des: InputRasterConfig = field(
        default_factory=lambda: InputRasterConfig(
            image_size=16,
            patch_size=PatchSizeConfig(mae=2),
            bands=[[0, 1]],
            norm_bands=[1, 1],
            num_dates=4,
            norm_fac=20.0,
            name_group="s1",
        ),
    )

    def __post_init__(self) -> None:
        self.pastis_seg = TargetRasterConfig(
            type_target="segment", num_classes=19, missing_val=19, bands=1,
        )
        self.pastis_mlc = TargetConfig(
            type_target="multilabel_classif", num_classes=18,
        )
        self.finalize(
            resolutions_meters={
                "pastis_seg": 10.0,
                "spot": 1.0,
                "s2": 10.0,
                "s1_asc": 10.0,
                "s1_des": 10.0,
            },
        )
