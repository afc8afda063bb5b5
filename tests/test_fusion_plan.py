"""FusionPlan static-layout tests (mirrors reference conf/dataset derivations)."""

import jax.numpy as jnp
import numpy as np
import pytest

from maestro_tpu.conf import MaskConfig
from maestro_tpu.specs.fusion import build_fusion_plan


def test_treesat_sizes(datasets_treesat):
    ds = datasets_treesat.dataset
    assert ds.sizes == {"aerial": 300, "s2": 6, "s1_asc": 6, "s1_des": 6}
    assert ds.size_gcd == 6
    assert ds.crop_gcd == 6
    assert ds.groups == [
        ("aerial", "aerial"), ("s2", "s2"), ("s1_asc", "s1"), ("s1_des", "s1"),
    ]


def test_pastis_sizes(datasets_pastis):
    ds = datasets_pastis.dataset
    assert ds.sizes["spot"] == 1280
    assert ds.sizes["s2"] == 128
    assert ds.size_gcd == 128
    assert ds.crop_gcd == 16  # 160m of 1280m -> 1/8 of the 128-px GCD grid


def test_group_mode_streams(datasets_treesat):
    plan = build_fusion_plan(datasets_treesat.dataset, MaskConfig(), "group")
    assert set(plan.streams) == {"aerial", "s2", "s1"}
    assert plan.streams["aerial"].seq_len == 15 * 15
    assert plan.streams["s2"].seq_len == 16 * 9
    assert plan.streams["s1"].seq_len == 2 * 4 * 9
    assert plan.streams["s1"].mods == ("s1_asc", "s1_des")
    # structural mask: mod-masking only for multi-mod groups
    assert plan.struct_masks["aerial"].p_mod is None
    assert plan.struct_masks["s1_asc"].p_mod == 0.25
    assert plan.struct_masks["s2"].p_dates == 0.25
    assert plan.struct_masks["aerial"].p_dates is None  # single date


def test_mask_ratio_scaling(datasets_treesat):
    mask = MaskConfig(mask_ratio=0.75, mask_scale=0.5)
    plan = build_fusion_plan(datasets_treesat.dataset, mask, "group")
    # group "s1" has date-axis total 8 -> ratio = 1 - 0.25 / 8**0.5
    expected = 1 - 0.25 / 8**0.5
    assert plan.streams["s1"].mask_ratio == pytest.approx(expected)
    assert plan.streams["s1"].num_masked == round(expected * 72)


@pytest.mark.parametrize("fusion_mode", ["shared", "monotemp", "mod", "group"])
def test_group_ungroup_roundtrip(datasets_treesat, fusion_mode):
    plan = build_fusion_plan(datasets_treesat.dataset, MaskConfig(), fusion_mode)
    rng = np.random.default_rng(0)
    x = {
        name: jnp.asarray(
            rng.normal(size=(2, spec.date_axis, spec.tokens_per_date, 8)),
        )
        for name, spec in plan.mod_specs.items()
    }
    grouped = plan.group(x)
    restored = plan.ungroup(grouped)
    for name in x:
        np.testing.assert_array_equal(np.asarray(x[name]), np.asarray(restored[name]))


def test_shared_mode_batch_flatten(datasets_treesat):
    plan = build_fusion_plan(datasets_treesat.dataset, MaskConfig(), "shared")
    assert plan.batch_flattened
    assert plan.encoder_names == ("shared",)
    assert plan.streams["s2"].batch_factor == 16
    assert plan.streams["s2"].seq_len == 9


def test_monotemp_encoders(datasets_treesat):
    plan = build_fusion_plan(datasets_treesat.dataset, MaskConfig(), "monotemp")
    assert set(plan.encoder_names) == {"aerial", "s2", "s1_asc", "s1_des"}
