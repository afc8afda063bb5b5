"""Fused patch-group-norm loss: equivalence with the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maestro_tpu.conf import DatasetsConfig, MaskConfig
from maestro_tpu.ops.fused_loss import fused_reconstruction_loss
from maestro_tpu.specs.fusion import build_fusion_plan
from maestro_tpu.train.losses import reconstruction_loss


def _setup(seed=0):
    ds = DatasetsConfig(name_dataset="treesatai_ts").dataset
    plan = build_fusion_plan(ds, MaskConfig(), "group")
    rng = np.random.default_rng(seed)
    targets, rec, masks = {}, {}, {}
    for name, spec in plan.mod_specs.items():
        shape = (2, spec.num_dates, spec.num_channels, spec.image_size,
                 spec.image_size)
        targets[name] = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        rec[name] = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        token_mask = rng.random((2, spec.date_axis, spec.tokens_per_date)) < 0.75
        from maestro_tpu.ops.patch import expand_token_mask_to_pixels

        masks[name] = expand_token_mask_to_pixels(
            jnp.asarray(token_mask), spec.patch_size, spec.num_channels,
        )
    return plan, targets, rec, masks


@pytest.mark.parametrize("loss_type", ["l1_norm", "l2_norm"])
def test_fused_matches_reference(loss_type):
    plan, targets, rec, masks = _setup()
    ref = reconstruction_loss(plan, targets, rec, masks, loss_type)
    fused = fused_reconstruction_loss(plan, targets, rec, masks, loss_type)
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-5)


def test_fused_gradients_match():
    plan, targets, rec, masks = _setup(1)

    ref_grad = jax.grad(
        lambda r: reconstruction_loss(plan, targets, r, masks, "l2_norm"),
    )(rec)
    fused_grad = jax.grad(
        lambda r: fused_reconstruction_loss(plan, targets, r, masks, "l2_norm"),
    )(rec)
    for name in rec:
        np.testing.assert_allclose(
            np.asarray(fused_grad[name]), np.asarray(ref_grad[name]),
            atol=1e-5, err_msg=name,
        )


def test_fused_non_norm_falls_back():
    plan, targets, rec, masks = _setup(2)
    ref = reconstruction_loss(plan, targets, rec, masks, "l1")
    fused = fused_reconstruction_loss(plan, targets, rec, masks, "l1")
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-6)


def test_token_space_loss_matches_pixel_space():
    """model return_pixels=False + fused loss == pixel path + reference loss."""
    from maestro_tpu.conf import ModelConfig
    from maestro_tpu.models.mae import build_model
    from maestro_tpu.utils.testing import make_synthetic_batch

    datasets = DatasetsConfig(name_dataset="treesatai_ts")
    cfg = ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1)
    model, plan = build_model(datasets, MaskConfig(), cfg, dtype=jnp.float32)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(datasets.dataset, 2).items()}
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, "pretrain"),
    )(batch)

    rng = jax.random.PRNGKey(5)
    pixels, pmasks, targets = jax.jit(
        lambda p, b: model.apply(p, b, "pretrain", rngs={"mask": rng}),
    )(params, batch)
    ref = reconstruction_loss(plan, targets, pixels, pmasks, "l1_norm")

    rec_t, tmasks, targets_t = jax.jit(
        lambda p, b: model.apply(p, b, "pretrain", False, rngs={"mask": rng}),
    )(params, batch)
    for name, spec in plan.mod_specs.items():
        if spec.len_bands == 1:
            assert rec_t[name].ndim == 4, name  # token space
            assert tmasks[name].ndim == 3, name
    fused = fused_reconstruction_loss(plan, targets_t, rec_t, tmasks,
                                      "l1_norm", stage_dtype=jnp.float32)
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-5)


def test_token_space_gradients_flow():
    """Gradients reach the decoder through the token-space fused loss."""
    from maestro_tpu.conf import ModelConfig
    from maestro_tpu.models.mae import build_model
    from maestro_tpu.utils.testing import make_synthetic_batch

    datasets = DatasetsConfig(name_dataset="treesatai_ts")
    cfg = ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1)
    model, plan = build_model(datasets, MaskConfig(), cfg, dtype=jnp.float32)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(datasets.dataset, 2).items()}
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, "pretrain"),
    )(batch)

    def loss_fn(p):
        rec, masks, targets = model.apply(
            p, batch, "pretrain", False, rngs={"mask": jax.random.PRNGKey(5)},
        )
        return fused_reconstruction_loss(plan, targets, rec, masks, "l1_norm",
                                         stage_dtype=jnp.float32)

    grads = jax.jit(jax.grad(loss_fn))(params)
    gnorm = sum(
        float(jnp.sum(jnp.abs(g)))
        for g in jax.tree_util.tree_leaves(grads["params"])
    )
    assert np.isfinite(gnorm) and gnorm > 0.0


def test_patch_group_normalize_unbiased_variance_golden():
    """Normalized targets match the reference's torch semantics exactly:
    ``(t - mean) / sqrt(var + 1e-6)`` with ``target_group.var(dim=(-2,-1),
    keepdim=True)`` — torch's UNBIASED (correction=1) default
    (/root/reference/maestro/train/model.py:222-230).

    Uses the smallest real norm group (p=2, 1 channel -> n=4 elements per
    patch), where biased vs unbiased differ by sqrt(4/3) ~ 15% scale: this
    test fails loudly if either the XLA path or the Pallas-fallback path
    regresses to ddof=0.
    """
    torch = pytest.importorskip("torch")
    from maestro_tpu.train.losses import patch_group_normalize

    rng = np.random.default_rng(7)
    t = rng.normal(size=(2, 3, 3, 6, 6)).astype(np.float32)  # [B,D,C,H,W]
    p, norm_groups = 2, (1, 2)

    got = np.asarray(patch_group_normalize(jnp.asarray(t), p, norm_groups))

    tt = torch.from_numpy(t)
    b, d, c, hh, ww = tt.shape
    g = hh // p
    x = tt.reshape(b, d, c, g, p, g, p)
    x = x.permute(0, 1, 3, 5, 4, 6, 2).reshape(b, d, g * g, p * p, c)
    off, parts = 0, []
    for chans in norm_groups:
        grp = x[..., off : off + chans]
        off += chans
        mean = grp.mean(dim=(-2, -1), keepdim=True)
        var = grp.var(dim=(-2, -1), keepdim=True)  # torch default: unbiased
        parts.append((grp - mean) / (var + 1e-6) ** 0.5)
    x = torch.cat(parts, dim=-1)
    x = x.reshape(b, d, g, g, p, p, c).permute(0, 1, 6, 2, 4, 3, 5)
    want = x.reshape(b, d, c, hh, ww).numpy()

    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_reconstruction_loss_matches_torch_reference():
    """Golden parity of the patch-group-norm masked loss vs torch semantics.

    Reimplements the reference compute_loss_rec
    (/root/reference/maestro/train/model.py:195-247) with torch ops: rearrange
    the target to [B, D, L, p*p, C], normalize per (patch, band group), mask-
    select, per-modality mean, weight by D * L. The maestro_tpu loss (and its
    Pallas-fused variant) must agree to fp32 tolerance.
    """
    torch = pytest.importorskip("torch")

    plan, targets, rec, masks = _setup(3)

    total, weights = 0.0, 0.0
    for name, spec in plan.mod_specs.items():
        t = torch.from_numpy(np.asarray(targets[name]))
        r = torch.from_numpy(np.asarray(rec[name]))
        m = torch.from_numpy(np.asarray(masks[name]))
        b, d, c, hh, ww = t.shape
        p = spec.patch_size
        g = hh // p

        def patches(x):
            x = x.reshape(b, d, c, g, p, g, p)
            return x.permute(0, 1, 3, 5, 4, 6, 2).reshape(b, d, g * g, p * p, c)

        tp, rp, mp = patches(t), patches(r), patches(m)
        off, parts = 0, []
        for chans in spec.norm_groups:
            grp = tp[..., off : off + chans]
            off += chans
            mean = grp.mean(dim=(-2, -1), keepdim=True)
            # torch DEFAULT correction=1 (unbiased), exactly as the
            # reference writes it (model.py:228) — this parity test fails
            # if the repo regresses to the biased (ddof=0) estimator
            var = grp.var(dim=(-2, -1), keepdim=True)
            parts.append((grp - mean) / torch.sqrt(var + 1e-6))
        tp = torch.cat(parts, dim=-1)

        err = torch.abs(tp - rp)  # l1_norm
        sel = err[mp > 0]
        mod_loss = sel.mean() if sel.numel() else torch.tensor(0.0)
        weight = spec.num_dates * spec.tokens_per_date
        total = total + weight * float(mod_loss)
        weights += weight
    want = total / weights

    got = float(reconstruction_loss(plan, targets, rec, masks, "l1_norm"))
    got_fused = float(fused_reconstruction_loss(plan, targets, rec, masks,
                                                "l1_norm"))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    np.testing.assert_allclose(got_fused, want, rtol=1e-5)
