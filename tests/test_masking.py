"""Masking op tests: structural mask, biased shuffle, unmask round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from maestro_tpu.conf import MaskConfig
from maestro_tpu.ops.masking import shuffle_mask, structural_mask, unmask
from maestro_tpu.specs.fusion import build_fusion_plan


def test_shuffle_mask_counts():
    key = jax.random.PRNGKey(0)
    x = jnp.arange(4 * 20 * 3, dtype=jnp.float32).reshape(4, 20, 3)
    struct = jnp.zeros((4, 20), dtype=bool)
    kept, mask, ids_keep = shuffle_mask(key, x, struct, 15)
    assert kept.shape == (4, 5, 3)
    assert mask.shape == (4, 20)
    np.testing.assert_array_equal(np.asarray(mask.sum(axis=1)), 15)
    # kept tokens are the unmasked ones, in original order
    for b in range(4):
        unmasked_pos = np.nonzero(~np.asarray(mask[b]))[0]
        np.testing.assert_array_equal(np.asarray(ids_keep[b]), unmasked_pos)
        np.testing.assert_array_equal(np.asarray(kept[b]), np.asarray(x[b])[unmasked_pos])


def test_shuffle_mask_bias():
    """Structurally-masked tokens must be masked preferentially."""
    key = jax.random.PRNGKey(1)
    x = jnp.zeros((8, 40, 2))
    struct = jnp.zeros((8, 40), dtype=bool).at[:, :20].set(True)
    _, mask, _ = shuffle_mask(key, x, struct, 25)
    # all 20 structurally-masked tokens fall inside the 25 masked
    assert bool(mask[:, :20].all())


def test_unmask_roundtrip():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (3, 16, 4))
    struct = jnp.zeros((3, 16), dtype=bool)
    kept, mask, _ = shuffle_mask(key, x, struct, 10)
    mask_token = jnp.full((3, 16, 4), -1.0)
    full = unmask(kept, mask_token, mask)
    full_np, x_np, m = np.asarray(full), np.asarray(x), np.asarray(mask)
    # unmasked positions recover the encoded tokens; masked get the token
    np.testing.assert_allclose(full_np[~m], x_np[~m], rtol=1e-6)
    np.testing.assert_allclose(full_np[m], -1.0)


def test_structural_mask_no_full_streams(datasets_treesat):
    """No (sample, stream) may end up fully masked, and probabilities bind."""
    plan = build_fusion_plan(
        datasets_treesat.dataset,
        MaskConfig(mask_mod=0.5, mask_dates=0.5, mask_loc=0.5),
        "group",
    )
    masks = jax.jit(
        lambda k: structural_mask(plan, k, 16),
    )(jax.random.PRNGKey(3))
    for name, m in masks.items():
        m = np.asarray(m)
        assert m.shape == (16, plan.streams[name].seq_len)
        assert not m.all(axis=1).any(), f"stream {name} fully masked"
    # with p=0.5 on several axes, a good fraction of tokens must be masked
    total = np.concatenate([np.asarray(m).ravel() for m in masks.values()])
    assert 0.05 < total.mean() < 0.95


def test_structural_mask_disabled_for_shared(datasets_treesat):
    plan = build_fusion_plan(datasets_treesat.dataset, MaskConfig(), "shared")
    masks = structural_mask(plan, jax.random.PRNGKey(0), 4)
    for name, m in masks.items():
        stream = plan.streams[name]
        assert m.shape == (4 * stream.batch_factor, stream.seq_len)
        assert not bool(m.any())
