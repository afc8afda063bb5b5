"""Checkpoint save/restore roundtrips + dual restore semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from maestro_tpu.train import checkpoint as ckpt
from maestro_tpu.train.state import TrainState


def _state(seed=0, extra_leaf=False):
    key = jax.random.PRNGKey(seed)
    params = {
        "params": {
            "dense": {"kernel": jax.random.normal(key, (4, 8)),
                      "bias": jnp.zeros(8)},
        },
    }
    if extra_leaf:
        params["params"]["head"] = {"kernel": jnp.ones((8, 2))}
    tx = optax.adamw(1e-3)
    return TrainState.create(params, tx, use_ema=True), tx


def test_save_restore_roundtrip(tmp_path):
    state, tx = _state()
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    path = ckpt.save_checkpoint(tmp_path, "pretrain", 3, state)
    assert path.name == "pretrain-epoch=3"

    fresh, _ = _state(seed=1)
    restored = ckpt.restore_state(path, fresh)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(
        np.asarray(restored.params["params"]["dense"]["kernel"]),
        np.asarray(state.params["params"]["dense"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(restored.ema_params["params"]["dense"]["kernel"]),
        np.asarray(state.ema_params["params"]["dense"]["kernel"]),
    )


def test_find_latest_checkpoint(tmp_path):
    state, _ = _state()
    for epoch in (0, 2, 10):
        ckpt.save_checkpoint(tmp_path / "checkpoints", "finetune", epoch, state)
    found = ckpt.find_latest_checkpoint(tmp_path, "finetune")
    assert found is not None
    assert found.name == "finetune-epoch=10"
    assert ckpt.find_latest_checkpoint(tmp_path, "probe") is None


def test_load_weights_strict_false(tmp_path):
    """Warm start: matching leaves copied, extra leaves keep fresh init."""
    state, _ = _state(seed=0)
    path = ckpt.save_checkpoint(tmp_path, "pretrain", 0, state)

    fresh, _ = _state(seed=1, extra_leaf=True)  # has a head the ckpt lacks
    merged = ckpt.load_weights(path, fresh.params)
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["dense"]["kernel"]),
        np.asarray(state.params["params"]["dense"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["head"]["kernel"]), np.ones((8, 2)),
    )


def test_async_saver_matches_sync(tmp_path):
    """AsyncSaver.save + wait produces a checkpoint identical to the sync
    path, discoverable by find_latest_checkpoint, with meta.json present."""
    state, _ = _state()
    state = state.replace(step=jnp.asarray(5, jnp.int32))

    saver = ckpt.AsyncSaver()
    try:
        path = saver.save(tmp_path / "checkpoints", "pretrain", 2, state,
                          extra={"phase": "pretrain", "epoch": 2})
        saver.wait()
    finally:
        saver.close()
    assert path.name == "pretrain-epoch=2"
    assert ckpt.load_meta(path)["epoch"] == "2" or ckpt.load_meta(path)["epoch"] == 2
    found = ckpt.find_latest_checkpoint(tmp_path, "pretrain")
    assert found == path

    fresh, _ = _state(seed=1)
    restored = ckpt.restore_state(path, fresh)
    assert int(restored.step) == 5
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.params, state.params,
    )


def test_async_saver_sequential_epochs(tmp_path):
    """Back-to-back async saves (epoch cadence) all commit."""
    state, _ = _state()
    saver = ckpt.AsyncSaver()
    try:
        for epoch in range(3):
            saver.save(tmp_path / "checkpoints", "probe", epoch, state)
        saver.wait()
    finally:
        saver.close()
    found = ckpt.find_latest_checkpoint(tmp_path, "probe")
    assert found is not None and found.name == "probe-epoch=2"


def test_overwrite_save_is_staged(tmp_path):
    """Saving onto an existing checkpoint path keeps the old state intact
    until the replacement is fully committed (rename-length gap only)."""
    state, _ = _state()
    path = ckpt.save_checkpoint(tmp_path, "finetune", 0, state)
    state2, _ = _state(seed=9)
    path2 = ckpt.save_checkpoint(tmp_path, "finetune", 0, state2)
    assert path2 == path
    assert not (path / "state.new").exists()  # staging cleaned up
    restored = ckpt.restore_state(path, _state(seed=1)[0])
    np.testing.assert_array_equal(
        np.asarray(restored.params["params"]["dense"]["kernel"]),
        np.asarray(state2.params["params"]["dense"]["kernel"]),
    )

    # same through the async saver
    state3, _ = _state(seed=11)
    saver = ckpt.AsyncSaver()
    try:
        saver.save(tmp_path, "finetune", 0, state3)
        saver.wait()
    finally:
        saver.close()
    restored = ckpt.restore_state(path, _state(seed=1)[0])
    np.testing.assert_array_equal(
        np.asarray(restored.params["params"]["dense"]["kernel"]),
        np.asarray(state3.params["params"]["dense"]["kernel"]),
    )


def test_load_weights_reports_unmatched(tmp_path):
    state, _ = _state(seed=0)
    path = ckpt.save_checkpoint(tmp_path, "pretrain", 0, state)
    fresh, _ = _state(seed=1, extra_leaf=True)  # head absent from the ckpt
    unmatched = []
    ckpt.load_weights(path, fresh.params, unmatched_out=unmatched)
    assert unmatched == ["params/head/kernel"]


def test_checkpoint_epoch_falls_back_to_dirname(tmp_path):
    """A crash between the state commit and the meta.json write must not make
    a resume restart at epoch 0 (checkpoint_epoch parses the dir name)."""
    state, _ = _state()
    path = ckpt.save_checkpoint(tmp_path, "pretrain", 5, state,
                                extra={"epoch": 5, "phase": "pretrain"})
    assert ckpt.checkpoint_epoch(path) == 5  # meta present

    (path / "meta.json").unlink()
    assert ckpt.load_meta(path) == {}
    assert ckpt.checkpoint_epoch(path) == 5  # dir-name fallback

    assert ckpt.checkpoint_epoch(tmp_path / "not-a-checkpoint") is None
