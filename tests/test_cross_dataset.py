"""Cross-dataset warm start: pretrained trunk re-binds to a new dataset.

Reference capability (run_experiment.py:66-74 + mim.py:62-79): load_*
restores matching weights strict=False; encoders and patch embeds shared by
``name_embed`` transfer across datasets even when modality sets differ.
"""

import jax
import jax.numpy as jnp
import numpy as np

from maestro_tpu.conf import DatasetsConfig, MaskConfig, ModelConfig
from maestro_tpu.models.mae import build_model
from maestro_tpu.train import checkpoint as ckpt
from maestro_tpu.train.state import TrainState
from maestro_tpu.utils.testing import make_synthetic_batch
import optax


def _init(datasets, seed):
    cfg = ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1)
    model, plan = build_model(datasets, MaskConfig(), cfg, dtype=jnp.float32)
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(datasets.dataset, 1).items()}
    key = jax.random.PRNGKey(seed)
    params = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, "pretrain"),
    )(batch)
    return model, params


def test_treesat_to_pastis_warm_start(tmp_path, datasets_treesat, datasets_pastis):
    _, src_params = _init(datasets_treesat, 0)
    state = TrainState.create(src_params, optax.sgd(1e-3))
    path = ckpt.save_checkpoint(tmp_path, "pretrain", 0, state)

    _, dst_params = _init(datasets_pastis, 1)
    merged = ckpt.load_weights(path, dst_params)

    flat_src = {
        tuple(str(getattr(k, "key", k)) for k in p): v
        for p, v in jax.tree_util.tree_flatten_with_path(src_params)[0]
    }
    transferred, kept = 0, 0
    for p, v in jax.tree_util.tree_flatten_with_path(merged)[0]:
        key = tuple(str(getattr(k, "key", k)) for k in p)
        sv = flat_src.get(key)
        if sv is not None and np.shape(sv) == np.shape(v):
            np.testing.assert_array_equal(np.asarray(v), np.asarray(sv))
            transferred += 1
        else:
            kept += 1
    # shared-surface weights (s2/s1 embeds, s1/s2 encoders, trunk) transfer
    assert transferred > 20, (transferred, kept)
    # dataset-specific weights (spot embed vs aerial embed) stay fresh
    assert kept > 0

    # s2 patch embed is shared across the datasets (same bands + patch size)
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["patch_embed_s2"]["proj0"]["kernel"]),
        np.asarray(src_params["params"]["patch_embed_s2"]["proj0"]["kernel"]),
    )
    # PASTIS-only spot embed kept its own initialization (absent in source)
    assert "patch_embed_spot" in merged["params"]
