"""The framework must LEARN, not just run: fit a synthetic-but-real signal.

The fixture datasets elsewhere in the suite use random targets, so metrics
only prove finiteness.  Here the targets are deterministic functions of the
imagery — multilabel presence encoded as bright vertical stripes, segmentation
labels as spatial quadrants — and a micro model finetuned for a few dozen
steps must beat chance by a wide margin.  This is the strongest correctness
guard available without the (license-gated) real datasets: a silent numerics
bug anywhere in embed -> encode -> heads -> loss -> grads -> AdamW would show
up as chance-level scores.

Reference equivalent: none (the reference's CI never trains); SURVEY.md §4
"match and exceed".
"""

import jax
import jax.numpy as jnp
import numpy as np

from maestro_tpu.conf import (
    DatasetsConfig,
    MaskConfig,
    ModelConfig,
    OptFinetuneConfig,
)
from maestro_tpu.models.mae import build_model
from maestro_tpu.train.optim import make_optimizer
from maestro_tpu.train.state import TrainState
from maestro_tpu.train.steps import (
    compute_metrics,
    init_metric_states,
    make_supervised_eval_step,
    make_supervised_step,
)
from maestro_tpu.utils.testing import make_synthetic_batch


def _striped_treesat_batch(datasets, batch: int, rng: np.random.Generator):
    """Multilabel targets drawn per sample; label i=1 paints aerial stripe i
    bright.  Prevalence 0.3, so all-positive guessing caps weighted F1 at
    2*0.3/1.3 ~ 0.46 and all-negative at 0."""
    b = make_synthetic_batch(datasets.dataset, batch, seed=0)
    num_classes = 15
    y = (rng.random((batch, num_classes)) < 0.3).astype(np.int32)
    aerial = np.asarray(b["aerial"])  # [B, 1, 4, H, W]
    h = aerial.shape[-2]
    aerial = rng.random(aerial.shape).astype(np.float32) * 0.1
    stripe = h // num_classes
    for i in range(num_classes):
        sl = slice(i * stripe, (i + 1) * stripe)
        aerial[:, :, :, sl, :] += (
            y[:, i, None, None, None, None].astype(np.float32) * 0.9
        )
    b["aerial"] = aerial
    b["treesat_mlc_thresh"] = y
    return b


def test_multilabel_finetune_beats_chance():
    # shrink the aerial stream (like tests/test_mesh.py) so the compile is
    # cheap; grid 15 = one patch row per label stripe
    ds = DatasetsConfig(name_dataset="treesatai_ts")
    ds.treesatai_ts.aerial.image_size = 60
    ds.treesatai_ts.aerial.patch_size.mae = 4
    ds.treesatai_ts.__post_init__()
    cfg = ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1)
    model, _ = build_model(ds, MaskConfig(), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(42)
    batches = [
        {k: jnp.asarray(v)
         for k, v in _striped_treesat_batch(ds, 8, rng).items()}
        for _ in range(2)
    ]
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "mask": key}, batches[0], "finetune")

    steps = 50
    opt = OptFinetuneConfig(base_lr=3e-3, batch_size=8)
    tx = make_optimizer(opt, "finetune", total_steps=steps, params=params)
    state = TrainState.create(params, tx)
    step = make_supervised_step(model, "finetune", tx, donate=False)

    ms = init_metric_states(model.head_specs)
    for i in range(steps):
        state, ms, logs = step(state, batches[i % 2], ms)
    assert np.isfinite(float(logs["loss_pred"]))

    # fresh metrics over both batches with the trained weights
    eval_step = make_supervised_eval_step(model, "finetune")
    ms = init_metric_states(model.head_specs)
    for b in batches:
        ms, _ = eval_step(state, b, ms)
    wf1 = compute_metrics(model.head_specs, ms)[
        "treesat_mlc_thresh"]["weighted_f1"]
    assert wf1 > 0.8, f"model failed to learn the striped labels: wF1={wf1}"

    # int8 serving path on the TRAINED weights: the task metric must survive
    # quantization (a far stronger accuracy check than logit cosine on
    # random weights)
    from maestro_tpu.quant import make_quant_predict_fn, quantize_params

    qfn = make_quant_predict_fn(model, "finetune")
    qp = quantize_params(state.params)
    ms_q = init_metric_states(model.head_specs)
    for b in batches:
        logits = qfn(qp, b)
        from maestro_tpu.train import metrics as M
        from maestro_tpu.train.losses import prediction_losses

        _, aux = prediction_losses(model.head_specs, b, logits)
        ms_q = {
            hs.name: M.metric_update(hs.type_target, ms_q[hs.name],
                                     aux[hs.name])
            for hs in model.head_specs
        }
    wf1_q = compute_metrics(model.head_specs, ms_q)[
        "treesat_mlc_thresh"]["weighted_f1"]
    assert wf1_q > 0.8, f"int8 quantization broke the trained model: {wf1_q}"


def _quadrant_pastis_batch(datasets, batch: int, rng: np.random.Generator):
    """Segmentation target = which image quadrant, readable from the S2
    stream: class c gets intensity (c+1)/4 in band 0.  Chance mIoU over the
    4 used classes ~ 0.25 at best (constant prediction: 0.0625 mean IoU)."""
    b = make_synthetic_batch(datasets.dataset, batch, seed=0)
    s2 = np.asarray(b["s2"])  # [B, D, 10, h, w]
    h, w = s2.shape[-2:]
    target = np.asarray(b["pastis_seg"])  # [B, 1, 1, H, W]
    th, tw = target.shape[-2:]
    lab = np.zeros((th, tw), dtype=target.dtype)
    lab[th // 2:, :] += 2
    lab[:, tw // 2:] += 1
    s2 = rng.random(s2.shape).astype(np.float32) * 0.1
    sh, sw = h // 2, w // 2
    for c, (ys, xs) in enumerate(
        ((slice(None, sh), slice(None, sw)), (slice(None, sh), slice(sw, None)),
         (slice(sh, None), slice(None, sw)), (slice(sh, None), slice(sw, None))),
    ):
        s2[:, :, 0, ys, xs] = (c + 1) / 4.0
    b["s2"] = s2
    b["pastis_seg"] = np.broadcast_to(
        lab, target.shape).astype(target.dtype).copy()
    return b


def test_segmentation_finetune_beats_chance():
    ds = DatasetsConfig(name_dataset="pastis_hd")
    ds.pastis_hd.spot.image_size = 32  # cheap compile; signal lives in s2
    ds.pastis_hd.spot.patch_size.mae = 4
    ds.pastis_hd.__post_init__()
    cfg = ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1)
    model, _ = build_model(ds, MaskConfig(), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    batch = {
        k: jnp.asarray(v)
        for k, v in _quadrant_pastis_batch(ds, 4, rng).items()
    }
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "mask": key}, batch, "finetune")

    steps = 40
    opt = OptFinetuneConfig(base_lr=3e-3, batch_size=4)
    tx = make_optimizer(opt, "finetune", total_steps=steps, params=params)
    state = TrainState.create(params, tx)
    step = make_supervised_step(model, "finetune", tx, donate=False)

    ms = init_metric_states(model.head_specs)
    for _ in range(steps):
        state, ms, logs = step(state, batch, ms)
    assert np.isfinite(float(logs["loss_pred"]))

    eval_step = make_supervised_eval_step(model, "finetune")
    ms = init_metric_states(model.head_specs)
    ms, _ = eval_step(state, batch, ms)
    seg = compute_metrics(model.head_specs, ms)["pastis_seg"]
    assert seg["overall_accuracy"] > 0.9, (
        f"model failed to learn the quadrant segmentation: {seg}"
    )
