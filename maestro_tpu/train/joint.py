"""Joint multi-dataset MAE pretraining (beyond the reference).

The reference transfers across datasets sequentially: pretrain on A, then
warm-start B with ``run.load_name`` — weight sharing happens through
name_embed-aliased patch embeds and same-name encoder modules surviving the
strict=False merge (/root/reference/maestro/ssl/mim.py:62-79,
run_experiment.py:66-74).  Joint pretraining generalizes that to
*simultaneous* training: one union parameter tree in which modules with the
same path — patch embeds shared via ``name_embed``, per-group encoders, the
shared inter trunk, decoders, mask tokens — are literally the same arrays,
trained by alternating per-dataset jitted steps.  Each dataset keeps its own
static shapes and FusionPlan, so each step is its own XLA program over the
shared tree (TPU-native: no dynamic shapes, no retracing between datasets).

Sharing rules:

* embedders/pixelify share when ``name_embed`` matches AND the kernel shapes
  agree ((band_groups, patch_size)); conflicting aliases are rewritten to
  dataset-local names (``{name}__{dataset}``) — the same outcome the
  reference's strict=False merge produces (mismatched shapes stay fresh).
* encoders/decoders/trunk share by stream name — their parameters are
  sequence-length-independent, so they are always shape-compatible.
* per-dataset updates are masked to the leaves that dataset's model owns:
  torch AdamW skips grad-less params, and without the mask optax's weight
  decay would shrink the other datasets' modules on every alternate step.
  The optimizer state of idle leaves is frozen the same way
  (``mask_opt_state``): a dataset's Adam moments neither decay nor update
  while another dataset is training, exactly as if each dataset held its
  own optimizer for its private subtree while sharing moments on the
  shared core.
"""

from __future__ import annotations

import copy
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from maestro_tpu.conf.core import MaskConfig, ModelConfig
from maestro_tpu.models.mae import build_model
from maestro_tpu.train.state import TrainState


def dedupe_embed_aliases(datasets_cfgs: list, model: str = "mae") -> list:
    """Rewrite ``name_embed`` so only shape-compatible embedders share.

    Aliases are canonical per (alias, signature): the first signature seen
    keeps the bare alias, every other distinct signature gets a stable
    ``{alias}__v{k}`` name shared by ALL datasets with that signature — so
    sharing never depends on the order datasets are listed in.  Returns deep
    copies; the inputs are untouched.
    """
    out = [copy.deepcopy(d) for d in datasets_cfgs]
    # alias -> {signature: resolved name}
    resolved: dict[str, dict[tuple, str]] = {}
    for dcfg in out:
        for name, mod in dcfg.dataset.inputs.items():
            alias = mod.name_embed or name
            sig = (tuple(mod.band_groups), mod.patch_size.for_model(model))
            sigs = resolved.setdefault(alias, {})
            if sig not in sigs:
                sigs[sig] = alias if not sigs else f"{alias}__v{len(sigs)}"
            if sigs[sig] != alias:
                mod.name_embed = sigs[sig]
    return out


def build_joint(
    datasets_cfgs: list,
    mask_cfg: MaskConfig,
    model_cfg: ModelConfig,
    dtype: Any = jnp.bfloat16,
    remat: Any = False,
) -> tuple[list, list, list]:
    """(deduped dataset cfgs, models, plans) for joint pretraining."""
    cfgs = dedupe_embed_aliases(datasets_cfgs, model=model_cfg.model)
    # mask tokens are keyed by modality NAME (mask_token_{name}, shape
    # (1, len_bands, 1, 1, dec_dim)) and cannot be alias-renamed: same-named
    # modalities must agree on band grouping across datasets
    seen_bands: dict[str, tuple[int, str]] = {}
    for dcfg in cfgs:
        for name, mod in dcfg.dataset.inputs.items():
            prev = seen_bands.get(name)
            if prev is None:
                seen_bands[name] = (mod.len_bands, dcfg.name_dataset)
            elif prev[0] != mod.len_bands:
                msg = (
                    f"modality {name!r} has {prev[0]} band group(s) in "
                    f"{prev[1]} but {mod.len_bands} in {dcfg.name_dataset}; "
                    "its per-modality mask token cannot be shared — align "
                    "the band grouping or rename the modality"
                )
                raise ValueError(msg)
    models, plans = [], []
    for dcfg in cfgs:
        m, p = build_model(dcfg, mask_cfg, model_cfg, dtype=dtype, remat=remat)
        models.append(m)
        plans.append(p)
    return cfgs, models, plans


def _paths(tree) -> set[tuple]:
    return {
        tuple(str(getattr(k, "key", k)) for k in p)
        for p, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def _merge(a: dict, b: dict, path: tuple = ()) -> dict:
    out = dict(a)
    for k, v in b.items():
        if k not in out:
            out[k] = v
        elif isinstance(v, dict):
            out[k] = _merge(out[k], v, (*path, k))
        elif getattr(out[k], "shape", None) != getattr(v, "shape", None):
            msg = (
                f"joint param collision at {'/'.join((*path, k))}: "
                f"{getattr(out[k], 'shape', None)} vs {getattr(v, 'shape', None)}"
                " (dedupe_embed_aliases should have renamed this module)"
            )
            raise ValueError(msg)
    return out


def init_joint_params(models: list, batches: list, seed: int = 0):
    """Union init: merge per-model templates by path (first template wins).

    The same root key is used for every model, so module-scoped params at a
    shared path draw identical values in every template.  Root-scope params
    (the per-modality mask tokens) draw from a per-scope call counter whose
    order differs across datasets, so their shared-path values CAN differ —
    first-wins adoption is the defined semantics (they are then trained
    jointly).  ``_merge`` asserts shape equality at every collision.
    Returns (union_params, per-model templates)."""
    key = jax.random.PRNGKey(seed)
    union: dict | None = None
    templates = []
    for model, batch in zip(models, batches):
        params = jax.jit(
            lambda b, m=model: m.init({"params": key, "mask": key}, b,
                                      "pretrain"),
        )(batch)
        templates.append(params)
        union = params if union is None else _merge(union, params)
    return union, templates


def used_mask(union, template):
    """Pytree of bools over the union: leaves owned by ``template``."""
    owned = _paths(template)
    return jax.tree_util.tree_map_with_path(
        lambda p, _: tuple(str(getattr(k, "key", k)) for k in p) in owned,
        union,
    )


def _string_path(path) -> tuple:
    return tuple(str(getattr(k, "key", getattr(k, "name", k))) for k in path)


def mask_opt_state(new_state, old_state, mask):
    """Freeze idle leaves' optimizer state across another dataset's step.

    ``mask`` is a params-shaped bool pytree (``used_mask``).  Optimizer-state
    leaves (Adam ``mu``/``nu``, weight-decay traces, ...) embed the params
    tree at some path prefix, so each opt-state leaf is matched to its param
    by the longest string-path suffix found in the mask; leaves with no
    param counterpart (step ``count``, schedule state) always take the new
    value.  Without this, idle datasets' Adam moments decay toward zero on
    every alternate step (mu <- b1*mu with zero grads), so a dataset resuming
    after a long idle stretch would take near-SGD steps on its private
    subtree.
    """
    flat_mask = {
        _string_path(p): m
        for p, m in jax.tree_util.tree_flatten_with_path(mask)[0]
    }
    def pick(path, new_leaf, old_leaf):
        sp = _string_path(path)
        for i in range(len(sp)):
            owned = flat_mask.get(sp[i:])
            if owned is not None:
                return new_leaf if owned else old_leaf
        return new_leaf

    return jax.tree_util.tree_map_with_path(pick, new_state, old_state)


def make_joint_pretrain_steps(
    models: list,
    plans: list,
    tx: optax.GradientTransformation,
    union,
    templates: list,
    loss_type: str = "l1_norm",
    donate: bool = False,
) -> list[Callable]:
    """One jitted ``step(state, batch, rng)`` per dataset over the shared
    TrainState; updates masked to the dataset's own subtree."""
    from maestro_tpu.train.steps import pretrain_loss_fn

    steps = []
    for model, plan, tpl in zip(models, plans, templates):
        mask = used_mask(union, tpl)

        def build(model=model, plan=plan, mask=mask):
            loss_fn = pretrain_loss_fn(model, plan, loss_type)

            def step(state: TrainState, batch: dict, rng: jax.Array):
                rng = jax.random.fold_in(rng, state.step)
                loss, grads = jax.value_and_grad(loss_fn)(
                    state.params, batch, rng,
                )
                updates, opt_state = tx.update(grads, state.opt_state,
                                               state.params)
                updates = jax.tree_util.tree_map(
                    lambda u, m: u if m else jnp.zeros_like(u), updates, mask,
                )
                opt_state = mask_opt_state(opt_state, state.opt_state, mask)
                params = optax.apply_updates(state.params, updates)
                return state.replace(
                    step=state.step + 1, params=params, opt_state=opt_state,
                ), {"loss_rec": loss}

            return jax.jit(step, donate_argnums=(0,) if donate else ())

        steps.append(build())
    return steps


def shared_param_paths(templates: list) -> set[tuple]:
    """Paths present in more than one dataset's template (the shared core)."""
    counts: dict[tuple, int] = {}
    for tpl in templates:
        for p in _paths(tpl):
            counts[p] = counts.get(p, 0) + 1
    return {p for p, n in counts.items() if n > 1}
