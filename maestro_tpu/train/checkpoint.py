"""Checkpointing with the reference's dual restore semantics.

Reference (/root/reference/maestro/hydra_utils.py:17-48 + run_experiment.py:
66-121): ``load_*`` = warm-start weights only (strict=False: missing/extra
subtrees are tolerated — this is how cross-dataset transfer re-binds a
pretrained trunk onto a new dataset's patch embeds via ``name_embed``
aliasing) vs ``fit_*`` = full train-state resume (params + opt state + step).

Implementation: orbax StandardCheckpointer over the raw pytrees, with
checkpoint directories named ``{phase}-epoch={N}`` and discovery of the
latest epoch by sort, mirroring the reference's glob convention.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp
from jax.sharding import NamedSharding, PartitionSpec


def save_checkpoint(
    ckpt_dir: str | Path,
    phase: str,
    epoch: int,
    state,
    extra: dict[str, Any] | None = None,
) -> Path:
    path = Path(ckpt_dir).absolute() / f"{phase}-epoch={epoch}"
    if (path / "state").exists():
        _staged_overwrite(path, _payload(state))  # see AsyncSaver.save
    else:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path / "state", _payload(state), force=True)
    _write_meta(path, extra)
    return path


def _write_meta(path: Path, extra: dict[str, Any] | None) -> None:
    """meta.json next to the state dir — process 0 only.

    Multi-host checkpoints go to ONE shared directory (orbax's collective
    save assumes it); N processes writing the same small file is a race.
    """
    if extra and jax.process_index() == 0:
        path.mkdir(parents=True, exist_ok=True)
        (path / "meta.json").write_text(json.dumps(extra, default=str))


def _staged_overwrite(path: Path, payload: dict[str, Any]) -> None:
    """Replace ``path/state`` leaving at most a rename-length durability gap.

    The new state is fully committed to a sibling dir first; only then is
    the old one removed and the sibling renamed into place.
    """
    import shutil

    from jax.experimental import multihost_utils

    staging = path / "state.new"
    multi = jax.process_count() > 1
    # orbax's save is collective (all processes write their shards into the
    # shared dir); the surrounding rmtree/rename dance must run on exactly
    # one process, with barriers so nobody writes into a dir being deleted
    if jax.process_index() == 0 and staging.exists():
        shutil.rmtree(staging)
    if multi:
        multihost_utils.sync_global_devices("ckpt_stage_clean")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(staging, payload, force=True)
    if jax.process_index() == 0:
        old = path / "state"
        shutil.rmtree(old)
        staging.rename(old)
    if multi:
        multihost_utils.sync_global_devices("ckpt_swap")


def _payload(state) -> dict[str, Any]:
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    return payload


class AsyncSaver:
    """Non-blocking epoch checkpoints (orbax AsyncCheckpointer).

    The reference's Lightning ModelCheckpoint serializes on the train loop's
    critical path; at FLAIR scale a multi-GB state costs seconds per epoch.
    ``save`` copies device arrays to host synchronously — safe with donated
    train states, whose device buffers the next step overwrites — and
    persists in a background thread.  orbax stages into a temp dir and
    renames on commit, so ``find_latest_checkpoint`` never sees a partial
    save.  Call ``wait`` before restoring a just-saved path (test-on-best,
    preemption) and at phase end.
    """

    def __init__(self) -> None:
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(
        self,
        ckpt_dir: str | Path,
        phase: str,
        epoch: int,
        state,
        extra: dict[str, Any] | None = None,
    ) -> Path:
        path = Path(ckpt_dir).absolute() / f"{phase}-epoch={epoch}"
        if (path / "state").exists():
            # overwrite (e.g. completing a resumed interrupted epoch):
            # force=True would delete the committed state synchronously and
            # commit the replacement only when the background write finishes
            # -- a hard kill in that window would leave NO checkpoint. Stage
            # next to it and swap instead (window = one rename).
            self.wait()
            _staged_overwrite(path, _payload(state))
        else:
            self._ckptr.save(
                path / "state", args=ocp.args.StandardSave(_payload(state)),
                force=True,
            )
        _write_meta(path, extra)
        return path

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._ckptr.close()


def find_latest_checkpoint(ckpt_dir: str | Path, phase: str) -> Path | None:
    """Latest ``{phase}-epoch=N`` checkpoint under a directory tree."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    pattern = re.compile(rf"{re.escape(phase)}-epoch=(\d+)$")
    candidates = []
    for p in ckpt_dir.rglob(f"{phase}-epoch=*"):
        m = pattern.search(p.name)
        if m and (p / "state").exists():
            candidates.append((int(m.group(1)), p))
    if not candidates:
        return None
    return max(candidates)[1]


def load_meta(path: str | Path) -> dict[str, Any]:
    """The ``extra`` dict saved next to a checkpoint (empty if absent)."""
    meta = Path(path) / "meta.json"
    if not meta.exists():
        return {}
    return json.loads(meta.read_text())


def checkpoint_epoch(path: str | Path) -> int | None:
    """Epoch of a ``{phase}-epoch=N`` checkpoint directory.

    Prefers meta.json, falling back to the directory name: meta is written
    after the state commit, so a crash in that window must not make a resume
    silently restart at epoch 0 on top of restored optimizer state.
    """
    meta = load_meta(path)
    if "epoch" in meta:
        return int(meta["epoch"])
    m = re.search(r"-epoch=(\d+)$", Path(path).name)
    return int(m.group(1)) if m else None


def restore_state(path: str | Path, state):
    """Full restore into an existing TrainState template (fit_* resume).

    When the template is mesh-sharded, every restored leaf is re-placed on
    its template sharding — and leaves whose template was uncommitted (the
    step counter, optax scalar counts) are replicated over the params mesh.
    Orbax otherwise restores those committed to one device, and a jitted
    step then rejects the mixed device commitments.
    """
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if state.ema_params is not None:
        template["ema_params"] = state.ema_params
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(Path(path).absolute() / "state", template)

    mesh = next(
        (leaf.sharding.mesh for leaf in jax.tree.leaves(state.params)
         if isinstance(getattr(leaf, "sharding", None), NamedSharding)),
        None,
    )
    if mesh is not None and mesh.size > 1:
        replicated = NamedSharding(mesh, PartitionSpec())

        def _place(tmpl_leaf, leaf):
            sharding = getattr(tmpl_leaf, "sharding", None)
            target = (
                sharding if isinstance(sharding, NamedSharding) else replicated
            )
            return jax.device_put(leaf, target)

        restored = jax.tree.map(_place, template, restored)
    return state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
        ema_params=restored.get("ema_params", state.ema_params),
    )


def load_weights(path: str | Path, params, unmatched_out: list | None = None):
    """strict=False weight warm start: copy matching leaves, keep the rest.

    Leaves match when both tree path and shape agree; everything else keeps
    its fresh initialization (the reference's load_from_checkpoint
    strict=False behavior, run_experiment.py:66-74).  Pass ``unmatched_out``
    to collect the paths of leaves that kept their fresh init (strictness-
    sensitive callers, e.g. serving export, should fail or warn on them).
    """
    with ocp.StandardCheckpointer() as ckptr:
        saved_params = ckptr.restore(
            Path(path).absolute() / "state",
        )["params"]
    return _merge_matching(saved_params, params, unmatched_out)


def load_ema_weights(path: str | Path, params,
                     unmatched_out: list | None = None):
    """EMA weights from a checkpoint, merged onto a params-shaped template.

    Returns None when the checkpoint stores no EMA state (e.g. pretrain /
    probe checkpoints, or use_ema=false runs).
    """
    with ocp.StandardCheckpointer() as ckptr:
        saved = ckptr.restore(Path(path).absolute() / "state")
    ema = saved.get("ema_params")
    if ema is None:
        return None
    return _merge_matching(ema, params, unmatched_out)


def _merge_matching(saved_tree, params, unmatched_out: list | None = None):
    """Copy saved leaves onto a template where path AND shape agree; other
    leaves keep the template's values (strict=False semantics)."""
    flat_saved = _flatten(saved_tree)
    flat_new = _flatten(params)
    merged = {}
    for key, val in flat_new.items():
        sv = flat_saved.get(key)
        if sv is not None and np.shape(sv) == np.shape(val):
            merged[key] = jax.numpy.asarray(sv, dtype=val.dtype)
        else:
            merged[key] = val
            if unmatched_out is not None:
                unmatched_out.append("/".join(map(str, key)))
    return _unflatten(merged, params)


def _flatten(tree) -> dict[tuple, Any]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {
        tuple(str(getattr(k, "key", k)) for k in path): v for path, v in flat
    }


def _unflatten(flat: dict[tuple, Any], template):
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    ordered = [
        flat[tuple(str(getattr(k, "key", k)) for k in path)] for path, _ in leaves
    ]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), ordered,
    )
