"""Released-checkpoint key manifests (maestro_tpu/port/manifests.py).

CI rehearsal of the day-one FM-porting contract (r4 VERDICT item 4): for
each adapter, synthesize a state dict with exactly the committed manifest's
key names and shapes (the transcription of the real release, from the
reference's own loading code), run the real port map at the REAL release
size, and assert

- coverage verification passes: every release key is consumed by the port
  or matches a documented skip pattern, and the port reads no key the
  release does not ship;
- the ported tree covers every backbone leaf of the adapter's template —
  only head leaves stay fresh.

With this green, running on the actual released file can only fail if the
transcription itself is wrong — a diffable one-line manifest fix, not a
debugging session.  Negative tests prove surprises fail loudly.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import port_fm  # noqa: E402
from maestro_tpu.conf import (  # noqa: E402
    DatasetsConfig,
    ExperimentConfig,
    ModelConfig,
    RunConfig,
)
from maestro_tpu.models.factory import build_experiment_model  # noqa: E402
from maestro_tpu.port import manifests as mf  # noqa: E402
from maestro_tpu.port.torch_port import merge_into_template  # noqa: E402
from maestro_tpu.utils.testing import make_synthetic_batch  # noqa: E402

MANIFEST_DIR = Path(__file__).resolve().parent / "manifests"

# adapter -> (manifest name, model_size, fusion, version, s2-only?)
CASES = {
    "dinov2": ("dinov2_small", "small", "shared", None, False),
    "dofa": ("dofa_base", "base", "shared", None, False),
    "croma": ("croma_base", "base", "inter-croma", None, False),
    "satmae": ("satmae_base", "base", "mod", None, True),
    "prithvi": ("prithvi_v2_300_tl", "large", "mod", "v2", True),
}


def load_manifest(name: str) -> dict:
    return json.loads((MANIFEST_DIR / f"{name}.json").read_text())


def test_committed_fixtures_match_generators():
    """tests/manifests/*.json are generated artifacts; drift between the
    committed fixture and the in-package generator would silently split the
    CLI's contract from the CI's."""
    for name, gen in mf.ALL_MANIFESTS.items():
        committed = load_manifest(name)
        assert committed == gen(), f"{name}.json is stale; re-run " \
                                   "scripts/gen_manifests.py"


def _build(model_name: str, size: str, fusion: str, version,
           s2_only: bool):
    datasets = DatasetsConfig(name_dataset="pastis_hd")
    if s2_only:
        datasets.pastis_hd.filter_inputs = ["s2"]
        datasets.pastis_hd.__post_init__()
    cfg = ExperimentConfig(
        run=RunConfig(exp_dir="/tmp", exp_name="manifest", seed=0),
        model=ModelConfig(model=model_name, model_size=size,
                          fusion_mode=fusion, use_ema=False,
                          version=version),
    )
    model, _plan, is_baseline = build_experiment_model(
        datasets, cfg, dtype=jnp.float32,
    )
    assert is_baseline
    return model, datasets


@pytest.mark.parametrize("model_name", list(CASES))
def test_port_covers_manifest_and_template(model_name):
    manifest_name, size, fusion, version, s2_only = CASES[model_name]
    manifest = load_manifest(manifest_name)
    src = mf.synthesize_state_dict(manifest, nested=(model_name == "croma"))
    recorder = mf.RecordingDict(src)

    model, datasets = _build(model_name, size, fusion, version, s2_only)
    ported = port_fm.port_fm_params(model_name, recorder, model, datasets)
    mf.verify_coverage(manifest, src, recorder.accessed)  # must not raise

    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(datasets.dataset, 1).items()}
    key = jax.random.PRNGKey(0)
    template = jax.eval_shape(
        lambda: model.init({"params": key}, batch, "finetune"),
    )
    template = jax.tree.map(
        lambda s: np.zeros(s.shape, s.dtype), template,
    )
    merged, used, missing = merge_into_template(ported, template)
    backbone_fresh = [m for m in missing if "heads_" not in m]
    assert used, "no leaves ported at all"
    assert not backbone_fresh, (
        f"{model_name}: release manifest does not cover these backbone "
        f"leaves (shape drift between transcription and adapter?): "
        f"{backbone_fresh[:10]}"
    )


def test_unknown_source_key_fails_loudly():
    """A release shipping a key the port silently drops must be surfaced
    (the historical failure mode: surprise keys in released manifests)."""
    manifest = load_manifest("satmae_base")
    src = mf.synthesize_state_dict(manifest)
    src["channel_embed.weight"] = np.zeros((4, 256), np.float32)
    recorder = mf.RecordingDict(src)
    model, datasets = _build("satmae", "base", "mod", None, True)
    port_fm.port_fm_params("satmae", recorder, model, datasets)
    with pytest.raises(mf.CoverageError, match="channel_embed.weight"):
        mf.verify_coverage(manifest, src, recorder.accessed)


def test_missing_manifest_key_fails_loudly():
    """A release missing keys the manifest pins must be surfaced even when
    the port map tolerates the absence (optional-key branches)."""
    manifest = load_manifest("satmae_base")
    src = mf.synthesize_state_dict(manifest)
    del src["norm.weight"], src["norm.bias"]  # port's `if` branch skips it
    recorder = mf.RecordingDict(src)
    model, datasets = _build("satmae", "base", "mod", None, True)
    port_fm.port_fm_params("satmae", recorder, model, datasets)
    with pytest.raises(mf.CoverageError, match="norm.weight"):
        mf.verify_coverage(manifest, src, recorder.accessed)


def test_shape_drift_fails_loudly():
    manifest = load_manifest("dofa_base")
    src = mf.synthesize_state_dict(manifest)
    src["cls_token"] = np.zeros((1, 1, 512), np.float32)  # wrong width
    recorder = mf.RecordingDict(src)
    model, datasets = _build("dofa", "base", "shared", None, False)
    port_fm.port_fm_params("dofa", recorder, model, datasets)
    with pytest.raises(mf.CoverageError, match="cls_token"):
        mf.verify_coverage(manifest, src, recorder.accessed)
