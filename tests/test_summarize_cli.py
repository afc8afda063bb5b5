"""Config-summary CLI: token layout + param counts without allocation."""

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_summarize_cli(capsys):
    sys.path.insert(0, str(REPO))
    spec = importlib.util.spec_from_file_location(
        "summarize_cli", REPO / "scripts" / "summarize.py",
    )
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)
    cli.main([
        "datasets.name_dataset=flair", "model.model_size=micro",
        "model.fusion_mode=group", "model.inter_depth=1",
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["params_total"] > 0
    assert out["tokens_per_sample"] == sum(
        s["seq_len"] * s["batch_factor"] for s in out["streams"].values()
    )
    # FLAIR group-mode fusion: aerial + dem + s2 + s1 streams
    assert set(out["streams"]) == {"aerial", "dem", "s2", "s1"}
    assert out["params_mib_fp32"] > 0
