"""Regenerate the committed released-checkpoint key manifests.

Writes ``tests/manifests/<name>.json`` for every manifest in
``maestro_tpu.port.manifests.ALL_MANIFESTS``.  The JSON fixtures are
committed so the day-one contract is diffable; this script only needs
re-running when a transcription is corrected.

Usage: python scripts/gen_manifests.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from maestro_tpu.port.manifests import ALL_MANIFESTS  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "tests" / "manifests"


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    for name, gen in ALL_MANIFESTS.items():
        m = gen()
        path = OUT / f"{name}.json"
        path.write_text(json.dumps(m, indent=1) + "\n")
        print(f"{path.name}: {len(m['keys'])} keys, "
              f"{len(m.get('skip', {}))} skip patterns")


if __name__ == "__main__":
    main()
