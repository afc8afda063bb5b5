"""Run bench.py for every training phase and archive one JSON artifact.

VERDICT r2 item 7: ``BENCH_r*.json`` (written by the round driver) captures
the pretrain phase only, so probe/finetune regressions were only visible in
prose.  This script runs the same benchmark per phase and writes
``BENCH_PHASES.json`` at the repo root — committed each round so the
supervised path is regression-checked mechanically alongside pretrain.

Usage:
    python scripts/bench_phases.py [pretrain probe finetune]

Each phase runs in a fresh subprocess (bench.py reads BENCH_PHASE at import
and the remote device tunnel is happier with one client at a time).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_phase(phase: str) -> dict:
    env = dict(os.environ, BENCH_PHASE=phase)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    line = ""
    for cand in reversed(proc.stdout.strip().splitlines()):
        if cand.startswith("{"):
            line = cand
            break
    if not line:
        return {"phase": phase, "error": (proc.stderr or "no output")[-2000:]}
    return json.loads(line)


def main() -> None:
    phases = sys.argv[1:] or ["pretrain", "probe", "finetune"]
    results = {}
    for phase in phases:
        t0 = time.time()
        results[phase] = run_phase(phase)
        print(f"{phase}: done in {time.time() - t0:.0f}s", file=sys.stderr)
    out = os.path.join(REPO, "BENCH_PHASES.json")
    existing = {}
    if os.path.exists(out):  # partial runs update, not clobber
        with open(out) as f:
            existing = json.load(f)
    existing.update(results)
    with open(out, "w") as f:
        json.dump(existing, f, indent=2)
    print(json.dumps(existing))


if __name__ == "__main__":
    main()
