"""Run bench.py for every training phase and archive one JSON artifact.

VERDICT r2 item 7: ``BENCH_r*.json`` (written by the round driver) captures
the pretrain phase only, so probe/finetune regressions were only visible in
prose.  This script runs the same benchmark per phase and writes
``BENCH_PHASES.json`` at the repo root — plus (r5, VERDICT r4 item 5) a
round-versioned ``BENCH_PHASES_r0N.json`` snapshot including the eval-cache
microbench, so round-over-round regressions diff mechanically instead of
through the git history of one mutable file.  The round index is inferred
from the driver's existing ``BENCH_r0N.json`` artifacts (max + 1, since the
driver writes its file at round end); override with ``BENCH_ROUND=N``.

Usage:
    python scripts/bench_phases.py [pretrain probe finetune eval_cache]

Each phase runs in a fresh subprocess (bench.py reads BENCH_PHASE at import
and the remote device tunnel is happier with one client at a time).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def current_round() -> int:
    if os.environ.get("BENCH_ROUND"):
        return int(os.environ["BENCH_ROUND"])
    done = [
        int(m.group(1))
        for f in os.listdir(REPO)
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", f))
    ]
    return (max(done) + 1) if done else 1


def run_eval_cache() -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/bench_eval_cache.py")],
        capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    for cand in reversed(proc.stdout.strip().splitlines()):
        if cand.startswith("{"):
            return json.loads(cand)
    return {"phase": "eval_cache",
            "error": (proc.stderr or "no output")[-2000:]}


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
    phases = sys.argv[1:] or ["pretrain", "probe", "finetune", "eval_cache"]
    results = {}
    for phase in phases:
        t0 = time.time()
        if phase == "eval_cache":
            results[phase] = run_eval_cache()
        else:
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
    # round-versioned snapshot: same content, immutable per round
    versioned = os.path.join(REPO, f"BENCH_PHASES_r{current_round():02d}.json")
    with open(versioned, "w") as f:
        json.dump(existing, f, indent=2)
    print(json.dumps(existing))


if __name__ == "__main__":
    main()
