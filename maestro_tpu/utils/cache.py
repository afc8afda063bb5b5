"""Persistent-XLA-cache directory, scoped per host CPU microarchitecture.

XLA:CPU's compilation cache stores AOT-compiled executables that embed the
compiling host's CPU feature set.  Loading them on a host with a different
microarch logs ``cpu_aot_loader`` feature-mismatch errors and can outright
abort the process (SIGILL-class, observed as ``Fatal Python error:
Aborted`` mid-suite) when a cached executable uses instructions this host
lacks.  Sandbox/CI VMs migrate between microarchs across sessions while
``~/.cache`` persists, so the shared default directory must be
fingerprinted: each distinct CPU feature set gets its own subdirectory and
only ever loads executables it compiled itself.

Used by tests/conftest.py, bench.py and __graft_entry__.dryrun_multichip —
the three places that turn the persistent cache on.  ``MAESTRO_JAX_CACHE_DIR``
still overrides the base; the fingerprint subdirectory applies either way.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _cpu_fingerprint() -> str:
    """Stable 8-hex tag of this host's CPU feature set + XLA build.

    The jax/jaxlib versions are part of the key because XLA:CPU embeds
    compiler PSEUDO-features (``+prefer-no-scatter``/``+prefer-no-gather``)
    in its AOT artifacts that change with the jaxlib build, not the
    hardware — an artifact written by one build logs cpu_aot_loader
    mismatch errors (and can abort) under another even on the identical
    CPU, which /proc/cpuinfo flags alone cannot separate.
    """
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86: "flags"; arm64: "Features"
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    if not flags:  # non-procfs platforms: coarser but still separating
        flags = f"{platform.machine()} {platform.processor()}"
    try:
        import jax
        import jaxlib

        flags += f" jax={jax.__version__} jaxlib={jaxlib.__version__}"
    except Exception:  # noqa: BLE001 - version probe is best-effort
        pass
    return hashlib.sha1(flags.encode()).hexdigest()[:8]


def jax_cache_dir() -> str:
    base = os.environ.get(
        "MAESTRO_JAX_CACHE_DIR",
        os.path.expanduser("~/.cache/maestro_tpu_jax"),
    )
    return os.path.join(base, f"cpu-{_cpu_fingerprint()}")
