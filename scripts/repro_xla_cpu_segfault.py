"""Minimized-repro candidate for the XLA:CPU live-executable segfault.

Observed failure (full suite, pre-workaround): with every test module's
jitted executables kept alive for the whole pytest session, XLA:CPU
compilation of the LARGEST program (the multislice-FSDP train step on an
8-virtual-device mesh) segfaults deterministically inside
``backend_compile_and_load`` — three consecutive full-suite runs crashed at
the same test, while any roughly-half-suite subset passed.  The workaround
(`tests/conftest.py::_clear_jax_caches_between_modules`) bounds the live
population by calling ``jax.clear_caches()`` between modules and has kept
the suite green since r3.

This script recreates the suspected trigger shape in isolation: accumulate
hundreds of live distinct executables (mixed small/sharded), then compile
one large FSDP-style sharded train step.  Exit code 0 = no crash (candidate
does NOT reproduce — keep the full-suite repro as the authoritative one);
a SIGSEGV reproduces the bug minimally.

Usage:  python scripts/repro_xla_cpu_segfault.py [n_small=600]

Issue text for upstream (jax-ml/jax), should the minimized form reproduce
or the workaround regress:

    Title: XLA:CPU segfault in backend_compile_and_load with many live
    executables (8 virtual devices)
    Body: Under --xla_force_host_platform_device_count=8, a process that
    holds several hundred live compiled executables (pytest session
    importing ~50 modules of jitted train steps; mix of single-device and
    pjit-sharded programs, fp32, total retained executables O(500))
    deterministically segfaults when compiling one more LARGE sharded
    program (a ViT train step with FSDP NamedShardings over data axis,
    ~10^4 HLO ops) inside backend_compile_and_load. Any ~half-size subset
    passes; jax.clear_caches() between modules avoids it. jax 0.8.x,
    CPU-only, Linux x86-64. Repro rate 3/3 on the full population.
"""

from __future__ import annotations

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") +
    " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    devs = jax.devices()
    mesh = Mesh(jax.experimental.mesh_utils.create_device_mesh((4, 2)),
                ("data", "model"))
    keep = []

    # phase 1: hundreds of live distinct executables (the pytest-session
    # population): alternating unsharded and mesh-sharded programs
    for i in range(n_small):
        n = 32 + 2 * (i % 24)  # even: divisible by the 2-way model axis

        def f(x, w, i=i):
            return jnp.tanh(x @ w).sum() * (i + 1)

        if i % 3 == 0:
            x = jax.device_put(
                jnp.ones((8, n)), NamedSharding(mesh, P("data", None)))
            w = jax.device_put(
                jnp.ones((n, n)), NamedSharding(mesh, P(None, "model")))
            g = jax.jit(f)
        else:
            x, w = jnp.ones((8, n)), jnp.ones((n, n))
            g = jax.jit(f, device=devs[i % len(devs)])
        g(x, w)
        keep.append(g)
        if i % 100 == 0:
            print(f"live executables: {i}", flush=True)

    # phase 2: one large FSDP-style sharded train step (the crash site)
    print("compiling the large sharded program ...", flush=True)
    d, layers = 512, 12

    def step(params, x):
        def body(h, w):
            return jnp.tanh(h @ w), None

        h, _ = jax.lax.scan(body, x, params)
        return (h * h).mean()

    params = jax.device_put(
        jnp.ones((layers, d, d)),
        NamedSharding(mesh, P(None, "data", "model")),  # FSDP-ish shards
    )
    x = jax.device_put(jnp.ones((64, d)), NamedSharding(mesh, P("data", None)))
    loss = jax.jit(jax.grad(step))(params, x)
    jax.block_until_ready(loss)
    print(f"no crash with {len(keep)} live executables - candidate does "
          "NOT reproduce; the full-suite repro remains authoritative")


if __name__ == "__main__":
    main()
