"""A/B microbenchmark: patchify+embed strategies on the real chip.

The step profile's remaining "copies" bucket (docs/PERFORMANCE.md) is
dominated by the patchify layout permute ([B,D,C,h,p,w,p] transpose) that
precedes the patch-embedding matmul.  Three candidate formulations of the
same computation (fwd + bwd, bf16):

  a) transpose:  block-reshape -> transpose -> reshape -> [.., CPP] @ [CPP, E]
     (current ops/patch.py + nn.Dense)
  b) dotgeneral: lax.dot_general contracting (c, ph, pw) directly against a
     [C, p, p, E] kernel — no explicit transpose; XLA picks layouts
  c) conv:       lax.conv_general_dilated stride=p kernel=p (the literal
     space-to-depth conv XLA pattern-matches)

Run: python scripts/bench_patchify.py   (uses the default platform = TPU)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax import lax

B, D, C, H, W, P, E = 48, 1, 4, 512, 512, 16, 768
DTYPE = jnp.bfloat16


def patchify_transpose(x, k):
    b, d, c, hh, ww = x.shape
    h, w = hh // P, ww // P
    x = x.reshape(b, d, c, h, P, w, P)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6)
    x = x.reshape(b, d, h * w, c * P * P)
    return x @ k.reshape(c * P * P, E)


def patchify_dotgeneral(x, k):
    b, d, c, hh, ww = x.shape
    h, w = hh // P, ww // P
    x = x.reshape(b, d, c, h, P, w, P)
    # contract (c, ph, pw) = lhs dims (2, 4, 6) with kernel [C, p, p, E]
    y = lax.dot_general(
        x, k,
        dimension_numbers=(((2, 4, 6), (0, 1, 2)), ((), ())),
        preferred_element_type=DTYPE,
    )  # [b, d, h, w, E]
    return y.reshape(b, d, h * w, E)


def patchify_conv(x, k):
    b, d, c, hh, ww = x.shape
    # conv wants [N, C, H, W]; kernel [E, C, p, p]
    y = lax.conv_general_dilated(
        x.reshape(b * d, c, hh, ww),
        k.transpose(3, 0, 1, 2),
        window_strides=(P, P),
        padding="VALID",
    )  # [b*d, E, h, w]
    h, w = hh // P, ww // P
    return y.reshape(b, d, E, h * w).transpose(0, 1, 3, 2)


def patchify_conv_nhwc(x, k):
    b, d, c, hh, ww = x.shape
    # NHWC output: the [h*w, E] token layout falls out without a transpose
    y = lax.conv_general_dilated(
        x.reshape(b * d, c, hh, ww),
        k.transpose(3, 0, 1, 2),
        window_strides=(P, P),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NHWC"),
    )  # [b*d, h, w, E]
    h, w = hh // P, ww // P
    return y.reshape(b, d, h * w, E)


def bench(name, fn):
    k = jax.random.normal(jax.random.PRNGKey(0), (C, P, P, E), DTYPE) * 0.02
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, D, C, H, W), jnp.float32)
    x1 = jax.random.normal(jax.random.PRNGKey(2), (B, D, C, H, W), jnp.float32)

    def loss(k, x, s):
        return jnp.sum(fn((x * s).astype(DTYPE), k).astype(jnp.float32) ** 2)

    vg = jax.value_and_grad(loss)

    # Measurement-protocol hazards (docs/PERFORMANCE.md):
    #  - the axon tunnel memoizes executions over identical inputs, so a
    #    changing fp32 scalar `s` multiplies the input each call; the step is
    #    multiplicative (×1.01) so the *bf16-cast* operand bits change too
    #    (an additive 1e-6 rounds away in bf16 → fake 0.05 ms iterations);
    #  - `g` must feed an output or XLA dead-code-eliminates the whole
    #    backward pass.
    @jax.jit
    def step(k, x, s, acc):
        v, g = vg(k, x, s)
        return s * jnp.float32(1.01), acc + jnp.sum(jnp.abs(g)), v

    s, acc = jnp.float32(1.0), jnp.float32(0.0)
    s, acc, v0 = step(k, x0, s, acc)
    s, acc, v1 = step(k, x1, s, acc)
    assert float(v1) != float(v0), "loss must change between iterations"
    jax.block_until_ready(acc)
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        s, acc, v = step(k, x0 if i % 2 == 0 else x1, s, acc)
    jax.block_until_ready((s, acc, v))
    dt = (time.perf_counter() - t0) / n * 1e3
    v = float(v0)
    print(f"{name:12s}  {dt:7.3f} ms/iter   loss={v:.1f}")
    return dt, v


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    r = {}
    for name, fn in [
        ("transpose", patchify_transpose),
        ("dotgeneral", patchify_dotgeneral),
        ("conv", patchify_conv),
        ("conv_nhwc", patchify_conv_nhwc),
    ]:
        r[name] = bench(name, fn)
    vals = {v for _, v in r.values()}
    print("losses agree:", max(vals) - min(vals) < 1e-2 * max(vals))
