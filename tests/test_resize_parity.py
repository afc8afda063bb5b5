"""Resize-mode parity vs torch F.interpolate (the reference's resizer).

Every mode the config accepts (conf/core.py interpolate) must match torch
bit-for-bit-ish: nearest uses torch's legacy floor mapping (jax rounds
half-pixel centers), bilinear must not antialias on downsample, bicubic must
use torch's A=-0.75 kernel (jax's cubic is A=-0.5).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from maestro_tpu.ops.resize import resize_spatial, resize_token_grid  # noqa: E402

SIZES = [(6, 16), (300, 512), (16, 6), (37, 16)]


@pytest.mark.parametrize("mode", ["nearest", "bilinear", "bicubic"])
@pytest.mark.parametrize("sizes", SIZES)
def test_resize_spatial_matches_torch(mode, sizes):
    i, o = sizes
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, i, i)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), (o, o), mode=mode).numpy()
    got = np.asarray(resize_spatial(jnp.asarray(x), o, mode))
    atol = 0.0 if mode == "nearest" else 1e-4
    np.testing.assert_allclose(got, want, atol=atol,
                               err_msg=f"{mode} {i}->{o}")


def test_resize_token_grid_matches_torch():
    rng = np.random.default_rng(1)
    g, G, c = 8, 10, 32
    x = rng.normal(size=(2, 5, g * g, c)).astype(np.float32)
    t = torch.from_numpy(x.reshape(2 * 5, g, g, c)).permute(0, 3, 1, 2)
    want = (
        F.interpolate(t, (G, G), mode="bilinear")
        .permute(0, 2, 3, 1).reshape(2, 5, G * G, c).numpy()
    )
    got = np.asarray(resize_token_grid(jnp.asarray(x), G, "bilinear"))
    np.testing.assert_allclose(got, want, atol=1e-5)
