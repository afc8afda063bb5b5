"""Positional/date encoding parity vs reference semantics (torch reimpl).

SURVEY.md flags reshape_encoding's pool-with-interpolation-fallback
(reference layers/utils.py:103-125) as easy to get subtly wrong; this golden
test reimplements the reference ops in torch and compares.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from maestro_tpu.ops.posenc import (  # noqa: E402
    build_pos_encoding,
    encode_dates,
    posemb_sincos_2d,
)


def torch_posemb_sincos_2d(h, w, dim, date_dim, temperature=10000):
    y, x = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    omega = torch.arange((dim - date_dim) // 4) / ((dim - date_dim) // 4 - 1)
    omega = 1.0 / temperature**omega
    y = y[:, :, None] * omega[None, None, :]
    x = x[:, :, None] * omega[None, None, :]
    return torch.cat(
        [x.sin(), x.cos(), y.sin(), y.cos(), torch.zeros((h, w, date_dim))],
        dim=-1,
    ).float()


def torch_reshape_encoding(encoding, grid_size):
    """Reference layers/utils.py:103-125 semantics (5D path collapsed)."""
    encoding = encoding[None, None]  # [1, 1, H, W, C]
    if encoding.shape[-3] % grid_size:
        b = encoding.shape[0]
        resize = grid_size * round(encoding.shape[-3] / float(grid_size))
        e = encoding.flatten(0, 1).permute(0, 3, 1, 2)
        e = F.interpolate(e, (resize,) * 2, mode="bilinear")
        encoding = e.permute(0, 2, 3, 1)[None]
    encoding = encoding.unflatten(-3, (grid_size, -1))
    encoding = encoding.unflatten(-2, (grid_size, -1))
    return encoding.mean(dim=(-2, -4)).flatten(-3, -2)[0, 0]


def test_posemb_sincos_parity():
    mine = posemb_sincos_2d(16, 16, 64, 8)
    ref = torch_posemb_sincos_2d(16, 16, 64, 8).numpy()
    np.testing.assert_allclose(mine, ref, atol=1e-6)


@pytest.mark.parametrize("grid", [3, 4, 8, 15])  # divisible and not
def test_pool_encoding_parity(grid):
    gp, dim, date_dim = 96, 64, 8
    shared = torch_posemb_sincos_2d(gp, gp, dim, date_dim)
    ref = torch_reshape_encoding(shared, grid).numpy()
    mine = build_pos_encoding(gp, grid, dim, date_dim)
    # bilinear half-pixel resize matches torch align_corners=False
    np.testing.assert_allclose(mine, ref.reshape(grid * grid, dim), atol=2e-5)


def test_encode_dates_reference_semantics():
    """Channel layout: [zeros | diff x (date_dim-4) | sin/cos doy | sin/cos hr]."""
    import jax.numpy as jnp

    dates = np.array([[[2020, 100, 12], [2021, 200, 6]]], dtype=np.int16)
    ref_date = np.array([[[2020, 150, 0]]], dtype=np.int16)
    dim, date_dim, L, G = 16, 8, 4, 1
    enc = np.asarray(encode_dates(
        jnp.asarray(dates), jnp.asarray(ref_date), dim=dim, date_dim=date_dim,
        fac_date_enc=1.0, num_tokens=L, len_bands=G,
    ))
    assert enc.shape == (1, 2, L, dim)
    np.testing.assert_array_equal(enc[..., : dim - date_dim], 0.0)
    # diff years for date 0, in fp32 exactly as the reference computes it:
    # (year + doy) - (year_ref + doy_ref) — note the fp32 cancellation with
    # year ~2020 is part of the reference semantics (layers/utils.py:147)
    diff0 = (
        np.float32(2020 + np.float32(100 / 365.25))
        - np.float32(2020 + np.float32(150 / 365.25))
    )
    np.testing.assert_allclose(enc[0, 0, 0, dim - date_dim], diff0, atol=1e-4)
    # diff broadcast over date_dim - 4 channels
    np.testing.assert_allclose(
        enc[0, 0, :, dim - date_dim : dim - 4],
        np.full((L, date_dim - 4), diff0), atol=1e-4,
    )
    doy = 2 * np.pi * 100 / 365.25
    np.testing.assert_allclose(enc[0, 0, 0, dim - 4], np.sin(doy), atol=1e-6)
    np.testing.assert_allclose(enc[0, 0, 0, dim - 3], np.cos(doy), atol=1e-6)
    hour = 2 * np.pi * 12 / 24
    np.testing.assert_allclose(enc[0, 0, 0, dim - 2], np.sin(hour), atol=1e-6)
    np.testing.assert_allclose(enc[0, 0, 0, dim - 1], np.cos(hour), atol=1e-6)
    # constant across token positions
    np.testing.assert_array_equal(enc[0, :, 0], enc[0, :, -1])
