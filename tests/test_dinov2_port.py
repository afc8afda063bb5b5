"""Golden parity: HF transformers DINOv2 vs ported JAX adapter components."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers import Dinov2Config  # noqa: E402
from transformers.models.dinov2.modeling_dinov2 import (  # noqa: E402
    Dinov2Embeddings,
    Dinov2Encoder,
)

from maestro_tpu.baselines.dinov2 import ViTBackboneEncoderOnly  # noqa: E402
from maestro_tpu.port.dinov2_port import (  # noqa: E402
    conv_to_patch_dense,
    map_hf_dinov2_encoder,
    pad_patch_kernel,
)

CFG = dict(
    hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=256, patch_size=14, image_size=56, num_channels=3,
    attn_implementation="eager",
)


def test_encoder_parity():
    torch.manual_seed(0)
    cfg = Dinov2Config(**CFG)
    enc = Dinov2Encoder(cfg).eval()
    x = torch.randn(2, 17, 64)
    with torch.no_grad():
        ref = enc(x)["last_hidden_state"].numpy()

    src = {k: v.numpy() for k, v in enc.state_dict().items()}
    params = {"params": map_hf_dinov2_encoder(src, 2, prefix="")}
    jenc = ViTBackboneEncoderOnly(dim=64, depth=2, heads=2, mlp_ratio=4.0,
                                  layerscale=True, dtype=jnp.float32)
    out = jenc.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_patch_embed_parity():
    torch.manual_seed(1)
    cfg = Dinov2Config(**CFG)
    emb = Dinov2Embeddings(cfg).eval()
    x = torch.randn(2, 3, 56, 56)
    with torch.no_grad():
        ref = emb(x).numpy()  # [B, 1+L, C] with cls + pos added

    src = {k: v.numpy() for k, v in emb.state_dict().items()}
    kernel = conv_to_patch_dense(src["patch_embeddings.projection.weight"])
    bias = src["patch_embeddings.projection.bias"]

    xn = x.numpy()
    b, c, hh, _ = xn.shape
    p, grid = 14, 4
    xp = xn.reshape(b, c, grid, p, grid, p).transpose(0, 2, 4, 1, 3, 5)
    xp = xp.reshape(b, grid * grid, c * p * p)
    tokens = xp @ kernel + bias
    cls = np.broadcast_to(src["cls_token"], (b, 1, 64))
    tokens = np.concatenate([cls, tokens], axis=1)
    tokens = tokens + src["position_embeddings"]  # grid matches: no interp
    np.testing.assert_allclose(tokens, ref, atol=2e-5)


def test_pad_patch_kernel():
    w = np.random.default_rng(0).normal(size=(8, 3, 14, 14)).astype(np.float32)
    padded = pad_patch_kernel(w, 5, std=0.01)
    assert padded.shape == (8, 5, 14, 14)
    np.testing.assert_array_equal(padded[:, :3], w)
    assert abs(float(padded[:, 3:].std()) - 0.01) < 0.005
    # truncation case (fewer bands than RGB)
    np.testing.assert_array_equal(pad_patch_kernel(w, 2), w[:, :2])


def test_pos_embed_interpolation_matches_torch_bicubic():
    """interpolate_pos_embed == fp32 F.interpolate bicubic (reference
    baselines/utils.py:184-189); jax.image's cubic kernel (A=-0.5) differs
    from torch's (A=-0.75) by ~10%, so the torch matrix is built exactly."""
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    import jax.numpy as jnp

    from maestro_tpu.baselines.backbone import interpolate_pos_embed

    rng = np.random.default_rng(0)
    pos = rng.normal(size=(1, 37 * 37 + 1, 16)).astype(np.float32)
    got = np.asarray(interpolate_pos_embed(jnp.asarray(pos), 24, has_cls=True))
    pp = torch.from_numpy(
        pos[:, 1:].reshape(1, 37, 37, 16).transpose(0, 3, 1, 2))
    want = (
        F.interpolate(pp, (24, 24), mode="bicubic", align_corners=False)
        .numpy().transpose(0, 2, 3, 1).reshape(1, 576, 16)
    )
    np.testing.assert_allclose(got[:, 1:], want, atol=1e-4)
    np.testing.assert_array_equal(got[:, :1], pos[:, :1])
