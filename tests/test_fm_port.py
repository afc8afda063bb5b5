"""FM porter parity: timm-style block and CROMA ViT vs ported JAX modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from maestro_tpu.baselines.backbone import EncoderBlock  # noqa: E402
from maestro_tpu.baselines.croma import CromaViT, get_2d_alibi  # noqa: E402
from maestro_tpu.port.fm_port import (  # noqa: E402
    map_timm_block,
    port_croma,
    rename_dinov2_backbone,
)

DIM, HEADS = 32, 4


class TimmStyleBlock(nn.Module):
    """norm1 -> attn(qkv fused, bias) -> proj; norm2 -> mlp(fc1, fc2)."""

    def __init__(self):
        super().__init__()
        self.norm1 = nn.LayerNorm(DIM, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(DIM, DIM * 3, bias=True)
        self.attn.proj = nn.Linear(DIM, DIM)
        self.norm2 = nn.LayerNorm(DIM, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(DIM, DIM * 4)
        self.mlp.fc2 = nn.Linear(DIM * 4, DIM)

    def forward(self, x):
        y = self.norm1(x)
        qkv = self.attn.qkv(y).chunk(3, dim=-1)
        b, l, _ = x.shape
        dh = DIM // HEADS
        q, k, v = (t.reshape(b, l, HEADS, dh).transpose(1, 2) for t in qkv)
        attn = ((q @ k.transpose(-1, -2)) * dh**-0.5).softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, l, DIM)
        x = x + self.attn.proj(out)
        y = self.norm2(x)
        return x + self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(y)))


def test_timm_block_parity():
    torch.manual_seed(0)
    tblock = TimmStyleBlock().eval()
    x = torch.randn(2, 9, DIM)
    with torch.no_grad():
        ref = tblock(x).numpy()
    src = {k: v.numpy() for k, v in tblock.state_dict().items()}
    params = {"params": map_timm_block(src, "")}
    jblock = EncoderBlock(DIM, HEADS, 4.0, dtype=jnp.float32)
    out = jblock.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


class CromaTorchViT(nn.Module):
    """Reference croma.py ViT/BaseTransformer layout for porting parity."""

    def __init__(self, depth=2, in_channels=2):
        super().__init__()
        p = 8
        self.linear_input = nn.Linear(p * p * in_channels, DIM)
        self.transformer = nn.Module()
        self.transformer.layers = nn.ModuleList()
        for _ in range(depth):
            attn = nn.Module()
            attn.input_norm = nn.LayerNorm(DIM)
            attn.to_qkv = nn.Linear(DIM, DIM * 3, bias=False)
            attn.to_out = nn.Linear(DIM, DIM)
            ffn = nn.Module()
            ffn.input_norm = nn.LayerNorm(DIM)
            ffn.net = nn.Sequential(
                nn.Linear(DIM, DIM * 4), nn.GELU(), nn.Dropout(0.0),
                nn.Linear(DIM * 4, DIM),
            )
            self.transformer.layers.append(nn.ModuleList([attn, ffn]))
        self.transformer.norm_out = nn.LayerNorm(DIM)

    def forward(self, imgs, bias):
        p = 8
        b, c, hh, ww = imgs.shape
        g = hh // p
        x = imgs.reshape(b, c, g, p, g, p).permute(0, 2, 4, 1, 3, 5)
        x = x.reshape(b, g * g, c * p * p)
        x = self.linear_input(x)
        for attn, ffn in self.transformer.layers:
            y = attn.input_norm(x)
            qkv = attn.to_qkv(y).chunk(3, dim=-1)
            bsz, l, _ = x.shape
            dh = DIM // HEADS
            q, k, v = (t.reshape(bsz, l, HEADS, dh).transpose(1, 2) for t in qkv)
            logits = (q @ k.transpose(-1, -2)) * dh**-0.5 + bias
            out = (logits.softmax(dim=-1) @ v).transpose(1, 2).reshape(bsz, l, DIM)
            x = x + attn.to_out(out)
            x = x + ffn.net(ffn.input_norm(x))
        return self.transformer.norm_out(x)


def test_croma_vit_parity():
    torch.manual_seed(1)
    tvit = CromaTorchViT().eval()
    imgs = torch.randn(2, 2, 24, 24)
    bias_np = get_2d_alibi(HEADS, 3)
    with torch.no_grad():
        ref = tvit(imgs, torch.from_numpy(bias_np)).numpy()

    src = {"s1_encoder": {k: v.numpy() for k, v in tvit.state_dict().items()}}
    ported = port_croma(src)
    tree = ported["params"]["s1_encoder"]
    jvit = CromaViT(DIM, 2, HEADS, patch_size=8, dtype=jnp.float32)
    out = jvit.apply({"params": tree}, jnp.asarray(imgs.numpy()),
                     jnp.asarray(bias_np))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


def test_rename_dinov2_backbone_keys():
    src = {
        "backbone.cls_token": np.zeros((1, 1, 8)),
        "backbone.pos_embed": np.zeros((1, 5, 8)),
        "backbone.patch_embed.proj.weight": np.zeros((8, 3, 2, 2)),
        "backbone.blocks.0.attn.qkv.weight": np.arange(24 * 8).reshape(24, 8),
        "backbone.blocks.0.ls1.gamma": np.ones(8),
        "backbone.norm.weight": np.ones(8),
        "unrelated.key": np.zeros(1),
    }
    out = rename_dinov2_backbone(src)
    assert "embeddings.cls_token" in out
    assert "embeddings.position_embeddings" in out
    assert "embeddings.patch_embeddings.projection.weight" in out
    assert "encoder.layer.0.attention.attention.query.weight" in out
    assert out["encoder.layer.0.attention.attention.query.weight"].shape == (8, 8)
    assert "encoder.layer.0.layer_scale1.lambda1" in out
    assert "layernorm.weight" in out
    assert not any(k.startswith("unrelated") for k in out)
