"""End-to-end golden parity: full torch MAE forward vs ported JAX forward.

Assembles a complete torch MAE whose modules follow the reference's exact op
semantics and state-dict layout (ssl/mim.py template forward, ssl/mae.py
module tree, layers/embed.py Patchify/Pixelify, vit-pytorch Transformer
naming), ports its seeded state dict through ``port_mae_state_dict``, and
checks that the FULL pretrain reconstruction and probe logits agree to fp32
tolerance.  This is the end-to-end correctness basis for porting the released
MAESTRO checkpoints (reference README.md:37-39): every inter-module wiring
step (patchify -> encodings -> group -> encoders -> inter trunk ->
enc_to_dec -> decoder encodings -> decoders -> pixelify -> heads) is covered,
not just per-module weight mapping.

Masking is disabled (mask_ratio=0, no structural masks) so both forwards are
deterministic: the JAX side still shuffles tokens internally, but every
module between shuffle and unmask is permutation-equivariant, so outputs
match.  Positional/date encodings are deterministic buffers shared by both
sides (their parity vs the reference is covered by test_posenc_parity.py);
the fusion group/ungroup layout comes from the same FusionPlan (covered by
test_fusion_plan.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402
from torch.nn import functional as F  # noqa: E402, N812

from maestro_tpu.conf import MaskConfig, ModelConfig  # noqa: E402
from maestro_tpu.models.mae import MAE_ARCHS, build_model  # noqa: E402
from maestro_tpu.ops.posenc import build_pos_encoding, encode_dates  # noqa: E402
from maestro_tpu.port.torch_port import (  # noqa: E402
    merge_into_template,
    port_mae_state_dict,
)
from maestro_tpu.utils.testing import make_synthetic_batch  # noqa: E402


# --------------------------------------------------------------------------
# torch reference modules (reference layers/embed.py + vit-pytorch layout)
# --------------------------------------------------------------------------
class TorchPatchifyBand(nn.Module):
    def __init__(self, chans, patch, dim):
        super().__init__()
        self.conv = nn.Conv2d(chans, dim, kernel_size=patch, stride=patch)
        self.norm = nn.GroupNorm(1, dim)

    def forward(self, x):  # [BD, C, H, W] -> [BD, L, E]
        y = self.norm(self.conv(x))
        return y.flatten(2).transpose(1, 2)


class TorchPatchify(nn.Module):
    """Reference Patchify: split band groups, concat on the date axis."""

    def __init__(self, band_groups, patch, dim):
        super().__init__()
        self.band_groups = band_groups
        self.patchify_bands = nn.ModuleList(
            [TorchPatchifyBand(c, patch, dim) for c in band_groups],
        )

    def forward(self, x):  # [B, D, C, H, W] -> [B, G*D, L, E]
        b, d = x.shape[:2]
        outs, off = [], 0
        for chans, mod in zip(self.band_groups, self.patchify_bands):
            xg = x[:, :, off : off + chans].flatten(0, 1)
            off += chans
            outs.append(mod(xg).unflatten(0, (b, d)))
        return torch.cat(outs, dim=1)


class TorchPixelifyBand(nn.Module):
    def __init__(self, dim, chans, patch):
        super().__init__()
        self.chans, self.patch = chans, patch
        self.conv = nn.Conv2d(dim, chans * patch * patch, kernel_size=1)

    def forward(self, x, grid):  # [BD, L, E] -> [BD, C, H, W]
        y = self.conv(x.transpose(1, 2).unflatten(2, (grid, grid)))
        # reference pixel shuffle order "(p1 p2 c) h w" (embed.py:154-160)
        y = y.unflatten(1, (self.patch, self.patch, self.chans))
        y = y.permute(0, 3, 4, 1, 5, 2)  # [BD, C, h, p1, w, p2]
        return y.reshape(y.shape[0], self.chans, grid * self.patch,
                         grid * self.patch)


class TorchPixelify(nn.Module):
    def __init__(self, band_groups, patch, dim):
        super().__init__()
        self.band_groups = band_groups
        self.pixelify_bands = nn.ModuleList(
            [TorchPixelifyBand(dim, c, patch) for c in band_groups],
        )

    def forward(self, x, grid):  # [B, G*D, L, E] -> [B, D, C, H, W]
        b, gd = x.shape[:2]
        g = len(self.band_groups)
        d = gd // g
        x = x.unflatten(1, (g, d))
        outs = [
            mod(x[:, i].flatten(0, 1), grid).unflatten(0, (b, d))
            for i, mod in enumerate(self.pixelify_bands)
        ]
        return torch.cat(outs, dim=2)


# The transformer trunk is the REAL vit-pytorch layout, vendored from the
# pinned library (see vendored_vit_pytorch.py) — the porter is validated
# against the genuine ``layers.{i}.0.to_qkv`` / ``net.0/1/4`` state-dict
# naming the released checkpoints use, not a hand mirror of it.
from vendored_vit_pytorch import Transformer as TorchTransformer  # noqa: E402


class TorchAttentiveReduce(nn.Module):
    def __init__(self, dim, heads=8):
        super().__init__()
        self.heads = heads
        self.norm = nn.LayerNorm(dim)
        self.norm_fc = nn.LayerNorm(dim)
        self.to_kv = nn.Linear(dim, dim * 2, bias=False)
        self.query = nn.Parameter(torch.randn(dim))

    def forward(self, x):
        out = self.norm(x)
        b, l, dim = x.shape
        dh = dim // self.heads
        q = self.query.reshape(self.heads, 1, dh)[None]
        k, v = self.to_kv(out).chunk(2, dim=-1)
        k = k.reshape(b, l, self.heads, dh).transpose(1, 2)
        v = v.reshape(b, l, self.heads, dh).transpose(1, 2)
        attn = ((q @ k.transpose(-1, -2)) * dh**-0.5).softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(b, dim)
        return self.norm_fc(out)


class TorchClassificationHead(nn.Module):
    def __init__(self, dim, num_classes):
        super().__init__()
        self.reduce = TorchAttentiveReduce(dim)
        self.linear = nn.Linear(dim, num_classes)

    def forward(self, x):  # [B, L, E] -> [B, K]
        return self.linear(self.reduce(x))


class TorchPixelifyHead(nn.Module):
    """Reference PixelifyHead (head.py:96-130): per-ref-position attentive
    date reduction + 1x1-conv pixelify with (p1 p2 c) feature order."""

    def __init__(self, dim, out_chans, patch_size):
        super().__init__()
        self.patch_size = patch_size
        self.reduce = TorchAttentiveReduce(dim)
        self.conv = nn.Conv2d(dim, out_chans * patch_size**2, kernel_size=1)

    def forward(self, x):  # [B, D, L, C] date-stacked ref-grid tokens
        b, d, l, c = x.shape
        y = x.permute(0, 2, 1, 3).reshape(b * l, d, c)
        y = self.reduce(y).reshape(b, l, -1)
        h = round(l**0.5)
        y = y.permute(0, 2, 1).reshape(b, -1, h, h)
        y = self.conv(y)
        p = self.patch_size
        k = y.shape[1] // (p * p)
        y = (
            y.reshape(b, p, p, k, h, h)
            .permute(0, 3, 4, 1, 5, 2)
            .reshape(b, k, h * p, h * p)
        )
        return y[:, None]  # [B, 1, K, H, W]


# --------------------------------------------------------------------------
# full torch MAE following the reference template forward (ssl/mim.py)
# --------------------------------------------------------------------------
class TorchMAE(nn.Module):
    def __init__(self, plan, arch, inter_depth, head_specs, ref_input=None):
        super().__init__()
        self.plan, self.arch, self.inter_depth = plan, arch, inter_depth
        embed_specs = {}
        for spec in plan.mod_specs.values():
            embed_specs.setdefault(spec.name_embed, spec)
        self.patch_embed = nn.ModuleDict({
            name: TorchPatchify(s.band_groups, s.patch_size, arch.embed_dim)
            for name, s in embed_specs.items()
        })
        self.embed_to_rec = nn.ModuleDict({
            name: TorchPixelify(s.band_groups, s.patch_size, arch.decoder_dim)
            for name, s in embed_specs.items()
        })
        self.mask_token = nn.ParameterDict({
            name: nn.Parameter(torch.randn(
                1, spec.len_bands, 1, 1, arch.decoder_dim))
            for name, spec in plan.mod_specs.items()
        })
        enc_depth = arch.depth - inter_depth
        self.encoder = nn.ModuleDict({
            enc: TorchTransformer(arch.embed_dim, enc_depth, arch.heads,
                                  arch.dim_head,
                                  arch.embed_dim * arch.mlp_ratio)
            for enc in plan.encoder_names
        })
        self.enc_to_dec = nn.ModuleDict({
            enc: nn.Linear(arch.embed_dim, arch.decoder_dim)
            for enc in plan.encoder_names
        })
        self.decoder = nn.ModuleDict({
            enc: TorchTransformer(
                arch.decoder_dim, arch.decoder_depth, arch.decoder_heads,
                arch.decoder_dim_head,
                # reference decoder-MLP-width quirk (mae.py:162)
                arch.embed_dim * arch.decoder_mlp_ratio)
            for enc in plan.encoder_names
        })
        if inter_depth:
            self.encoder_inter = TorchTransformer(
                arch.embed_dim, inter_depth, arch.heads, arch.dim_head,
                arch.embed_dim * arch.mlp_ratio)
        self.head_specs = head_specs
        self.ref_input = ref_input
        self.heads = nn.ModuleDict({
            hs.name: (
                TorchPixelifyHead(arch.embed_dim, hs.num_classes,
                                  hs.pixel_patch)
                if hs.type_target == "segment"
                else TorchClassificationHead(arch.embed_dim, hs.num_classes)
            )
            for hs in head_specs
        })
        # deterministic encoding buffers, same builders as the JAX side
        self._pos_enc, self._pos_dec = {}, {}
        for name, spec in plan.mod_specs.items():
            self._pos_enc[name] = torch.from_numpy(np.asarray(
                build_pos_encoding(plan.grid_pos_enc, spec.grid,
                                   arch.embed_dim, 8, fac=1.0),
            ).astype(np.float32))
            self._pos_dec[name] = torch.from_numpy(np.asarray(
                build_pos_encoding(plan.grid_pos_enc, spec.grid,
                                   arch.decoder_dim, 8),
            ).astype(np.float32))

    def _dates(self, batch, name, dim):
        spec = self.plan.mod_specs[name]
        enc = encode_dates(
            jnp.asarray(batch[f"{name}_dates"]), jnp.asarray(batch["ref_date"]),
            dim=dim, date_dim=8, fac_date_enc=1.0,
            num_tokens=spec.tokens_per_date, len_bands=spec.len_bands,
            dtype=jnp.float32,
        )
        return torch.from_numpy(np.asarray(enc))

    # torch-native group/ungroup (same static layout math as
    # FusionPlan.group/ungroup, specs/fusion.py:120-156) so the mirror stays
    # differentiable end-to-end for the trajectory-parity test
    def _group(self, x):
        plan, out = self.plan, {}
        for name, stream in plan.streams.items():
            parts = []
            for mod in stream.mods:
                xm = x[mod]
                if plan.batch_flattened:
                    parts.append(xm.flatten(0, 1))
                else:
                    parts.append(xm.flatten(1, 2))
            out[name] = parts[0] if len(parts) == 1 else torch.cat(parts, dim=1)
        return out

    def _ungroup(self, x):
        plan, out = self.plan, {}
        for name, stream in plan.streams.items():
            xs = x[name]
            for mod, off, length in zip(
                stream.mods, stream.seg_offsets, stream.seg_lens,
            ):
                spec = plan.mod_specs[mod]
                if plan.batch_flattened:
                    out[mod] = xs.unflatten(
                        0, (xs.shape[0] // spec.date_axis, spec.date_axis),
                    )
                else:
                    out[mod] = xs[:, off : off + length].unflatten(
                        1, (spec.date_axis, spec.tokens_per_date),
                    )
        return out

    def forward(self, batch, phase):
        plan = self.plan
        tokens = {}
        for name, spec in plan.mod_specs.items():
            t = self.patch_embed[spec.name_embed](
                torch.from_numpy(np.asarray(batch[name])))
            tokens[name] = (
                t + self._pos_enc[name]
                + self._dates(batch, name, self.arch.embed_dim)
            )
        streams = self._group(tokens)
        enc = {
            name: self.encoder[plan.streams[name].encoder](x)
            for name, x in streams.items()
        }
        if self.inter_depth:
            trunk = torch.cat([enc[n] for n in plan.streams], dim=1)
            trunk = self.encoder_inter(trunk)
            out, off = {}, 0
            for n in plan.streams:
                l = enc[n].shape[1]
                out[n] = trunk[:, off : off + l]
                off += l
            enc = out

        if phase != "pretrain":
            x = self._ungroup(enc)
            x_cat = torch.cat(
                [x[n].flatten(1, 2) for n in plan.mods], dim=1)
            x_ref = None
            if self.ref_input is not None:
                # reference mim.py:351-375: per-mod bilinear resize to the
                # ref grid, then date-stack across modalities
                big = plan.mod_specs[self.ref_input].grid
                parts = []
                for n in plan.mods:
                    t = x[n]
                    b, d_, l_, c_ = t.shape
                    h = plan.mod_specs[n].grid
                    tt = t.reshape(b * d_, h, h, c_).permute(0, 3, 1, 2)
                    tt = F.interpolate(tt, (big, big), mode="bilinear")
                    tt = tt.permute(0, 2, 3, 1).reshape(b, d_, big * big, c_)
                    parts.append(tt)
                x_ref = torch.cat(parts, dim=1)
            return {
                hs.name: self.heads[hs.name](
                    x_ref if hs.type_target == "segment" else x_cat,
                )
                for hs in self.head_specs
            }

        dec_in = {
            name: self.enc_to_dec[plan.streams[name].encoder](x)
            for name, x in enc.items()
        }
        full = self._ungroup(dec_in)
        for name in plan.mod_specs:
            full[name] = (
                full[name] + self._pos_dec[name]
                + self._dates(batch, name, self.arch.decoder_dim)
            )
        full = self._group(full)
        decoded = {
            name: self.decoder[plan.streams[name].encoder](x)
            for name, x in full.items()
        }
        x_mod = self._ungroup(decoded)
        rec = {}
        for name, spec in plan.mod_specs.items():
            rec[name] = self.embed_to_rec[spec.name_embed](
                x_mod[name], spec.grid)
        return rec


NO_MASK = MaskConfig(mask_ratio=0.0, mask_scale=0.0, mask_mod=None,
                     mask_bands=None, mask_dates=None, mask_loc=None)


@pytest.mark.parametrize("fusion_mode", ["shared", "monotemp", "mod", "group"])
def test_full_mae_forward_parity(datasets_treesat, fusion_mode):
    # the torch mirror is plan-driven, so the same golden check covers every
    # fusion layout (date-into-batch for shared/monotemp, date-into-sequence
    # for mod, group-concat for group); inter trunk where multi-stream
    inter_depth = 1 if fusion_mode in ("mod", "group") else 0
    cfg = ModelConfig(model_size="micro", fusion_mode=fusion_mode,
                      inter_depth=inter_depth)
    model, plan = build_model(datasets_treesat, NO_MASK, cfg, dtype=jnp.float32)

    torch.manual_seed(7)
    tmodel = TorchMAE(plan, MAE_ARCHS["micro"], cfg.inter_depth,
                      model.head_specs).eval()

    batch_np = make_synthetic_batch(datasets_treesat.dataset, 2, seed=3)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    key = jax.random.PRNGKey(0)
    params_pre = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, "pretrain"),
    )(batch)
    params_probe = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, "probe"),
    )(batch)
    # union: pretrain lacks heads, probe lacks decoder/mask-token params
    params = {"params": {**params_probe["params"], **params_pre["params"]}}
    sd = {f"model.{k}": v.detach().numpy() for k, v in
          tmodel.state_dict().items()}
    ported = port_mae_state_dict(sd, plan, model.head_specs)
    merged, _, missing = merge_into_template(ported, params)
    assert not missing, f"unported leaves: {missing[:10]}"

    with torch.no_grad():
        ref_rec = tmodel(batch_np, "pretrain")
        ref_logits = tmodel(batch_np, "probe")

    rec, mask_pix, _ = jax.jit(
        lambda m, b: model.apply(m, b, "pretrain", rngs={"mask": key}),
    )(merged, batch)
    for name in plan.mod_specs:
        got = np.asarray(rec[name], dtype=np.float32)
        want = ref_rec[name].numpy()
        np.testing.assert_allclose(got, want, atol=5e-4,
                                   err_msg=f"pretrain rec[{name}]")
        # masking disabled: nothing is masked
        assert not np.asarray(mask_pix[name]).any()

    logits = jax.jit(
        lambda m, b: model.apply(m, b, "probe", rngs={"mask": key}),
    )(merged, batch)
    for name in logits:
        np.testing.assert_allclose(
            np.asarray(logits[name], dtype=np.float32),
            ref_logits[name].numpy(), atol=5e-4,
            err_msg=f"probe logits[{name}]")


def test_full_segmentation_forward_parity(datasets_pastis):
    """Finetune segmentation logits agree with the torch reference mirror:
    bilinear token-grid resize to the ref grid (F.interpolate vs the
    jax.image resize-matrix form), date-stack across modalities, attentive
    per-position reduction, and (p1 p2 c) pixelify — the whole composition
    the ChunkedSegHead scan computes chunk-by-chunk."""
    cfg = ModelConfig(model_size="micro", fusion_mode="group", inter_depth=1)
    model, plan = build_model(datasets_pastis, NO_MASK, cfg, dtype=jnp.float32)

    torch.manual_seed(11)
    tmodel = TorchMAE(plan, MAE_ARCHS["micro"], cfg.inter_depth,
                      model.head_specs,
                      ref_input=datasets_pastis.dataset.ref_input).eval()

    batch_np = make_synthetic_batch(datasets_pastis.dataset, 2, seed=5)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda b: model.init({"params": key, "mask": key}, b, "finetune"),
    )(batch)
    sd = {f"model.{k}": v.detach().numpy()
          for k, v in tmodel.state_dict().items()}
    ported = port_mae_state_dict(sd, plan, model.head_specs)
    merged, _, missing = merge_into_template(ported, params)
    assert not missing, f"unported leaves: {missing[:10]}"

    with torch.no_grad():
        ref_logits = tmodel(batch_np, "finetune")
    logits = jax.jit(
        lambda m, b: model.apply(m, b, "finetune", rngs={"mask": key}),
    )(merged, batch)
    for hs in model.head_specs:
        np.testing.assert_allclose(
            np.asarray(logits[hs.name], dtype=np.float32),
            ref_logits[hs.name].numpy(), atol=5e-4,
            err_msg=f"finetune logits[{hs.name}] ({hs.type_target})")
