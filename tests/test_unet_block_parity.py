"""Block-level numerical parity of the UNet importer against plain-torch
re-statements of the diffusers modules it imports from.

diffusers itself is not installed (zero-egress image), so the torch side
re-states ResnetBlock2D / Transformer2DModel(BasicTransformerBlock + GEGLU)
exactly as diffusers computes them, with diffusers state_dict naming; the
flax side goes through utils/hf's real importer helpers. This closes the
'importers are structure-only' gap at the block level — the full UNet is a
composition of exactly these blocks (models/unet.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from flash_diffusion_tpu.models.layers import ResnetBlock2D, SpatialTransformer
from flash_diffusion_tpu.utils.hf import _resnet, _spatial_transformer


class TorchResnetBlock2D(tnn.Module):
    """diffusers ResnetBlock2D (output_scale_factor=1, default eps)."""

    def __init__(self, in_ch, out_ch, temb_ch, groups=8):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, in_ch, eps=1e-5)
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb_ch, out_ch)
        self.norm2 = tnn.GroupNorm(groups, out_ch, eps=1e-5)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (
            tnn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None
        )

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        s = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return s + h


class TorchGEGLU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner * 2)

    def forward(self, x):
        x, gate = self.proj(x).chunk(2, dim=-1)
        return x * F.gelu(gate)  # exact gelu


class TorchBasicTransformerBlock(tnn.Module):
    def __init__(self, dim, heads, cross_dim):
        super().__init__()
        d = dim // heads
        self.heads, self.d = heads, d
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = tnn.ModuleDict(
            dict(
                to_q=tnn.Linear(dim, dim, bias=False),
                to_k=tnn.Linear(dim, dim, bias=False),
                to_v=tnn.Linear(dim, dim, bias=False),
                to_out=tnn.Linear(dim, dim),
            )
        )
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = tnn.ModuleDict(
            dict(
                to_q=tnn.Linear(dim, dim, bias=False),
                to_k=tnn.Linear(cross_dim, dim, bias=False),
                to_v=tnn.Linear(cross_dim, dim, bias=False),
                to_out=tnn.Linear(dim, dim),
            )
        )
        self.norm3 = tnn.LayerNorm(dim)
        self.ff_geglu = TorchGEGLU(dim, dim * 4)
        self.ff_out = tnn.Linear(dim * 4, dim)

    def _attn(self, mod, x, ctx):
        b, s, _ = x.shape
        q = mod["to_q"](x).view(b, s, self.heads, self.d).transpose(1, 2)
        k = mod["to_k"](ctx).view(b, ctx.shape[1], self.heads, self.d).transpose(1, 2)
        v = mod["to_v"](ctx).view(b, ctx.shape[1], self.heads, self.d).transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(self.d), dim=-1)
        out = (a @ v).transpose(1, 2).reshape(b, s, -1)
        return mod["to_out"](out)

    def forward(self, x, ctx):
        x = x + self._attn(self.attn1, self.norm1(x), self.norm1(x))
        x = x + self._attn(self.attn2, self.norm2(x), ctx)
        return x + self.ff_out(self.ff_geglu(self.norm3(x)))


def _resnet_sd(mod, prefix):
    sd = {}
    for name, p in mod.state_dict().items():
        sd[f"{prefix}.{name}"] = p.numpy()
    return sd


def test_resnet_block_import_parity():
    torch.manual_seed(0)
    in_ch, out_ch, temb_ch = 8, 16, 12
    tmod = TorchResnetBlock2D(in_ch, out_ch, temb_ch).eval()
    sd = _resnet_sd(tmod, "blk")

    params = _resnet(sd, "blk")
    fmod = ResnetBlock2D(out_channels=out_ch, time_emb_dim=temb_ch, groups=8)

    x = torch.randn(2, in_ch, 6, 6)
    temb = torch.randn(2, temb_ch)
    ref = tmod(x, temb).detach().numpy()
    out = fmod.apply(
        {"params": params},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(temb.numpy()),
    )
    np.testing.assert_allclose(
        np.array(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4
    )


def test_spatial_transformer_import_parity():
    torch.manual_seed(1)
    dim, heads, cross_dim = 16, 2, 12
    tblk = TorchBasicTransformerBlock(dim, heads, cross_dim).eval()
    tnorm = tnn.GroupNorm(4, dim, eps=1e-6)
    tnorm.weight.data.normal_(1.0, 0.1)
    tnorm.bias.data.normal_(0.0, 0.1)
    tproj_in = tnn.Linear(dim, dim)
    tproj_out = tnn.Linear(dim, dim)

    # diffusers Transformer2DModel naming
    sd = {"tf.norm.weight": tnorm.weight.detach().numpy(), "tf.norm.bias": tnorm.bias.detach().numpy()}
    for name, p in tproj_in.state_dict().items():
        sd[f"tf.proj_in.{name}"] = p.numpy()
    for name, p in tproj_out.state_dict().items():
        sd[f"tf.proj_out.{name}"] = p.numpy()
    ren = {
        "norm1": "norm1", "norm2": "norm2", "norm3": "norm3",
        "attn1.to_q": "attn1.to_q", "attn1.to_k": "attn1.to_k",
        "attn1.to_v": "attn1.to_v", "attn1.to_out": "attn1.to_out.0",
        "attn2.to_q": "attn2.to_q", "attn2.to_k": "attn2.to_k",
        "attn2.to_v": "attn2.to_v", "attn2.to_out": "attn2.to_out.0",
        "ff_geglu.proj": "ff.net.0.proj", "ff_out": "ff.net.2",
    }
    for name, p in tblk.state_dict().items():
        stem, leaf = name.rsplit(".", 1)
        sd[f"tf.transformer_blocks.0.{ren[stem]}.{leaf}"] = p.numpy()

    params = _spatial_transformer(sd, "tf", depth=1, cross=True)
    fmod = SpatialTransformer(num_heads=heads, head_dim=dim // heads, depth=1, groups=4)

    x = torch.randn(2, dim, 4, 4)
    ctx = torch.randn(2, 5, cross_dim)
    # torch-side Transformer2DModel forward: GN -> flatten -> proj_in ->
    # blocks -> proj_out -> unflatten + residual
    h = tnorm(x)
    h = h.permute(0, 2, 3, 1).reshape(2, 16, dim)
    h = tproj_in(h)
    h = tblk(h, ctx)
    h = tproj_out(h)
    ref = (h.reshape(2, 4, 4, dim) + x.permute(0, 2, 3, 1)).detach().numpy()

    out = fmod.apply(
        {"params": params},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        context=jnp.asarray(ctx.numpy()),
    )
    np.testing.assert_allclose(np.array(out), ref, rtol=2e-4, atol=2e-4)


def test_vae_mid_attention_import_parity():
    """VAE mid-block attention (GN eps 1e-6 + single-head with qkv bias)
    vs the diffusers Attention module it imports from."""
    from flash_diffusion_tpu.models.vae import _AttnBlock
    from flash_diffusion_tpu.utils.hf import _lin, _norm

    torch.manual_seed(2)
    c = 16
    gn = tnn.GroupNorm(4, c, eps=1e-6)
    gn.weight.data.normal_(1.0, 0.1)
    gn.bias.data.normal_(0.0, 0.1)
    to_q, to_k, to_v = (tnn.Linear(c, c) for _ in range(3))
    to_out = tnn.Linear(c, c)

    sd = {"m.group_norm.weight": gn.weight.detach().numpy(), "m.group_norm.bias": gn.bias.detach().numpy()}
    for name, mod in [("to_q", to_q), ("to_k", to_k), ("to_v", to_v), ("to_out.0", to_out)]:
        for leaf, p in mod.state_dict().items():
            sd[f"m.{name}.{leaf}"] = p.numpy()
    params = {
        "group_norm": _norm(sd, "m.group_norm"),
        "attention": {
            "to_q": _lin(sd, "m.to_q"), "to_k": _lin(sd, "m.to_k"),
            "to_v": _lin(sd, "m.to_v"), "to_out": _lin(sd, "m.to_out.0"),
        },
    }

    x = torch.randn(2, c, 4, 4)
    h = gn(x).permute(0, 2, 3, 1).reshape(2, 16, c)
    q, k, v = to_q(h), to_k(h), to_v(h)
    a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(c), dim=-1)
    ref = (to_out(a @ v).reshape(2, 4, 4, c) + x.permute(0, 2, 3, 1)).detach().numpy()

    out = _AttnBlock(groups=4).apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.array(out), ref, rtol=2e-4, atol=2e-4)
