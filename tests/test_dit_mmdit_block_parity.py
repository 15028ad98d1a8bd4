"""Block-level torch parity for the Pixart DiT and SD3 MMDiT importers.

Companion to tests/test_unet_block_parity.py: the torch side re-states the
diffusers blocks (BasicTransformerBlock with norm_type="ada_norm_single";
JointTransformerBlock with AdaLayerNormZero + joint attention) with
diffusers state_dict naming; the flax side goes through the real importer
helpers (utils/hf._attention/_lin — the same code paths import_pixart_dit /
import_sd3_mmdit compose)."""

import math

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from flash_diffusion_tpu.models.dit import PixartBlock
from flash_diffusion_tpu.models.mmdit import JointBlock
from flash_diffusion_tpu.utils.hf import _attention, _lin


def _mha(to_q, to_k, to_v, to_out, x, ctx, heads):
    b, s, dim = x.shape
    d = dim // heads
    q = to_q(x).view(b, s, heads, d).transpose(1, 2)
    k = to_k(ctx).view(b, ctx.shape[1], heads, d).transpose(1, 2)
    v = to_v(ctx).view(b, ctx.shape[1], heads, d).transpose(1, 2)
    a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(d), dim=-1)
    out = (a @ v).transpose(1, 2).reshape(b, s, dim)
    return to_out(out)


def _ln(x):
    return F.layer_norm(x, (x.shape[-1],), eps=1e-6)


def test_pixart_block_import_parity():
    """diffusers BasicTransformerBlock(norm_type='ada_norm_single',
    activation_fn='gelu-approximate', attention_bias=True) vs PixartBlock
    through the importer's per-block param layout."""
    torch.manual_seed(0)
    dim, heads, cross_dim = 16, 2, 16
    mk = lambda i, o, bias=True: tnn.Linear(i, o, bias=bias)
    attn1 = dict(to_q=mk(dim, dim), to_k=mk(dim, dim), to_v=mk(dim, dim), to_out=mk(dim, dim))
    attn2 = dict(to_q=mk(dim, dim), to_k=mk(cross_dim, dim), to_v=mk(cross_dim, dim), to_out=mk(dim, dim))
    ff_in, ff_out = mk(dim, 4 * dim), mk(4 * dim, dim)
    table = torch.randn(6, dim) / math.sqrt(dim)

    sd = {"blk.scale_shift_table": table.numpy()}
    for name, mods in [("attn1", attn1), ("attn2", attn2)]:
        for proj, mod in mods.items():
            key = f"blk.{name}.{proj}" if proj != "to_out" else f"blk.{name}.to_out.0"
            for leaf, p in mod.state_dict().items():
                sd[f"{key}.{leaf}"] = p.numpy()
    for leaf, p in ff_in.state_dict().items():
        sd[f"blk.ff.net.0.proj.{leaf}"] = p.numpy()
    for leaf, p in ff_out.state_dict().items():
        sd[f"blk.ff.net.2.{leaf}"] = p.numpy()

    # importer layout (as import_pixart_dit composes it)
    params = {
        "scale_shift_table": sd["blk.scale_shift_table"],
        "attn1": _attention(sd, "blk.attn1"),
        "attn2": _attention(sd, "blk.attn2"),
        "ff_in": _lin(sd, "blk.ff.net.0.proj"),
        "ff_out": _lin(sd, "blk.ff.net.2"),
    }

    b, s, sc = 2, 8, 5
    x = torch.randn(b, s, dim)
    ctx = torch.randn(b, sc, cross_dim)
    mod6 = torch.randn(b, 6 * dim)

    # torch forward (diffusers ada_norm_single semantics)
    m = table[None] + mod6.reshape(b, 6, dim)
    sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = (m[:, i][:, None, :] for i in range(6))
    h = _ln(x) * (1 + sc_msa) + sh_msa
    xt = x + g_msa * _mha(attn1["to_q"], attn1["to_k"], attn1["to_v"], attn1["to_out"], h, h, heads)
    xt = xt + _mha(attn2["to_q"], attn2["to_k"], attn2["to_v"], attn2["to_out"], xt, ctx, heads)
    h = _ln(xt) * (1 + sc_mlp) + sh_mlp
    ref = xt + g_mlp * ff_out(F.gelu(ff_in(h), approximate="tanh"))

    out = PixartBlock(dim, heads).apply(
        {"params": params},
        jnp.asarray(x.numpy()),
        jnp.asarray(mod6.numpy()),
        context=jnp.asarray(ctx.numpy()),
    )
    np.testing.assert_allclose(np.array(out), ref.detach().numpy(), rtol=2e-4, atol=2e-4)


def test_mmdit_joint_block_import_parity():
    """diffusers JointTransformerBlock (AdaLayerNormZero both streams,
    joint attention sample-first, gelu-approximate FFs) vs JointBlock
    through import_sd3_mmdit's per-block layout."""
    torch.manual_seed(1)
    dim, heads = 16, 2
    mk = lambda i, o, bias=True: tnn.Linear(i, o, bias=bias)
    mods = dict(
        norm1_linear=mk(dim, 6 * dim),
        norm1_context_linear=mk(dim, 6 * dim),
        to_q=mk(dim, dim), to_k=mk(dim, dim), to_v=mk(dim, dim), to_out=mk(dim, dim),
        add_q_proj=mk(dim, dim), add_k_proj=mk(dim, dim), add_v_proj=mk(dim, dim),
        to_add_out=mk(dim, dim),
        ff_in=mk(dim, 4 * dim), ff_out=mk(4 * dim, dim),
        ff_context_in=mk(dim, 4 * dim), ff_context_out=mk(4 * dim, dim),
    )
    names = {
        "norm1_linear": "blk.norm1.linear",
        "norm1_context_linear": "blk.norm1_context.linear",
        "to_q": "blk.attn.to_q", "to_k": "blk.attn.to_k", "to_v": "blk.attn.to_v",
        "to_out": "blk.attn.to_out.0",
        "add_q_proj": "blk.attn.add_q_proj", "add_k_proj": "blk.attn.add_k_proj",
        "add_v_proj": "blk.attn.add_v_proj", "to_add_out": "blk.attn.to_add_out",
        "ff_in": "blk.ff.net.0.proj", "ff_out": "blk.ff.net.2",
        "ff_context_in": "blk.ff_context.net.0.proj", "ff_context_out": "blk.ff_context.net.2",
    }
    sd = {}
    for ours, theirs in names.items():
        for leaf, p in mods[ours].state_dict().items():
            sd[f"{theirs}.{leaf}"] = p.numpy()

    # import_sd3_mmdit's per-block layout
    k = "blk"
    params = {
        "norm1_linear": _lin(sd, f"{k}.norm1.linear"),
        "norm1_context_linear": _lin(sd, f"{k}.norm1_context.linear"),
        "to_q": _lin(sd, f"{k}.attn.to_q"),
        "to_k": _lin(sd, f"{k}.attn.to_k"),
        "to_v": _lin(sd, f"{k}.attn.to_v"),
        "to_out": _lin(sd, f"{k}.attn.to_out.0"),
        "add_q_proj": _lin(sd, f"{k}.attn.add_q_proj"),
        "add_k_proj": _lin(sd, f"{k}.attn.add_k_proj"),
        "add_v_proj": _lin(sd, f"{k}.attn.add_v_proj"),
        "to_add_out": _lin(sd, f"{k}.attn.to_add_out"),
        "ff_in": _lin(sd, f"{k}.ff.net.0.proj"),
        "ff_out": _lin(sd, f"{k}.ff.net.2"),
        "ff_context_in": _lin(sd, f"{k}.ff_context.net.0.proj"),
        "ff_context_out": _lin(sd, f"{k}.ff_context.net.2"),
    }

    b, sx, sc = 2, 8, 5
    x = torch.randn(b, sx, dim)
    c = torch.randn(b, sc, dim)
    temb = torch.randn(b, dim)

    # torch forward (diffusers JointTransformerBlock semantics)
    def chunk6(lin):
        m = lin(F.silu(temb))
        return [m[:, i * dim : (i + 1) * dim][:, None, :] for i in range(6)]

    sh, sca, g, sh2, sca2, g2 = chunk6(mods["norm1_linear"])
    csh, csca, cg, csh2, csca2, cg2 = chunk6(mods["norm1_context_linear"])
    xn = _ln(x) * (1 + sca) + sh
    cn = _ln(c) * (1 + csca) + csh

    d = dim // heads
    def proj_heads(lin, t):
        return lin(t).view(b, t.shape[1], heads, d).transpose(1, 2)

    q = torch.cat([proj_heads(mods["to_q"], xn), proj_heads(mods["add_q_proj"], cn)], dim=2)
    kk = torch.cat([proj_heads(mods["to_k"], xn), proj_heads(mods["add_k_proj"], cn)], dim=2)
    v = torch.cat([proj_heads(mods["to_v"], xn), proj_heads(mods["add_v_proj"], cn)], dim=2)
    a = torch.softmax(q @ kk.transpose(-1, -2) / math.sqrt(d), dim=-1)
    attn = (a @ v).transpose(1, 2).reshape(b, sx + sc, dim)
    ax, ac = attn[:, :sx], attn[:, sx:]

    xt = x + g * mods["to_out"](ax)
    h = _ln(xt) * (1 + sca2) + sh2
    xt = xt + g2 * mods["ff_out"](F.gelu(mods["ff_in"](h), approximate="tanh"))

    ct = c + cg * mods["to_add_out"](ac)
    h = _ln(ct) * (1 + csca2) + csh2
    ct = ct + cg2 * mods["ff_context_out"](F.gelu(mods["ff_context_in"](h), approximate="tanh"))

    out_x, out_c = JointBlock(dim, heads).apply(
        {"params": params},
        jnp.asarray(x.numpy()),
        jnp.asarray(c.numpy()),
        jnp.asarray(temb.numpy()),
    )
    np.testing.assert_allclose(np.array(out_x), xt.detach().numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.array(out_c), ct.detach().numpy(), rtol=2e-4, atol=2e-4)
