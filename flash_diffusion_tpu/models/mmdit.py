"""SD3 MMDiT denoiser (joint dual-stream transformer), TPU-native flax.

First-party re-design of the diffusers SD3Transformer2DModel the reference
wraps (reference: src/flash/models/transformers/tranformers.py:103-163).
Conditioning contract: ``vector`` → pooled projections (summed into the
timestep embedding), ``crossattn`` → context token stream, ``concat`` →
channel-concat; output cropped back to input channels (wrapper
``.sample[:, :sample_channels]``).

``return_features="post_mid"`` reproduces the fork-only
``return_post_mid_blocks=True`` discriminator tap (reference:
src/flash/models/flash_sd3/flash_diffusion_model.py:559-564, consumed by a
16-channel conv discriminator in examples/train_flash_sd3.py:144-183): the
latent stream after the middle block is pushed through the shared output
head and unpatchified to sample space.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from pydantic.dataclasses import dataclass

from ..config import BaseConfig
from ..ops import dot_product_attention, layer_norm
from .dit import get_2d_sincos_pos_embed
from .layers import LoraDense, TimestepEmbedMLP, timestep_embedding

Cond = Optional[Dict[str, Dict[str, jnp.ndarray]]]


@dataclass
class MMDiTConfig(BaseConfig):
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    hidden_size: int = 1536
    depth: int = 24
    num_heads: int = 24
    joint_attention_dim: int = 4096  # context token dim (CLIP-pad + T5)
    pooled_projection_dim: int = 2048  # CLIP-L + CLIP-G pooled
    mlp_ratio: float = 4.0
    qk_norm: bool = False
    pos_embed_max_size: int = 192
    remat: bool = False
    sample_size: int = 128


def sd3_medium_config(**overrides) -> MMDiTConfig:
    return MMDiTConfig(**overrides)


class JointBlock(nn.Module):
    """Dual-stream block with joint attention (AdaLayerNormZero both streams)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    context_pre_only: bool = False  # final block: context stream not updated
    qk_norm: bool = False
    kv_valid: Optional[int] = None  # logical joint length (context stream
    # carries trailing 128-alignment padding; see MMDiT.__call__)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c, temb):
        d = self.hidden_size
        h_heads = self.num_heads
        hd = d // h_heads
        b, sx, _ = x.shape
        sc = c.shape[1]

        mod_x = nn.Dense(6 * d, dtype=self.dtype, name="norm1_linear")(nn.silu(temb))
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = (
            mod_x.reshape(b, 6, d)[:, i][:, None, :] for i in range(6)
        )
        if self.context_pre_only:
            # AdaLayerNormContinuous convention: (scale, shift) chunk order
            mod_c = nn.Dense(2 * d, dtype=self.dtype, name="norm1_context_linear")(nn.silu(temb))
            csc_msa, csh_msa = (mod_c.reshape(b, 2, d)[:, i][:, None, :] for i in range(2))
        else:
            mod_c = nn.Dense(6 * d, dtype=self.dtype, name="norm1_context_linear")(nn.silu(temb))
            csh_msa, csc_msa, cg_msa, csh_mlp, csc_mlp, cg_mlp = (
                mod_c.reshape(b, 6, d)[:, i][:, None, :] for i in range(6)
            )

        xn = layer_norm(x, eps=1e-6) * (1 + sc_msa) + sh_msa
        cn = layer_norm(c, eps=1e-6) * (1 + csc_msa) + csh_msa

        dense = lambda name: LoraDense(d, dtype=self.dtype, name=name)
        qx, kx, vx = dense("to_q")(xn), dense("to_k")(xn), dense("to_v")(xn)
        qc, kc, vc = dense("add_q_proj")(cn), dense("add_k_proj")(cn), dense("add_v_proj")(cn)

        # concat the streams at [B, S, C] BEFORE the heads reshape: the 4-D
        # (axis-1) concat of per-head views lowered as pad+pad+maximum
        # fusions (~45 ms/fwd in the r5 SD3 trace); the 3-D concat is a
        # plain contiguous copy and fuses with the downstream transpose.
        # Numerically identical (reshape-after-concat == concat-of-reshapes).
        def joint_heads(tx, tc):
            t = jnp.concatenate([tx, tc], axis=1)
            return t.reshape(b, sx + sc, h_heads, hd)

        q = joint_heads(qx, qc)
        k = joint_heads(kx, kc)
        v = joint_heads(vx, vc)
        if self.qk_norm:
            # per-head RMSNorm on q/k (SD3.5-style; off for SD3-medium)
            def rms(t, name):
                g = self.param(name, nn.initializers.ones, (hd,))
                var = jnp.mean(jnp.square(t.astype(jnp.float32)), axis=-1, keepdims=True)
                return (t * jax.lax.rsqrt(var + 1e-6) * g).astype(t.dtype)

            q = rms(q, "norm_q_scale")
            k = rms(k, "norm_k_scale")
        attn = dot_product_attention(q, k, v, kv_valid=self.kv_valid).reshape(
            b, sx + sc, d
        )
        ax, ac = attn[:, :sx], attn[:, sx:]

        x = x + g_msa * LoraDense(d, dtype=self.dtype, name="to_out")(ax)
        hx = layer_norm(x, eps=1e-6) * (1 + sc_mlp) + sh_mlp
        inner = int(d * self.mlp_ratio)
        hx = LoraDense(inner, dtype=self.dtype, name="ff_in")(hx)
        hx = nn.gelu(hx, approximate=True)
        x = x + g_mlp * LoraDense(d, dtype=self.dtype, name="ff_out")(hx)

        if self.context_pre_only:
            return x, None
        c = c + cg_msa * LoraDense(d, dtype=self.dtype, name="to_add_out")(ac)
        hc = layer_norm(c, eps=1e-6) * (1 + csc_mlp) + csh_mlp
        hc = LoraDense(inner, dtype=self.dtype, name="ff_context_in")(hc)
        hc = nn.gelu(hc, approximate=True)
        c = c + cg_mlp * LoraDense(d, dtype=self.dtype, name="ff_context_out")(hc)
        return x, c


class MMDiT(nn.Module):
    """SD3 denoiser. __call__(sample[B,H,W,16], t[B], cond) → v-prediction."""

    config: MMDiTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timestep: jnp.ndarray,
        conditioning: Cond = None,
        return_features: Optional[str] = None,
    ):
        cfg = self.config
        cond = (conditioning or {}).get("cond", {})
        context = cond.get("crossattn")
        pooled = cond.get("vector")
        concat = cond.get("concat")
        if concat is not None:
            sample = jnp.concatenate([sample, concat.astype(sample.dtype)], axis=-1)

        b, hh, ww, _ = sample.shape
        p = cfg.patch_size
        gh, gw = hh // p, ww // p
        d = cfg.hidden_size
        in_ch = sample.shape[-1]

        x = nn.Conv(d, (p, p), strides=(p, p), padding="VALID", dtype=self.dtype, name="pos_embed_proj")(
            sample.astype(self.dtype)
        )
        x = x.reshape(b, gh * gw, d)
        # diffusers SD3 PatchEmbed(pos_embed_max_size=...) semantics: the
        # sin-cos table is computed ONCE over the max_size grid (coords
        # normalized by max_size/base_size) and center-CROPPED to the input
        # grid — not recomputed at the input size.
        m = cfg.pos_embed_max_size
        pos = get_2d_sincos_pos_embed(d, m, m, base_size=cfg.sample_size // p)
        top, left = (m - gh) // 2, (m - gw) // 2
        pos = pos.reshape(m, m, d)[top : top + gh, left : left + gw].reshape(gh * gw, d)
        x = x + jnp.asarray(pos, self.dtype)[None]

        temb = timestep_embedding(jnp.atleast_1d(timestep), 256)
        temb = TimestepEmbedMLP(d, dtype=self.dtype, name="timestep_embedder")(temb.astype(self.dtype))
        if pooled is not None:
            temb = temb + TimestepEmbedMLP(d, dtype=self.dtype, name="text_embedder")(
                pooled.astype(self.dtype)
            )

        if context is None:
            context = jnp.zeros((b, 1, cfg.joint_attention_dim), self.dtype)
        c = nn.Dense(d, dtype=self.dtype, name="context_embedder")(context.astype(self.dtype))

        # 128-align the JOINT sequence once, here, instead of paying
        # per-layer pad/slice/mask traffic inside every attention call: the
        # r5 SD3 trace showed the 4250-token joint stream (4096 image + 154
        # text) costing ~90 ms/fwd in pad/slice/copy ops alone. The context
        # stream gets zero rows appended; their K/V are masked in-kernel
        # via kv_valid, their Q rows are row-isolated garbage, and the
        # output head below reads only the image rows.
        sx_tokens = gh * gw
        joint = sx_tokens + c.shape[1]
        align_pad = (-joint) % 128
        kv_valid = joint if align_pad else None
        if align_pad:
            c = jnp.pad(c, ((0, 0), (0, align_pad), (0, 0)))

        # shared output head (used by the final output and the post-mid tap)
        norm_out_linear = nn.Dense(2 * d, dtype=self.dtype, name="norm_out_linear")
        proj_out = nn.Dense(p * p * cfg.out_channels, dtype=self.dtype, name="proj_out")

        def head(tokens):
            mo = norm_out_linear(nn.silu(temb)).reshape(b, 2, d)
            scale, shift = mo[:, 0][:, None, :], mo[:, 1][:, None, :]
            t = layer_norm(tokens, eps=1e-6) * (1 + scale) + shift
            t = proj_out(t)
            t = t.reshape(b, gh, gw, p, p, cfg.out_channels)
            t = jnp.einsum("bhwpqc->bhpwqc", t).reshape(b, hh, ww, cfg.out_channels)
            return t.astype(jnp.float32)

        features = None
        Block = nn.remat(JointBlock) if cfg.remat else JointBlock
        for i in range(cfg.depth):
            x, c = Block(
                d,
                cfg.num_heads,
                cfg.mlp_ratio,
                context_pre_only=(i == cfg.depth - 1),
                qk_norm=cfg.qk_norm,
                kv_valid=kv_valid,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, c, temb)
            if return_features == "post_mid" and i == cfg.depth // 2 - 1:
                features = head(x)[..., : cfg.in_channels]

        out = head(x)[..., : min(in_ch, cfg.out_channels)]
        if return_features is not None:
            return out, features
        return out
