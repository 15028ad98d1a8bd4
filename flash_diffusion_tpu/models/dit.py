"""Pixart-α DiT denoiser (adaLN-single), TPU-native flax implementation.

First-party re-design of the diffusers Transformer2DModel body the reference
wraps (reference: src/flash/models/transformers/tranformers.py:9-101),
including the reference's *custom* multi-vector AdaLayerNormSingle
(src/flash/models/transformers/utils.py:8-102): the shared timestep
embedding may be augmented with extra embedded scalar conditionings
(resolution / aspect-ratio), each with its own embedding MLP, concatenated
before producing the 6·dim per-block modulation.

Conditioning contract (same as the UNet): ``crossattn`` (projected T5
tokens), ``vector`` ([B, k] scalars for the extra adaLN embedders, reference
concat-style), ``attention_mask`` (T5 padding mask, additive bias in cross
attention). The wrapper's output-channel crop (tranformers.py:91) is the
``out_channels -> in_channels`` slice after unpatchify.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from pydantic.dataclasses import dataclass

from ..config import BaseConfig
from ..ops import layer_norm
from .layers import Attention, LoraDense, TimestepEmbedMLP, timestep_embedding

Cond = Optional[Dict[str, Dict[str, jnp.ndarray]]]


@dataclass
class DiTConfig(BaseConfig):
    in_channels: int = 4
    out_channels: int = 8  # Pixart predicts eps + sigma; crop to in_channels
    patch_size: int = 2
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    caption_channels: int = 4096  # T5 dim
    mlp_ratio: float = 4.0
    # number of extra embedded scalar conditionings for the custom
    # AdaLayerNormSingle (e.g. 2: resolution + aspect_ratio). 0 disables.
    num_vector_embeds: int = 0
    vector_embed_dim: int = 256  # sinusoidal width per extra scalar
    sample_size: int = 64  # base grid for pos-embed interpolation scale
    # pos-embed grid divisor; None → diffusers Pixart default
    # max(sample_size // 64, 1) (2 for the 1024-MS checkpoints)
    interpolation_scale: Optional[float] = None
    remat: bool = False

    def __post_init__(self):
        super().__post_init__()
        if self.interpolation_scale is None:
            self.interpolation_scale = float(max(self.sample_size // 64, 1))


def pixart_config(**overrides) -> DiTConfig:
    base = dict(hidden_size=1152, depth=28, num_heads=16, caption_channels=4096)
    base.update(overrides)
    return DiTConfig(**base)


def get_2d_sincos_pos_embed(
    dim: int, h: int, w: int, base_size: int = 64, interpolation_scale: float = 1.0
) -> np.ndarray:
    """2D sin-cos positional embedding, exact diffusers/MAE semantics.

    Two quirks preserved for checkpoint parity (diffusers
    ``get_2d_sincos_pos_embed`` derives from MAE's): the FIRST half of the
    embedding encodes the **w** (column) coordinate — ``meshgrid(grid_w,
    grid_h)`` puts the w-varying array in ``grid[0]`` despite the
    ``emb_h`` name — and grid coordinates are divided by
    ``interpolation_scale`` (Pixart-1024 uses 2)."""
    grid_h = np.arange(h, dtype=np.float64) / (h / base_size) / interpolation_scale
    grid_w = np.arange(w, dtype=np.float64) / (w / base_size) / interpolation_scale
    gw, gh = np.meshgrid(grid_w, grid_h)  # gw varies along axis 1 (columns)

    def _1d(pos, d):
        omega = np.arange(d // 2, dtype=np.float64) / (d / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb_w = _1d(gw, dim // 2)
    emb_h = _1d(gh, dim // 2)
    return np.concatenate([emb_w, emb_h], axis=1)  # [h*w, dim]; w-half first


class AdaLayerNormSingle(nn.Module):
    """Shared timestep (+ extra scalar conditionings) → (6·dim, embedded_t).

    Re-derivation of the reference's custom concat-style AdaLayerNormSingle
    (src/flash/models/transformers/utils.py:62-102): base sinusoidal(256) →
    MLP(dim); the vector conditioning is chunked into ``num_vector_embeds``
    pieces, each run through its OWN width-``dim // num_vector_embeds``
    embedding MLP, the outputs **concatenated** to width ``dim`` and added
    to the base embedding. For Pixart-1024-MS the three chunks are
    (height, width, aspect_ratio) and the stock diffusers checkpoint's
    resolution/aspect embedders (width dim//3 = 384) drop straight into
    chunks 0/1 (both = resolution_embedder) and 2 (aspect_ratio_embedder)
    — mirroring the reference surgery
    (examples/train_flash_pixart.py:88-172).

    ``vector`` may be [B, n] raw scalars (sinusoidally embedded here, the
    usual model-level contract) or [B, n·vector_embed_dim] pre-embedded
    conditioner output (reference TimestepsEmbedder wiring).
    """

    hidden_size: int
    num_vector_embeds: int = 0
    vector_embed_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, timestep: jnp.ndarray, vector: Optional[jnp.ndarray] = None):
        emb = timestep_embedding(jnp.atleast_1d(timestep), 256)
        emb = TimestepEmbedMLP(self.hidden_size, dtype=self.dtype, name="timestep_embedder")(
            emb.astype(self.dtype)
        )
        n = self.num_vector_embeds
        if n and vector is not None:
            if self.hidden_size % n:
                raise ValueError(
                    f"hidden_size {self.hidden_size} not divisible by "
                    f"num_vector_embeds {n} (reference concat semantics)"
                )
            if vector.shape[-1] == n:  # raw scalars → sinusoidal per column
                chunks = [
                    timestep_embedding(vector[:, i], self.vector_embed_dim)
                    for i in range(n)
                ]
            else:  # pre-embedded [B, n·in_dim] (torch.chunk semantics)
                chunks = jnp.split(vector, n, axis=-1)
            add = jnp.concatenate(
                [
                    TimestepEmbedMLP(
                        self.hidden_size // n,
                        dtype=self.dtype,
                        name=f"vector_embedder_{i}",
                    )(c.astype(self.dtype))
                    for i, c in enumerate(chunks)
                ],
                axis=-1,
            )
            emb = emb + add
        mod = nn.Dense(6 * self.hidden_size, dtype=self.dtype, name="linear")(nn.silu(emb))
        return mod, emb


class PixartBlock(nn.Module):
    """adaLN-single DiT block: modulated self-attn, raw cross-attn, modulated FF."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mod6, context=None, context_bias=None):
        d = self.hidden_size
        table = self.param(
            "scale_shift_table", nn.initializers.normal(1.0 / math.sqrt(d)), (6, d)
        )
        m = table[None] + mod6.reshape(-1, 6, d)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
            m[:, i][:, None, :] for i in range(6)
        )
        h = layer_norm(x, eps=1e-6) * (1 + scale_msa) + shift_msa
        x = x + gate_msa * Attention(
            self.num_heads, d // self.num_heads, qkv_bias=True, dtype=self.dtype, name="attn1"
        )(h)
        if context is not None:
            x = x + Attention(
                self.num_heads, d // self.num_heads, qkv_bias=True, dtype=self.dtype, name="attn2"
            )(x, context=context, bias=context_bias)
        h = layer_norm(x, eps=1e-6) * (1 + scale_mlp) + shift_mlp
        inner = int(d * self.mlp_ratio)
        h = LoraDense(inner, dtype=self.dtype, name="ff_in")(h)
        h = nn.gelu(h, approximate=True)
        h = LoraDense(d, dtype=self.dtype, name="ff_out")(h)
        return x + gate_mlp * h


class DiT(nn.Module):
    """Pixart-α transformer denoiser. __call__(sample[B,H,W,C], t[B], cond)."""

    config: DiTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timestep: jnp.ndarray,
        conditioning: Cond = None,
        return_features: bool = False,
    ):
        cfg = self.config
        cond = (conditioning or {}).get("cond", {})
        context = cond.get("crossattn")
        vector = cond.get("vector")
        concat = cond.get("concat")
        attn_mask = cond.get("attention_mask")
        if concat is not None:
            sample = jnp.concatenate([sample, concat.astype(sample.dtype)], axis=-1)

        b, hh, ww, c = sample.shape
        p = cfg.patch_size
        gh, gw = hh // p, ww // p
        d = cfg.hidden_size

        # patchify via conv
        x = nn.Conv(
            d, (p, p), strides=(p, p), padding="VALID", dtype=self.dtype, name="pos_embed_proj"
        )(sample.astype(self.dtype))
        x = x.reshape(b, gh * gw, d)
        pos = get_2d_sincos_pos_embed(
            d, gh, gw, base_size=cfg.sample_size // p,
            interpolation_scale=cfg.interpolation_scale,
        )
        x = x + jnp.asarray(pos, self.dtype)[None]

        mod6, emb_t = AdaLayerNormSingle(
            d, cfg.num_vector_embeds, cfg.vector_embed_dim, dtype=self.dtype, name="adaln_single"
        )(timestep, vector)

        context_bias = None
        if context is not None:
            # caption projection: linear → gelu → linear (PixArt text proj)
            ctx = nn.Dense(d, dtype=self.dtype, name="caption_projection_1")(
                context.astype(self.dtype)
            )
            ctx = nn.gelu(ctx, approximate=True)
            context = nn.Dense(d, dtype=self.dtype, name="caption_projection_2")(ctx)
            if attn_mask is not None:
                # [B, S_kv] -> additive bias [B, 1, 1, S_kv]
                context_bias = jnp.where(attn_mask[:, None, None, :] > 0, 0.0, -1e9)

        Block = nn.remat(PixartBlock) if cfg.remat else PixartBlock
        for i in range(cfg.depth):
            x = Block(d, cfg.num_heads, cfg.mlp_ratio, dtype=self.dtype, name=f"block_{i}")(
                x, mod6, context=context, context_bias=context_bias
            )

        table_out = self.param(
            "scale_shift_table_out", nn.initializers.normal(1.0 / math.sqrt(d)), (2, d)
        )
        mo = table_out[None] + emb_t[:, None, :]
        shift, scale = mo[:, 0][:, None, :], mo[:, 1][:, None, :]
        x = layer_norm(x, eps=1e-6) * (1 + scale) + shift
        x = nn.Dense(p * p * cfg.out_channels, dtype=self.dtype, name="proj_out")(x)

        # unpatchify
        x = x.reshape(b, gh, gw, p, p, cfg.out_channels)
        x = jnp.einsum("bhwpqc->bhpwqc", x).reshape(b, hh, ww, cfg.out_channels)
        # crop predicted channels back to input count (wrapper semantics,
        # reference tranformers.py:91)
        out = x[..., : cfg.in_channels].astype(jnp.float32)
        if return_features:
            # Reference parity: the Pixart wrapper's forward swallows
            # ``return_intermediate`` in **kwargs (reference
            # tranformers.py:49-91 — no such parameter), so the GAN
            # "features" the 4-channel discriminator consumes are simply the
            # denoised output latents (train_flash_pixart.py:278 color_dim=4).
            return out, out.astype(self.dtype)
        return out
