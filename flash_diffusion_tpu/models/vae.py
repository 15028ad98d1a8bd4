"""AutoencoderKL (the SD-family VAE) — first-party flax implementation.

Replaces the reference's diffusers wrapper
(reference: src/flash/models/vae/autoencoderKL.py:9-128) with our own body.
Semantics preserved: stochastic ``encode().sample * scaling_factor``,
decode un-scaling including the SD3 ``latents_mean/std`` shift, and tiled
decode with overlap blending for large latents. TPU differences: the
reference micro-batches encode at bs=8 as a CUDA memory workaround — here
encode is one fused XLA call (use ``jax.checkpoint``/sharding for memory);
tiles are decoded as one batched call instead of a Python double loop.
"""

from __future__ import annotations

from dataclasses import field
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from pydantic.dataclasses import dataclass

from ..config import BaseConfig
from .layers import Attention, GroupNorm, ResnetBlock2D


@dataclass
class AutoencoderKLConfig(BaseConfig):
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: List[int] = field(default_factory=lambda: [128, 256, 512, 512])
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215  # SDXL: 0.13025, SD3: 1.5305
    latents_mean: Optional[List[float]] = None  # SD3 uses a per-channel shift
    latents_std: Optional[List[float]] = None
    shift_factor: Optional[float] = None  # scalar variant (SD3: 0.0609)
    mid_block_attn: bool = True
    # SD1/SDXL VAEs carry 1×1 quant/post-quant convs around the latent;
    # the SD3 VAE drops both (diffusers use_quant_conv=False in the
    # sd3-medium vae/config.json) — checkpoints have no such keys
    use_quant_conv: bool = True
    # tiled decode (reference: tiling over latent H/W with overlap blending)
    tiling_size: Tuple[int, int] = (64, 64)
    tiling_overlap: Tuple[int, int] = (8, 8)

    @property
    def downsampling_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


def sd_vae_config(**overrides) -> AutoencoderKLConfig:
    return AutoencoderKLConfig(**overrides)


def sd3_vae_config(**overrides) -> AutoencoderKLConfig:
    base = dict(
        latent_channels=16, scaling_factor=1.5305, shift_factor=0.0609,
        use_quant_conv=False,
    )
    base.update(overrides)
    return AutoencoderKLConfig(**base)


class _AttnBlock(nn.Module):
    """VAE mid-block attention: GN → single-head attention over HW tokens."""

    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        x = GroupNorm(self.groups, eps=1e-6, name="group_norm")(x)
        x = Attention(num_heads=1, qkv_bias=True, dtype=self.dtype, name="attention")(
            x.reshape(b, h * w, c)
        )
        return x.reshape(b, h, w, c) + residual


class Encoder(nn.Module):
    config: AutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        g = cfg.norm_num_groups
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for lvl, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(ch, None, g, eps=1e-6, dtype=self.dtype, name=f"down_{lvl}_resnet_{j}")(h)
            if lvl < len(cfg.block_out_channels) - 1:
                # diffusers VAE downsample: asymmetric pad (0,1) + stride-2 VALID
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    ch, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype,
                    name=f"down_{lvl}_downsample",
                )(h)
        ch = cfg.block_out_channels[-1]
        h = ResnetBlock2D(ch, None, g, eps=1e-6, dtype=self.dtype, name="mid_resnet_0")(h)
        if cfg.mid_block_attn:
            h = _AttnBlock(g, dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock2D(ch, None, g, eps=1e-6, dtype=self.dtype, name="mid_resnet_1")(h)
        h = GroupNorm(g, eps=1e-6, act="silu", name="conv_norm_out")(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    config: AutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        g = cfg.norm_num_groups
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock2D(ch, None, g, eps=1e-6, dtype=self.dtype, name="mid_resnet_0")(h)
        if cfg.mid_block_attn:
            h = _AttnBlock(g, dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock2D(ch, None, g, eps=1e-6, dtype=self.dtype, name="mid_resnet_1")(h)
        from .layers import _FoldedUpConv

        for i, lvl in enumerate(reversed(range(len(cfg.block_out_channels)))):
            ch = cfg.block_out_channels[lvl]
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock2D(ch, None, g, eps=1e-6, dtype=self.dtype, name=f"up_{lvl}_resnet_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                # nearest-×2 + conv3×3 computed at LOW res (exact sub-pixel
                # fold — see _FoldedUpConv); params identical to nn.Conv
                h = _FoldedUpConv(ch, dtype=self.dtype, name=f"up_{lvl}_upsample")(h)
        h = GroupNorm(g, eps=1e-6, act="silu", name="conv_norm_out")(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """Full VAE with quant convs. Methods: encode / decode / __call__."""

    config: AutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        if self.config.use_quant_conv:
            self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv")
            self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv")
        else:
            self.quant_conv = lambda m: m
            self.post_quant_conv = lambda z: z

    def moments(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        m = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(m, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x: jnp.ndarray, rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """Posterior sample (or mode when rng is None), pre-scaled by
        scaling_factor — matching the reference's ``encode``
        (autoencoderKL.py:52-61)."""
        mean, logvar = self.moments(x)
        if rng is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)
        latents = mean.astype(jnp.float32)
        if self.config.shift_factor is not None:
            latents = latents - self.config.shift_factor
        return latents * self.config.scaling_factor

    def decode_latents(self, z: jnp.ndarray) -> jnp.ndarray:
        """Un-scale (incl. SD3 latents mean/std or shift) and decode."""
        cfg = self.config
        z = z.astype(jnp.float32)
        if cfg.latents_mean is not None and cfg.latents_std is not None:
            mean = jnp.asarray(cfg.latents_mean).reshape(1, 1, 1, -1)
            std = jnp.asarray(cfg.latents_std).reshape(1, 1, 1, -1)
            z = z * std / cfg.scaling_factor + mean
        elif cfg.shift_factor is not None:
            z = z / cfg.scaling_factor + cfg.shift_factor
        else:
            z = z / cfg.scaling_factor
        return self.decoder(self.post_quant_conv(z)).astype(jnp.float32)

    def __call__(self, x, rng=None):
        z = self.encode(x, rng)
        return self.decode_latents(z)


def tiled_decode(
    vae: AutoencoderKL,
    params,
    z: jnp.ndarray,
    tile: Tuple[int, int] = None,
    overlap: Tuple[int, int] = None,
) -> jnp.ndarray:
    """Tiled decode with linear overlap blending (reference Tiler semantics,
    src/flash/models/utils.py:12-313), restructured for TPU: all tiles are
    stacked into one batched decode call instead of per-tile Python loops.
    """
    cfg = vae.config
    tile = tile or cfg.tiling_size
    overlap = overlap or cfg.tiling_overlap
    b, h, w, c = z.shape
    if h <= tile[0] and w <= tile[1]:
        return vae.apply(params, z, method=vae.decode_latents)

    f = cfg.downsampling_factor
    th, tw = tile
    oh, ow = overlap
    step_h, step_w = th - oh, tw - ow
    rows = max(1, -(-(h - oh) // step_h))
    cols = max(1, -(-(w - ow) // step_w))

    tiles = []
    coords = []
    for i in range(rows):
        for j in range(cols):
            y = min(i * step_h, max(h - th, 0))
            x = min(j * step_w, max(w - tw, 0))
            tiles.append(z[:, y : y + th, x : x + tw, :])
            coords.append((y, x))
    stacked = jnp.concatenate(tiles, axis=0)  # [rows*cols*b, th, tw, c]
    decoded = vae.apply(params, stacked, method=vae.decode_latents)

    out = jnp.zeros((b, h * f, w * f, cfg.out_channels), jnp.float32)
    weight = jnp.zeros((b, h * f, w * f, 1), jnp.float32)
    # linear blend ramp over the overlap region
    wy = jnp.minimum(jnp.arange(th * f) + 1, jnp.arange(th * f)[::-1] + 1).astype(jnp.float32)
    wx = jnp.minimum(jnp.arange(tw * f) + 1, jnp.arange(tw * f)[::-1] + 1).astype(jnp.float32)
    wmask = jnp.minimum(wy[:, None], wx[None, :])[None, :, :, None]
    for idx, (y, x) in enumerate(coords):
        tile_out = decoded[idx * b : (idx + 1) * b] * wmask
        out = jax.lax.dynamic_update_slice(
            out, jax.lax.dynamic_slice(out, (0, y * f, x * f, 0), tile_out.shape) + tile_out, (0, y * f, x * f, 0)
        )
        weight = jax.lax.dynamic_update_slice(
            weight,
            jax.lax.dynamic_slice(weight, (0, y * f, x * f, 0), (b, th * f, tw * f, 1)) + wmask,
            (0, y * f, x * f, 0),
        )
    return out / jnp.maximum(weight, 1e-8)
