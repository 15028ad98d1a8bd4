"""UNet denoiser backbones (SD1.5 / SDXL families), TPU-native.

First-party flax re-design of the diffusers UNet2DModel /
UNet2DConditionModel bodies that the reference wraps
(reference: src/flash/models/unets/unet.py:7-127). The framework conditioning
contract is preserved:

- ``cond["crossattn"]`` → cross-attention context (encoder hidden states),
- ``cond["vector"]``    → projection class embedding added to the time
  embedding (the reference's SDXL scripts route the pooled+size vector via
  ``class_embed_type="projection"``, examples/train_flash_sdxl.py:66-134),
- ``cond["concat"]``    → channel-concatenated to the latent input,
- ``adapter_residuals`` → per-down-block additive features (T2I adapter),
- ``return_features=True`` → also return the mid-block hidden state, the
  discriminator feature tap (the fork's ``return_intermediate`` kwarg,
  SURVEY.md §2.1); here an explicit extra output instead of a fork patch.

Layout: NHWC latents (converters transpose HF NCHW checkpoints once at
import). Compute dtype is configurable (bf16 on TPU); params stay fp32.
"""

from __future__ import annotations

from dataclasses import field
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
from pydantic.dataclasses import dataclass

from ..config import BaseConfig
from .layers import (
    Downsample2D,
    GroupNorm,
    ResnetBlock2D,
    SpatialTransformer,
    TimestepEmbedMLP,
    Upsample2D,
    timestep_embedding,
)

Cond = Optional[Dict[str, Dict[str, jnp.ndarray]]]


@dataclass
class UNetConfig(BaseConfig):
    """Covers SD1.5, SDXL, plain UNet2D, and the custom example variants.

    ``num_heads`` takes the role of diffusers' overloaded
    ``attention_head_dim`` (for SD1.5 that field actually holds the head
    *count*; converters normalize to an explicit per-level head count here).
    """

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: List[int] = field(default_factory=lambda: [320, 640, 1280, 1280])
    down_block_types: List[str] = field(
        default_factory=lambda: [
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
            "DownBlock2D",
        ]
    )
    layers_per_block: int = 2
    transformer_layers_per_block: List[int] = field(default_factory=lambda: [1, 1, 1, 1])
    num_heads: List[int] = field(default_factory=lambda: [8, 8, 8, 8])
    cross_attention_dim: Optional[int] = 768
    norm_num_groups: int = 32
    class_embed_type: Optional[str] = None  # None | "projection"
    remat: bool = False  # rematerialize blocks (training memory at 1024²)
    projection_class_embeddings_input_dim: Optional[int] = None
    mid_block_attn: bool = True

    def __post_init__(self):
        super().__post_init__()
        n = len(self.block_out_channels)
        if isinstance(self.transformer_layers_per_block, int):
            self.transformer_layers_per_block = [self.transformer_layers_per_block] * n
        if isinstance(self.num_heads, int):
            self.num_heads = [self.num_heads] * n
        assert len(self.down_block_types) == n
        assert len(self.num_heads) == n


def sd15_unet_config(**overrides) -> UNetConfig:
    """Stable Diffusion 1.5 UNet architecture."""
    base = dict(
        block_out_channels=[320, 640, 1280, 1280],
        down_block_types=["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"],
        layers_per_block=2,
        transformer_layers_per_block=[1, 1, 1, 1],
        num_heads=[8, 8, 8, 8],
        cross_attention_dim=768,
    )
    base.update(overrides)
    return UNetConfig(**base)


def sdxl_unet_config(**overrides) -> UNetConfig:
    """SDXL base UNet architecture (vector cond routed via projection class
    embedding, matching the reference's script-built teacher)."""
    base = dict(
        block_out_channels=[320, 640, 1280],
        down_block_types=["DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"],
        layers_per_block=2,
        transformer_layers_per_block=[1, 2, 10],
        num_heads=[5, 10, 20],
        cross_attention_dim=2048,
        class_embed_type="projection",
        projection_class_embeddings_input_dim=2816,
    )
    base.update(overrides)
    return UNetConfig(**base)


class UNet2DCondition(nn.Module):
    """The denoiser. __call__(sample[B,H,W,C], timestep[B], cond, ...)."""

    config: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timestep: jnp.ndarray,
        conditioning: Cond = None,
        adapter_residuals: Optional[List[jnp.ndarray]] = None,
        return_features: bool = False,
    ):
        cfg = self.config
        cond = (conditioning or {}).get("cond", {})
        context = cond.get("crossattn")
        vector = cond.get("vector")
        concat = cond.get("concat")
        if context is not None:
            context = context.astype(self.dtype)
        if concat is not None:
            sample = jnp.concatenate([sample, concat.astype(sample.dtype)], axis=-1)

        Res = nn.remat(ResnetBlock2D) if cfg.remat else ResnetBlock2D
        Attn = nn.remat(SpatialTransformer, static_argnums=()) if cfg.remat else SpatialTransformer
        b0 = cfg.block_out_channels[0]
        temb_dim = b0 * 4
        temb = timestep_embedding(jnp.atleast_1d(timestep), b0)
        temb = TimestepEmbedMLP(temb_dim, dtype=self.dtype, name="time_embedding")(
            temb.astype(self.dtype)
        )
        if cfg.class_embed_type == "projection" and vector is not None:
            cemb = TimestepEmbedMLP(temb_dim, dtype=self.dtype, name="class_embedding")(
                vector.astype(self.dtype)
            )
            temb = temb + cemb

        sample = sample.astype(self.dtype)
        h = nn.Conv(b0, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(sample)

        # ---- down path -------------------------------------------------
        skips = [h]
        for lvl, block_type in enumerate(cfg.down_block_types):
            ch = cfg.block_out_channels[lvl]
            has_attn = block_type in ("CrossAttnDownBlock2D", "AttnDownBlock2D")
            cross = block_type == "CrossAttnDownBlock2D"
            for j in range(cfg.layers_per_block):
                h = Res(
                    ch, temb_dim, cfg.norm_num_groups, dtype=self.dtype,
                    name=f"down_{lvl}_resnet_{j}",
                )(h, temb)
                if has_attn:
                    heads = cfg.num_heads[lvl]
                    h = Attn(
                        heads,
                        ch // heads,
                        depth=cfg.transformer_layers_per_block[lvl],
                        cross_attention=cross,
                        groups=cfg.norm_num_groups,
                        dtype=self.dtype,
                        name=f"down_{lvl}_attn_{j}",
                    )(h, context=context if cross else None)
                if j == cfg.layers_per_block - 1 and adapter_residuals is not None:
                    h = h + adapter_residuals[lvl].astype(h.dtype)
                skips.append(h)
            if lvl < len(cfg.block_out_channels) - 1:
                h = Downsample2D(ch, dtype=self.dtype, name=f"down_{lvl}_downsample")(h)
                skips.append(h)

        # ---- mid -------------------------------------------------------
        ch = cfg.block_out_channels[-1]
        h = Res(ch, temb_dim, cfg.norm_num_groups, dtype=self.dtype, name="mid_resnet_0")(h, temb)
        if cfg.mid_block_attn:
            heads = cfg.num_heads[-1]
            h = Attn(
                heads,
                ch // heads,
                depth=cfg.transformer_layers_per_block[-1],
                cross_attention=cfg.cross_attention_dim is not None,
                groups=cfg.norm_num_groups,
                dtype=self.dtype,
                name="mid_attn",
            )(h, context=context)
        h = Res(ch, temb_dim, cfg.norm_num_groups, dtype=self.dtype, name="mid_resnet_1")(h, temb)
        mid_features = h

        # ---- up path ---------------------------------------------------
        for lvl in reversed(range(len(cfg.block_out_channels))):
            ch = cfg.block_out_channels[lvl]
            block_type = cfg.down_block_types[lvl]
            has_attn = block_type in ("CrossAttnDownBlock2D", "AttnDownBlock2D")
            cross = block_type == "CrossAttnDownBlock2D"
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = Res(
                    ch, temb_dim, cfg.norm_num_groups, dtype=self.dtype,
                    name=f"up_{lvl}_resnet_{j}",
                )(h, temb)
                if has_attn:
                    heads = cfg.num_heads[lvl]
                    h = Attn(
                        heads,
                        ch // heads,
                        depth=cfg.transformer_layers_per_block[lvl],
                        cross_attention=cross,
                        groups=cfg.norm_num_groups,
                        dtype=self.dtype,
                        name=f"up_{lvl}_attn_{j}",
                    )(h, context=context if cross else None)
            if lvl > 0:
                h = Upsample2D(ch, dtype=self.dtype, name=f"up_{lvl}_upsample")(h)

        # ---- out -------------------------------------------------------
        h = GroupNorm(cfg.norm_num_groups, act="silu", name="conv_norm_out")(h)
        out = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)
        out = out.astype(jnp.float32)
        if return_features:
            return out, mid_features
        return out
