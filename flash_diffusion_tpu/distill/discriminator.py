"""Latent-feature conv discriminators.

The reference builds these inline per script as torch Sequential conv stacks
over denoiser features — SDXL: 1280-ch mid features
(examples/train_flash_sdxl.py:239-267), SD3: 16-ch post-mid sample-space
features with one extra stage (examples/train_flash_sd3.py:144-183), Pixart:
4-ch latents (examples/train_flash_pixart.py:276-325). Here it's a proper
configurable module (NHWC): repeated [conv k4 s2 → GroupNorm(4) → SiLU]
stages (no norm on the first, matching the reference stacks) and a valid k4
conv to one logit per spatial position, flattened to [B, N_logits].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from pydantic.dataclasses import dataclass

from ..config import BaseConfig


@dataclass
class DiscriminatorConfig(BaseConfig):
    feature_dim: int = 256  # SDXL: 256; SD3/Pixart: 64
    num_stages: int = 3  # SDXL/Pixart: 3; SD3: 4
    norm_groups: int = 4


def sdxl_discriminator_config(**kw) -> DiscriminatorConfig:
    return DiscriminatorConfig(**dict(dict(feature_dim=256, num_stages=3), **kw))


def sd3_discriminator_config(**kw) -> DiscriminatorConfig:
    return DiscriminatorConfig(**dict(dict(feature_dim=64, num_stages=4), **kw))


def pixart_discriminator_config(**kw) -> DiscriminatorConfig:
    return DiscriminatorConfig(**dict(dict(feature_dim=64, num_stages=3), **kw))


class ConvDiscriminator(nn.Module):
    config: DiscriminatorConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        ch = cfg.feature_dim
        for i in range(cfg.num_stages):
            x = nn.Conv(
                ch * (2**i), (4, 4), strides=(2, 2), padding=1, use_bias=False,
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            if i > 0:
                g = cfg.norm_groups
                scale = self.param(f"gn_{i}_scale", nn.initializers.ones, (x.shape[-1],))
                bias = self.param(f"gn_{i}_bias", nn.initializers.zeros, (x.shape[-1],))
                from ..ops import group_norm

                x = group_norm(x, g, scale, bias)
            x = nn.silu(x)
        if x.shape[1] < 4 or x.shape[2] < 4:
            raise ValueError(
                f"discriminator input too small: features reduced to "
                f"{x.shape[1]}x{x.shape[2]} before the 4x4 VALID head — "
                f"reduce num_stages or feed larger feature maps"
            )
        x = nn.Conv(
            1, (4, 4), strides=(1, 1), padding="VALID", use_bias=False,
            dtype=self.dtype, name="conv_out",
        )(x)
        return x.reshape(x.shape[0], -1).astype(jnp.float32)
