"""T2I-Adapter: control-image → per-down-block residual features.

First-party flax re-design of the diffusers T2IAdapter the reference wraps
(reference: src/flash/models/adapters/t2i_adapter.py:7-26; consumed by the
UNet as ``down_intrablock_additional_residuals``, models/unets/unet.py:99).
Architecture (full_adapter style): pixel-unshuffle ×8 → conv_in → per level
[2 residual conv blocks] with stride-2 downsample between levels, emitting
one NHWC feature map per UNet down level.
"""

from __future__ import annotations

from dataclasses import field
from typing import List

import flax.linen as nn
import jax.numpy as jnp
from pydantic.dataclasses import dataclass

from ..config import BaseConfig


@dataclass
class T2IAdapterConfig(BaseConfig):
    in_channels: int = 3
    channels: List[int] = field(default_factory=lambda: [320, 640, 1280, 1280])
    num_res_blocks: int = 2
    downscale_factor: int = 8


def pixel_unshuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // factor, w // factor, factor * factor * c)


class _AdapterResBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="block1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="block2")(h)
        return x + h


class T2IAdapter(nn.Module):
    """__call__(control [B,H,W,3]) → [features per level] (NHWC, matching the
    UNet down-block resolutions H/8, H/16, ...)."""

    config: T2IAdapterConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        cfg = self.config
        x = pixel_unshuffle(x.astype(self.dtype), cfg.downscale_factor)
        features = []
        for lvl, ch in enumerate(cfg.channels):
            if lvl == 0:
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
            else:
                x = nn.Conv(
                    ch, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                    name=f"down_{lvl}",
                )(x)
            for j in range(cfg.num_res_blocks):
                x = _AdapterResBlock(ch, dtype=self.dtype, name=f"res_{lvl}_{j}")(x)
            features.append(x)
        return features
