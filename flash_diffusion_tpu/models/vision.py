"""CLIP vision tower (ViT) — for CLIP-score / CLIP-FID evaluation.

The reference defers eval to the external paper; the framework's eval
harness (eval/) computes COCO CLIP-score in-framework, which needs the
image encoder. Standard CLIP ViT: patch conv → [CLS] + pos embeds →
pre-LN transformer → LN → CLS pooled → projection. Importable from HF
``CLIPVisionModelWithProjection`` checkpoints via utils/hf.import_clip_vision.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
from pydantic.dataclasses import dataclass

from ..config import BaseConfig
from ..ops import dot_product_attention, layer_norm


@dataclass
class CLIPVisionConfig(BaseConfig):
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    projection_dim: Optional[int] = 512
    hidden_act: str = "quick_gelu"


class _VisionLayer(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        d = cfg.hidden_size
        h = layer_norm(
            x,
            self.param("ln1_scale", nn.initializers.ones, (d,)),
            self.param("ln1_bias", nn.initializers.zeros, (d,)),
        )
        b, s, _ = h.shape
        hd = d // cfg.num_heads
        dd = lambda name: nn.Dense(d, dtype=self.dtype, name=name)
        q = dd("q_proj")(h).reshape(b, s, cfg.num_heads, hd)
        k = dd("k_proj")(h).reshape(b, s, cfg.num_heads, hd)
        v = dd("v_proj")(h).reshape(b, s, cfg.num_heads, hd)
        x = x + dd("out_proj")(dot_product_attention(q, k, v).reshape(b, s, d))
        h = layer_norm(
            x,
            self.param("ln2_scale", nn.initializers.ones, (d,)),
            self.param("ln2_bias", nn.initializers.zeros, (d,)),
        )
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        if cfg.hidden_act == "quick_gelu":
            h = h * nn.sigmoid(1.702 * h)
        else:
            h = nn.gelu(h, approximate=False)
        return x + nn.Dense(d, dtype=self.dtype, name="fc2")(h)


class CLIPVisionModel(nn.Module):
    """__call__(images [B,H,W,3] normalized) → {pooled, image_embeds}."""

    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        cfg = self.config
        b = images.shape[0]
        d = cfg.hidden_size
        x = nn.Conv(
            d, (cfg.patch_size, cfg.patch_size), strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID", use_bias=False, dtype=self.dtype, name="patch_embedding",
        )(images.astype(self.dtype))
        x = x.reshape(b, -1, d)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (d,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, d)).astype(x.dtype), x], axis=1)
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param("position_embedding", nn.initializers.normal(0.02), (n_pos, d))
        x = x + pos[None, : x.shape[1]]
        x = layer_norm(
            x,
            self.param("pre_ln_scale", nn.initializers.ones, (d,)),
            self.param("pre_ln_bias", nn.initializers.zeros, (d,)),
        )
        for i in range(cfg.num_layers):
            x = _VisionLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(x)
        pooled = layer_norm(
            x[:, 0],
            self.param("post_ln_scale", nn.initializers.ones, (d,)),
            self.param("post_ln_bias", nn.initializers.zeros, (d,)),
        )
        embeds = None
        if cfg.projection_dim is not None:
            embeds = nn.Dense(
                cfg.projection_dim, use_bias=False, dtype=self.dtype, name="visual_projection"
            )(pooled)
        return {"pooled_output": pooled, "image_embeds": embeds}
