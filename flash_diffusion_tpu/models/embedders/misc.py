"""Scalar-metadata and generic-module conditioners.

- ``TimestepsEmbedder``: sinusoidal embedding of scalar metadata columns
  (SDXL original_size / crop_coords / target_size; Pixart resolution /
  aspect-ratio) → "vector" conditioning (reference:
  src/flash/models/embedders/timesteps/timesteps_embedding.py:6-45).
- ``ModuleEmbedder``: arbitrary flax module over a batch key (the reference's
  TorchNNEmbedder builds an nn.Sequential from module-path strings,
  embedders/torch_nn/embedders.py:10-56 — here a small registry of flax
  layers, no dynamic imports).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax.numpy as jnp
from pydantic.dataclasses import dataclass

from ..layers import timestep_embedding
from .base import DIM2CONDITIONING, BaseConditionerConfig, Conditioner


@dataclass
class TimestepsEmbedderConfig(BaseConditionerConfig):
    num_channels: int = 256  # sinusoidal width per scalar
    flip_sin_to_cos: bool = True
    downscale_freq_shift: float = 0.0


class TimestepsEmbedder(Conditioner):
    """[B, k] scalars → [B, k·num_channels] "vector" conditioning."""

    def __init__(self, config: TimestepsEmbedderConfig):
        super().__init__(config)

    def init(self, rng, batch):
        return {}

    def embed(self, params, batch):
        del params
        x = jnp.asarray(batch[self.input_key])
        if x.ndim == 1:
            x = x[:, None]
        b, k = x.shape
        emb = timestep_embedding(
            x.reshape(-1),
            self.config.num_channels,
            flip_sin_to_cos=self.config.flip_sin_to_cos,
            downscale_freq_shift=self.config.downscale_freq_shift,
        )
        return {"vector": emb.reshape(b, k * self.config.num_channels)}


_LAYERS = {
    "Conv": nn.Conv,
    "Dense": nn.Dense,
    "silu": lambda **kw: nn.silu,
    "relu": lambda **kw: nn.relu,
    "gelu": lambda **kw: nn.gelu,
}


@dataclass
class ModuleEmbedderConfig(BaseConditionerConfig):
    # e.g. [{"layer": "Conv", "features": 4, "kernel_size": [3, 3]}, {"layer": "silu"}]
    layers: List[dict] = None
    conditioning_type: Optional[str] = None  # default: inferred from rank


class _Stack(nn.Module):
    specs: tuple

    @nn.compact
    def __call__(self, x):
        for i, spec in enumerate(self.specs):
            spec = dict(spec)
            kind = spec.pop("layer")
            layer = _LAYERS[kind]
            if kind in ("Conv", "Dense"):
                if "kernel_size" in spec:
                    spec["kernel_size"] = tuple(spec["kernel_size"])
                if "strides" in spec:
                    spec["strides"] = tuple(spec["strides"])
                x = layer(**spec, name=f"layer_{i}")(x)
            else:
                x = layer()(x)
        return x


@dataclass
class RawVectorEmbedderConfig(BaseConditionerConfig):
    """Pass scalar metadata straight through as "vector" conditioning —
    used by Pixart, whose DiT embeds resolution/aspect-ratio internally
    (models/dit.py AdaLayerNormSingle num_vector_embeds)."""


class RawVectorEmbedder(Conditioner):
    def init(self, rng, batch):
        return {}

    def embed(self, params, batch):
        del params
        x = jnp.asarray(batch[self.input_key], jnp.float32)
        if x.ndim == 1:
            x = x[:, None]
        return {"vector": x}


class ModuleEmbedder(Conditioner):
    """Config-built flax stack over ``batch[input_key]`` (e.g. a conv over a
    low-res image for concat conditioning)."""

    def __init__(self, config: ModuleEmbedderConfig):
        super().__init__(config)
        self.module = _Stack(tuple(config.layers or ()))

    def init(self, rng, batch):
        return self.module.init(rng, jnp.asarray(batch[self.input_key]))

    def embed(self, params, batch):
        out = self.module.apply(params, jnp.asarray(batch[self.input_key]))
        ctype = self.config.conditioning_type or DIM2CONDITIONING[out.ndim]
        return {ctype: out}
