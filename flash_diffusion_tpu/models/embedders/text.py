"""Text conditioners: CLIP (plain / with-projection) and T5.

Re-derivations of the reference embedders
(reference: src/flash/models/embedders/clip/clip_embedder_model.py:10-201,
t5/t5_embedder_model.py:11-104) over our first-party encoders. Tokenization
is host-side (data pipeline or a user-supplied tokenizer); the embedders
consume integer token ids ``batch[input_key_ids]`` so the whole conditioning
pass stays inside jit.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
from pydantic.dataclasses import dataclass

from ..text_encoders import CLIPTextConfig, CLIPTextModel, T5Config, T5Encoder
from .base import BaseConditionerConfig, Conditioner


@dataclass
class ClipEmbedderConfig(BaseConditionerConfig):
    text_embedder_config: Optional[dict] = None  # CLIPTextConfig kwargs
    layer: str = "last"  # last | pooled | hidden
    layer_idx: Optional[int] = None  # for layer == "hidden" (e.g. -2 = penultimate)
    always_return_pooled: bool = False
    use_projection: bool = False  # SDXL text_encoder_2: project pooled output

    def __post_init__(self):
        super().__post_init__()
        if self.layer == "hidden":
            assert self.layer_idx is not None, "layer_idx required for hidden select"


class ClipEmbedder(Conditioner):
    """CLIP text conditioner. crossattn ← selected hidden state;
    vector ← pooled (projected when use_projection)."""

    def __init__(self, config: ClipEmbedderConfig):
        super().__init__(config)
        enc_cfg = CLIPTextConfig(**(config.text_embedder_config or {}))
        if config.use_projection and enc_cfg.projection_dim is None:
            enc_cfg.projection_dim = enc_cfg.hidden_size
        self.encoder_config = enc_cfg
        self.module = CLIPTextModel(enc_cfg)
        self.ids_key = f"{config.input_key}_ids"

    def init(self, rng, batch):
        return self.module.init(rng, batch[self.ids_key])

    def embed(self, params, batch):
        cfg = self.config
        out = self.module.apply(params, batch[self.ids_key])
        if cfg.layer == "last":
            hidden = out["last_hidden_state"]
        elif cfg.layer == "pooled":
            hidden = out["pooled_output"][:, None, :]
        else:
            hidden = out["hidden_states"][cfg.layer_idx]
        result = {"crossattn": hidden}
        if cfg.always_return_pooled:
            pooled = out["text_embeds"] if cfg.use_projection else out["pooled_output"]
            result["vector"] = pooled
        return result


@dataclass
class T5TextEmbedderConfig(BaseConditionerConfig):
    text_embedder_config: Optional[dict] = None  # T5Config kwargs
    max_length: int = 120  # Pixart uses 120 T5 tokens
    return_attention_mask: bool = True


class T5TextEmbedder(Conditioner):
    """T5 conditioner: crossattn ← encoder output; also surfaces the padding
    mask as an ``attention_mask`` conditioning key (Pixart consumes it)."""

    def __init__(self, config: T5TextEmbedderConfig):
        super().__init__(config)
        self.encoder_config = T5Config(**(config.text_embedder_config or {}))
        self.module = T5Encoder(self.encoder_config)
        self.ids_key = f"{config.input_key}_ids"
        self.mask_key = f"{config.input_key}_mask"

    def init(self, rng, batch):
        ids = batch[self.ids_key]
        mask = batch.get(self.mask_key, jnp.ones_like(ids))
        return self.module.init(rng, ids, mask)

    def embed(self, params, batch):
        ids = batch[self.ids_key]
        mask = batch.get(self.mask_key, jnp.ones_like(ids))
        hidden = self.module.apply(params, ids, mask)
        out = {"crossattn": hidden}
        if self.config.return_attention_mask:
            out["attention_mask"] = mask
        return out

    def __call__(self, params, batch, force_zero=0.0):
        # zero the embedding but never the mask
        out = self.embed(params, batch)
        keep = 1.0 - jnp.asarray(force_zero, jnp.float32)
        out["crossattn"] = out["crossattn"] * keep.astype(out["crossattn"].dtype)
        return out
