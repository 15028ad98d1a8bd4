"""First-party CLIP text and T5 encoders (flax), for conditioning.

The reference consumes HuggingFace ``transformers`` CLIP/T5 torch models
(reference: src/flash/models/embedders/clip/clip_embedder_model.py:10-201,
t5/t5_embedder_model.py:11-104). Here the encoder bodies are our own flax
modules — jitted XLA graphs with fp32 norm statistics — with converters from
HF torch checkpoints in utils/hf.py. Numerics are golden-tested against
transformers' flax reference implementations on random tiny configs.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from pydantic.dataclasses import dataclass

from ..config import BaseConfig
from ..ops import dot_product_attention, layer_norm


# --------------------------------------------------------------------------
# CLIP text model
# --------------------------------------------------------------------------
@dataclass
class CLIPTextConfig(BaseConfig):
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    hidden_act: str = "quick_gelu"  # OpenAI CLIP-L; OpenCLIP-G uses "gelu"
    projection_dim: Optional[int] = None  # set for WithProjection variants
    eos_token_id: int = 49407


def clip_l_config(**overrides) -> CLIPTextConfig:
    """SD1.5/SDXL text_encoder (CLIP ViT-L/14)."""
    return CLIPTextConfig(**overrides)


def clip_g_config(**overrides) -> CLIPTextConfig:
    """SDXL text_encoder_2 (OpenCLIP bigG), with projection."""
    base = dict(
        hidden_size=1280,
        intermediate_size=5120,
        num_layers=32,
        num_heads=20,
        hidden_act="gelu",
        projection_dim=1280,
    )
    base.update(overrides)
    return CLIPTextConfig(**base)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(name)


class _CLIPLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias):
        cfg = self.config
        d = cfg.hidden_size
        h = layer_norm(
            x,
            self.param("ln1_scale", nn.initializers.ones, (d,)),
            self.param("ln1_bias", nn.initializers.zeros, (d,)),
        )
        dd = lambda name: nn.Dense(d, dtype=self.dtype, name=name)
        b, s, _ = h.shape
        hd = d // cfg.num_heads
        q = dd("q_proj")(h).reshape(b, s, cfg.num_heads, hd)
        k = dd("k_proj")(h).reshape(b, s, cfg.num_heads, hd)
        v = dd("v_proj")(h).reshape(b, s, cfg.num_heads, hd)
        attn = dot_product_attention(q, k, v, bias=bias).reshape(b, s, d)
        x = x + dd("out_proj")(attn)
        h = layer_norm(
            x,
            self.param("ln2_scale", nn.initializers.ones, (d,)),
            self.param("ln2_bias", nn.initializers.zeros, (d,)),
        )
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(cfg.hidden_act)(h)
        return x + nn.Dense(d, dtype=self.dtype, name="fc2")(h)


class CLIPTextModel(nn.Module):
    """Returns (hidden_states tuple incl. embeddings, last_hidden, pooled, projected)."""

    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, output_hidden_states: bool = True):
        cfg = self.config
        b, s = input_ids.shape
        tok = self.param(
            "token_embedding", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.hidden_size)
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02), (cfg.max_positions, cfg.hidden_size)
        )
        x = jnp.take(tok, input_ids, axis=0) + pos[None, :s]
        x = x.astype(self.dtype)

        # causal mask
        causal = jnp.tril(jnp.ones((s, s), bool))
        bias = jnp.where(causal, 0.0, -1e9)[None, None]

        hidden_states = [x]
        for i in range(cfg.num_layers):
            x = _CLIPLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(x, bias)
            hidden_states.append(x)

        last = layer_norm(
            x,
            self.param("final_ln_scale", nn.initializers.ones, (cfg.hidden_size,)),
            self.param("final_ln_bias", nn.initializers.zeros, (cfg.hidden_size,)),
        )
        # pooled: hidden state at the EOS position (argmax of ids == eos)
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = last[jnp.arange(b), eos_pos]
        projected = None
        if cfg.projection_dim is not None:
            projected = nn.Dense(
                cfg.projection_dim, use_bias=False, dtype=self.dtype, name="text_projection"
            )(pooled)
        return {
            "hidden_states": tuple(hidden_states) if output_hidden_states else None,
            "last_hidden_state": last,
            "pooled_output": pooled,
            "text_embeds": projected,
        }


# --------------------------------------------------------------------------
# T5 encoder
# --------------------------------------------------------------------------
@dataclass
class T5Config(BaseConfig):
    vocab_size: int = 32128
    d_model: int = 4096
    d_ff: int = 10240
    d_kv: int = 64
    num_layers: int = 24
    num_heads: int = 64
    relative_buckets: int = 32
    relative_max_distance: int = 128
    layer_norm_eps: float = 1e-6


def t5_xxl_config(**overrides) -> T5Config:
    """T5-v1.1-XXL encoder (Pixart / SD3 text encoder 3)."""
    return T5Config(**overrides)


def _t5_rel_bucket(rel_pos: jnp.ndarray, num_buckets: int, max_distance: int) -> jnp.ndarray:
    """Bidirectional T5 relative position bucketing."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


def _rms(x, scale, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps) * scale).astype(x.dtype)


class _T5Layer(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias):
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        h = _rms(x, self.param("ln1_scale", nn.initializers.ones, (cfg.d_model,)), cfg.layer_norm_eps)
        dd = lambda dim, name: nn.Dense(dim, use_bias=False, dtype=self.dtype, name=name)
        b, s, _ = h.shape
        q = dd(inner, "q")(h).reshape(b, s, cfg.num_heads, cfg.d_kv)
        k = dd(inner, "k")(h).reshape(b, s, cfg.num_heads, cfg.d_kv)
        v = dd(inner, "v")(h).reshape(b, s, cfg.num_heads, cfg.d_kv)
        # T5 uses unscaled attention (scale folded into initialization)
        attn = dot_product_attention(q, k, v, bias=bias, scale=1.0).reshape(b, s, inner)
        x = x + dd(cfg.d_model, "o")(attn)
        h = _rms(x, self.param("ln2_scale", nn.initializers.ones, (cfg.d_model,)), cfg.layer_norm_eps)
        # gated-gelu MLP (T5 v1.1)
        wi0 = dd(cfg.d_ff, "wi_0")(h)
        wi1 = dd(cfg.d_ff, "wi_1")(h)
        h = nn.gelu(wi0, approximate=True) * wi1
        return x + dd(cfg.d_model, "wo")(h)


class T5Encoder(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None):
        cfg = self.config
        b, s = input_ids.shape
        tok = self.param("token_embedding", nn.initializers.normal(1.0), (cfg.vocab_size, cfg.d_model))
        x = jnp.take(tok, input_ids, axis=0).astype(self.dtype)

        # shared relative position bias from layer 0
        pos = jnp.arange(s)
        rel = pos[None, :] - pos[:, None]  # memory - query
        buckets = _t5_rel_bucket(rel, cfg.relative_buckets, cfg.relative_max_distance)
        rel_emb = self.param(
            "relative_attention_bias",
            nn.initializers.normal(1.0),
            (cfg.relative_buckets, cfg.num_heads),
        )
        bias = jnp.take(rel_emb, buckets, axis=0).transpose(2, 0, 1)[None]  # [1,H,S,S]
        if attention_mask is not None:
            bias = bias + jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)

        for i in range(cfg.num_layers):
            x = _T5Layer(cfg, dtype=self.dtype, name=f"layer_{i}")(x, bias)
        x = _rms(
            x, self.param("final_ln_scale", nn.initializers.ones, (cfg.d_model,)), cfg.layer_norm_eps
        )
        return x
