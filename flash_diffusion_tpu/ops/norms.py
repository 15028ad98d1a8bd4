"""Normalization ops (GroupNorm / LayerNorm / AdaLN modulation helpers).

The reference gets GroupNorm from cuDNN via torch (SURVEY.md §2 intro maps
that obligation to XLA/Pallas here). On TPU, XLA fuses the two-pass
reduction + affine + activation into the surrounding convs well; these are
plain-jnp implementations with fp32 statistics, NHWC layout (TPU conv
layout), shaped so XLA's fusion does the rest.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def group_norm(
    x: jnp.ndarray,
    num_groups: int,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
    act: Optional[str] = None,
) -> jnp.ndarray:
    """GroupNorm over NHWC with fp32 statistics and optional fused SiLU.

    Args:
      x: [B, H, W, C] (or [B, S, C]).
      scale/bias: [C].
    """
    orig_dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    spatial = x.shape[1:-1]
    g = num_groups
    xf = x.astype(jnp.float32).reshape(b, -1, g, c // g)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, *spatial, c)
    out = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if act == "silu":
        out = out * (1.0 / (1.0 + jnp.exp(-out)))
    return out.astype(orig_dtype)


def layer_norm(
    x: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm over the last dim, fp32 statistics, optionally affine-free
    (AdaLN blocks use elementwise_affine=False + external modulation)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    out = (xf - mean) / jnp.sqrt(var + eps)
    if scale is not None:
        out = out * scale.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """AdaLN modulation x·(1+scale) + shift with [B, C] params over [B, S, C]."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]
