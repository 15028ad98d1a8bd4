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
    xg = x.reshape(b, -1, g, c // g)
    # fp32-accumulated statistics WITHOUT materializing an fp32 copy of the
    # activation (the copy doubles HBM traffic on the 1024² VAE decode path);
    # E[x²]−E[x]² with fp32 accumulators is adequate for unit-scale
    # activations and is what fused GN kernels do.
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True, dtype=jnp.float32)
    mean_sq = jnp.mean(
        xg.astype(jnp.float32) * xg, axis=(1, 3), keepdims=True, dtype=jnp.float32
    )
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    # fold (scale, bias, mean, inv) into one elementwise pass in orig dtype
    w = (inv * scale.astype(jnp.float32).reshape(1, 1, g, c // g)).astype(orig_dtype)
    b_ = (
        bias.astype(jnp.float32).reshape(1, 1, g, c // g) - mean * inv * scale.astype(jnp.float32).reshape(1, 1, g, c // g)
    ).astype(orig_dtype)
    out = (xg * w + b_).reshape(b, *spatial, c)
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
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
    # fp32-accumulated per-row stats; normalization stays in the input dtype
    # (no fp32 copy of the activation — HBM-bandwidth critical at 4096 tokens)
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    mean_sq = jnp.mean(x.astype(jnp.float32) * x, axis=-1, keepdims=True, dtype=jnp.float32)
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    out = (x - mean.astype(orig_dtype)) * inv.astype(orig_dtype)
    if scale is not None:
        out = out * scale.astype(orig_dtype)
    if bias is not None:
        out = out + bias.astype(orig_dtype)
    return out


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """AdaLN modulation x·(1+scale) + shift with [B, C] params over [B, S, C]."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]
