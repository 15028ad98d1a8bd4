"""Opt-in int8 W8A8 inference quantization (TPU MXU int8 = 2× bf16 rate).

v5e's MXU executes int8·int8→int32 contractions at twice the bf16 rate
(394 vs 197 TOPS), and XLA:TPU lowers ``lax.dot_general`` on int8 operands
with ``preferred_element_type=int32`` to that path directly. This module
quantizes the GEMM-heavy ``LoraDense`` weights of a params tree to
symmetric per-output-channel int8 and lets the layer quantize activations
dynamically per token at apply time — the W8A8 recipe (per-channel weight
+ per-token activation scales) that keeps diffusion transformers usable
at int8.

Strictly explicit and inference-only: nothing dispatches here implicitly —
callers transform a params tree with :func:`quantize_dense` (or
``FlashPipeline.quantize("int8")``) and ``LoraDense`` branches on the
stored kernel's dtype. Training code never sees int8 trees; gradients are
never taken through the quantized path. Everything else (convs, norms,
attention, the LoRA side path, biases) stays at the model's compute dtype.

No reference analog (the reference serves fp16/bf16 via HF pipelines,
reference README.md:316-353); this is a TPU-native serving extension.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import jax.numpy as jnp

# sibling leaf name carrying the per-output-channel weight scale; LoraDense
# looks this up when its "kernel" param arrives as int8
SCALE_KEY = "kernel_scale"

_FLOAT_DTYPES = (jnp.float32, jnp.bfloat16, jnp.float16)


def quantize_weight(w: jnp.ndarray):
    """[K, N] float → (int8 [K, N], f32 [N]) with w ≈ q · scale (per column)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(x: jnp.ndarray, wq: jnp.ndarray, w_scale: jnp.ndarray) -> jnp.ndarray:
    """W8A8 matmul: dynamic per-token activation quant, int32 accumulate.

    x: [..., K] float; wq: [K, N] int8; w_scale: [N] f32. Returns x.dtype.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s_x = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq,
        wq,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * s_x * w_scale).astype(x.dtype)


def quantize_dense(
    params,
    min_dim: int = 256,
    include: Optional[str] = None,
    exclude: Optional[str] = None,
):
    """Quantize eligible Dense kernels of a params tree to int8 in place(-like).

    A kernel is eligible when it is a 2-D float leaf named ``kernel`` with
    both dims ≥ ``min_dim`` (skips tiny embeds/heads where quantization
    buys nothing and costs accuracy), and its '/'-joined module path
    matches ``include`` (default: any) and not ``exclude``. The quantized
    node gains a ``kernel_scale`` sibling; everything else passes through
    untouched. Returns (new_tree, num_quantized).
    """
    inc = re.compile(include) if include else None
    exc = re.compile(exclude) if exclude else None
    count = [0]

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        new = {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        k = new.get("kernel")
        if (
            hasattr(k, "ndim")
            and k.ndim == 2
            and k.dtype in _FLOAT_DTYPES
            and min(k.shape) >= min_dim
            and (inc is None or inc.search(path))
            and (exc is None or not exc.search(path))
        ):
            q, scale = quantize_weight(k)
            new["kernel"] = q
            new[SCALE_KEY] = scale
            count[0] += 1
        return new

    if hasattr(params, "unfreeze"):  # FrozenDict compat
        params = params.unfreeze()
    out = walk(params, "")
    return out, count[0]
