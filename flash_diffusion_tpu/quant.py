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

# Module scopes whose "kernel" the int8 branch can actually consume.
# 2-D: LoraDense call sites (models/layers.py Attention + GEGLU, mmdit/dit
# FFNs). 4-D: QConv call sites (ResnetBlock / Downsample2D; Upsample2D's
# folded conv dequantizes on the fly). Plain nn.Dense modules (e.g. MMDiT's
# context_embedder) have NO int8 branch — flax would silently upcast a
# quantized kernel WITHOUT its scale — so the transform is allowlist-based:
# unknown scopes are left untouched (fail-safe).
DENSE_INCLUDE = (
    r"/(to_q|to_k|to_v|to_out|to_add_out|proj_in|proj_out"
    r"|ff_in|ff_out|ff_context_in|ff_context_out)$"
)
# NOTE: scope names are only meaningful for the denoiser/VAE bodies —
# transforming OTHER trees (e.g. the DPT depth model, whose plain nn.Conv
# modules are also named conv1/conv2) with convs=True would corrupt them.
CONV_INCLUDE = r"/(conv1|conv2|conv_shortcut|conv|conv_in|conv_out)$"


def quantize_weight(w: jnp.ndarray):
    """Float kernel → (int8, f32 per-output-channel scale), w ≈ q · scale.

    2-D [K, N] reduces over K; 4-D HWIO reduces over (H, W, I)."""
    axes = tuple(range(w.ndim - 1))
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axes)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(x: jnp.ndarray, wq: jnp.ndarray, w_scale: jnp.ndarray) -> jnp.ndarray:
    """W8A8 matmul: dynamic per-token activation quant, int32 accumulate.

    x: [..., K] float; wq: [K, N] int8; w_scale: [N] f32. Returns x.dtype.

    Dispatches the fused-dequant Pallas kernel (ops/gemm.py::int8_gemm —
    scales applied in-register on the output tile) when the shape fits;
    the XLA fallback lowers the per-channel dequant as separate passes,
    which is what erased the MXU's int8 2× in the r3/r4 measurements.
    """
    from .ops.gemm import int8_gemm, int8_gemm_eligible

    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s_x = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    k = x.shape[-1]
    n = wq.shape[1]
    m = 1
    for s in x.shape[:-1]:
        m *= s
    if int8_gemm_eligible(m, k, n):
        y = int8_gemm(
            xq.reshape(m, k), s_x.reshape(m, 1), wq, w_scale.reshape(1, n), None
        )
        return y.reshape(*x.shape[:-1], n).astype(x.dtype)
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
    include: Optional[str] = DENSE_INCLUDE,
    exclude: Optional[str] = None,
    convs: bool = False,
    conv_min_dim: int = 128,
    conv_include: Optional[str] = CONV_INCLUDE,
):
    """Quantize eligible kernels of a params tree to int8 (returns new tree).

    A 2-D ``kernel`` leaf is eligible when both dims ≥ ``min_dim`` (skips
    tiny embeds/heads where quantization buys nothing and costs accuracy)
    and its module path matches ``include`` — which defaults to the
    LoraDense scope allowlist, because only int8-aware modules may receive
    int8 kernels. With ``convs=True``, 4-D HWIO kernels on QConv scopes
    (``conv_include``, min channel dim ``conv_min_dim``) quantize too.
    Quantized nodes gain a ``kernel_scale`` sibling; everything else passes
    through untouched. Returns (new_tree, num_quantized).
    """
    inc = re.compile(include) if include else None
    exc = re.compile(exclude) if exclude else None
    cinc = re.compile(conv_include) if conv_include else None
    count = [0]

    def eligible(k, path):
        if not hasattr(k, "ndim") or k.dtype not in _FLOAT_DTYPES:
            return False
        if exc is not None and exc.search(path):
            return False
        if k.ndim == 2:
            # Root-level "proj_out" is the DiT/MMDiT patch-unembed head: a
            # plain nn.Dense that shares the allowlisted name but has NO
            # int8 branch (flax silently promote-upcasts an int8 kernel
            # WITHOUT its scale → garbage outputs, no error). Every
            # int8-aware LoraDense proj_out lives ≥2 module scopes deep
            # (.../attentions_N/proj_out, .../ff/proj_out), so a depth
            # anchor excludes the head at ANY min_dim — the knob the
            # default dim threshold only accidentally protected.
            if (
                include is DENSE_INCLUDE
                and path.endswith("/proj_out")
                and path.strip("/").count("/") <= 1
            ):
                return False
            return min(k.shape) >= min_dim and (inc is None or bool(inc.search(path)))
        if k.ndim == 4 and convs:
            return min(k.shape[2], k.shape[3]) >= conv_min_dim and (
                cinc is None or bool(cinc.search(path))
            )
        return False

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        new = {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        k = new.get("kernel")
        if k is not None and eligible(k, path):
            q, scale = quantize_weight(k)
            new["kernel"] = q
            new[SCALE_KEY] = scale
            count[0] += 1
        return new

    if hasattr(params, "unfreeze"):  # FrozenDict compat
        params = params.unfreeze()
    out = walk(params, "")
    return out, count[0]


def int8_conv(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    w_scale: jnp.ndarray,
    strides=(1, 1),
    padding="SAME",
) -> jnp.ndarray:
    """W8A8 NHWC conv: per-sample activation scale, int32 accumulate."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True)
    s_x = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=tuple(strides),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * s_x * w_scale).astype(x.dtype)
