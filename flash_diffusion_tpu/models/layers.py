"""Shared neural building blocks (flax.linen, NHWC, bf16-friendly).

First-party re-implementations of the blocks the reference borrows from
diffusers (UNet resnets / spatial transformers / timestep embeddings —
reference: src/flash/models/unets/unet.py wraps diffusers bodies; here the
bodies are ours). Layout is NHWC (TPU conv layout); attention runs through
the Pallas kernel in ops.attention; normalization statistics are fp32.
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import dot_product_attention, group_norm, layer_norm
from ..ops.gemm import down_proj_gemm, geglu_down_proj
from ..ops.gemm import _geglu_h as _geglu_fallback_h
from ..quant import int8_conv, int8_matmul


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, diffusers ``Timesteps`` semantics.

    SD-family default: flip_sin_to_cos=True, freq_shift=0.
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    emb = scale * emb
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class LoraDense(nn.Module):
    """``nn.Dense`` drop-in (same param names/inits → identical param tree
    and checkpoint border) that additionally reads an OPTIONAL low-rank
    factor pair from the ``"lora"`` variable collection and applies it as a
    side path: ``y = x·W (+bias) + (x·A)·B``.

    This is the TPU-first alternative to weight-merged LoRA for training:
    merging (reference: peft ``add_adapter`` materializes per-module deltas;
    our ``lora.merge_lora`` materializes a full merged tree) costs a
    params-sized HBM temp per step (~3.5 GB for SDXL bf16) plus the write/
    read bandwidth; the side path adds only rank-r matmuls (~r/d extra
    FLOPs) and lets autodiff produce dA/dB directly without a params-sized
    cotangent contraction. The ``lora`` collection mirrors the params tree:
    ``{...module scopes..., "kernel": {"a": [in, r], "b": [r, out]}}`` —
    exactly ``lora.init_lora``'s layout (fold any alpha/rank scaling into
    ``b`` before ``apply``, see ``lora.scale_lora``).
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    # opt-in Pallas GEMM for the deep-contraction/narrow-output shape family
    # XLA schedules badly (the GEGLU down projection; see ops/gemm.py)
    down_proj: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias
            else None
        )
        ab = None
        if not self.is_initializing() and self.has_variable("lora", "kernel"):
            ab = self.get_variable("lora", "kernel")
        if kernel.dtype == jnp.int8:
            # opt-in W8A8 inference path: the params tree was transformed by
            # quant.quantize_dense (per-output-channel weight scale stored
            # as a sibling leaf); activations quantize per token at apply
            # time and the contraction runs int8·int8→int32 on the MXU
            w_scale = self.get_variable("params", "kernel_scale")
            x = x.astype(self.dtype)
            y = int8_matmul(x, kernel, w_scale)
            if ab is not None:
                a = ab["a"].astype(y.dtype)
                b = ab["b"].astype(y.dtype)
                y = y + (x @ a) @ b
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        if self.down_proj:
            y = down_proj_gemm(x, kernel, bias)
            bias = None  # folded into the kernel's final store
        else:
            y = x @ kernel
        if ab is not None:
            a = ab["a"].astype(y.dtype)
            b = ab["b"].astype(y.dtype)
            y = y + (x @ a) @ b
        if bias is not None:
            y = y + bias
        return y


class TimestepEmbedMLP(nn.Module):
    """linear → SiLU → linear time-embedding MLP (diffusers TimestepEmbedding)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="linear_2")(x)


class GroupNorm(nn.Module):
    """Parameterized GroupNorm with optional fused SiLU (fp32 stats)."""

    num_groups: int = 32
    eps: float = 1e-5
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm(x, self.num_groups, scale, bias, self.eps, act=self.act)


class LayerNorm(nn.Module):
    """LayerNorm; set ``affine=False`` for AdaLN-modulated blocks."""

    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        if not self.affine:
            return layer_norm(x, eps=self.eps)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return layer_norm(x, scale, bias, eps=self.eps)


class QConv(nn.Module):
    """``nn.Conv``-compatible NHWC conv (identical param layout/init) with an
    int8 W8A8 branch when the stored kernel arrives quantized (quant.py).

    Only the call-shapes the model bodies use: square kernels, symmetric
    int or SAME padding, optional strides."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 0  # int (symmetric) or "SAME"
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, x.shape[-1], self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias
            else None
        )
        pad = (
            self.padding
            if isinstance(self.padding, str)
            else ((self.padding, self.padding), (self.padding, self.padding))
        )
        if kernel.dtype == jnp.int8:
            w_scale = self.get_variable("params", "kernel_scale")
            y = int8_conv(
                x.astype(self.dtype), kernel, w_scale, self.strides, pad
            )
        else:
            x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
            y = jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=tuple(self.strides),
                padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class ResnetBlock2D(nn.Module):
    """GN→SiLU→conv3x3 →(+time)→ GN→SiLU→conv3x3 (+skip 1x1 when widening)."""

    out_channels: int
    time_emb_dim: Optional[int] = None
    groups: int = 32
    eps: float = 1e-5  # UNet default; diffusers VAE resnets use 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        h = GroupNorm(self.groups, eps=self.eps, act="silu", name="norm1")(x)
        h = QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        if temb is not None:
            temb = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + temb[:, None, None, :]
        h = GroupNorm(self.groups, eps=self.eps, act="silu", name="norm2")(h)
        h = QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = QConv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return QConv(
            self.out_channels, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="conv"
        )(x)


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2× nearest upsampling as broadcast+reshape (cheaper lowering on TPU
    than gather-based jax.image.resize)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class _FoldedUpConv(nn.Module):
    """nearest-×2 upsample + 3×3 conv, computed at LOW resolution.

    Exact sub-pixel reorganization: out[2i+di, 2j+dj] reads only input rows
    {i-1, i} (di=0) or {i, i+1} (di=1) of the ORIGINAL grid, with kernel taps
    summed per parity — so the whole op is one low-res 3×3 conv to 4·C
    channels (one zero tap row/col per parity) followed by depth-to-space.
    Same FLOPs as the high-res conv, but the ×2-broadcast + pad + copy
    materializations of the upsampled tensor disappear (the r3 VAE-decode
    trace showed ~19 ms/image of those at 1024²), and the conv's output is
    4×-wider (better MXU lane use at batch 1).

    Param layout is identical to ``nn.Conv`` (``kernel`` [3,3,Cin,Cout] +
    ``bias``), so the diffusers checkpoint border and the param tree are
    unchanged; folding happens on the fly (81·Cin·Cout multiply-adds).
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        # DEFAULT OFF: the r3 on-chip A/B showed the fold is a net LOSS in the
        # scanned VAE decode (b8 decode 0.73 s -> 0.91 s) and neutral on the
        # batch-8 denoiser — the 4×C-wide low-res conv lowers worse than the
        # broadcast chains it removes. Opt in with FLASH_TPU_FOLDED_UPSAMPLE=1.
        if os.environ.get("FLASH_TPU_FOLDED_UPSAMPLE", "0") != "1":
            # default path: plain nearest-×2 + high-res conv
            x = nearest_upsample_2x(x)
            xk, kernel2, bias2 = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
            y = jax.lax.conv_general_dilated(
                xk, kernel2, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias2
        if kernel.dtype == jnp.int8:
            # int8 trees (quant.py): the tap fold needs float weights, so
            # this op dequantizes on the fly — exactness over int8 speed
            kernel = kernel.astype(jnp.float32) * self.get_variable(
                "params", "kernel_scale"
            )
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        # per-parity tap folding: row taps of the high-res conv collapse onto
        # low-res rows {i-1, i} (parity 0: W0 | W1+W2) or {i, i+1}
        # (parity 1: W0+W1 | W2); same along columns.
        r0 = jnp.array([[1, 0, 0], [0, 1, 1], [0, 0, 0]], kernel.dtype)
        r1 = jnp.array([[0, 0, 0], [1, 1, 0], [0, 0, 1]], kernel.dtype)
        rows = jnp.stack([r0, r1])  # [2, 3(a), 3(k)]
        # K4[a, b, i, di, dj, o] = Σ_{k,l} rows[di,a,k]·rows[dj,b,l]·W[k,l,i,o]
        k4 = jnp.einsum("dak,ebl,klio->abideo", rows, rows, kernel)
        k4 = k4.reshape(3, 3, cin, 4 * self.features)
        y = jax.lax.conv_general_dilated(
            x,
            k4,
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # depth-to-space: channel groups are (di, dj)-major
        y = y.reshape(b, h, w, 2, 2, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, self.features)
        return y + bias


class Upsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return _FoldedUpConv(self.out_channels, dtype=self.dtype, name="conv")(x)


class _ProjParams(nn.Module):
    """Param holder matching ``LoraDense``'s tree exactly (same names, shapes,
    initializers → identical init RNG draws and checkpoint border) without
    computing the projection — used by the fused-QKV path so three sibling
    projections can share ONE activation read (see ``Attention``)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, cin):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (cin, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias
            else None
        )
        ab = None
        if not self.is_initializing() and self.has_variable("lora", "kernel"):
            ab = self.get_variable("lora", "kernel")
        scale = None
        if kernel.dtype == jnp.int8:
            scale = self.get_variable("params", "kernel_scale")
        return kernel, bias, ab, scale


class Attention(nn.Module):
    """Multi-head attention (self or cross) over token sequences [B, S, C]."""

    num_heads: int
    head_dim: Optional[int] = None
    out_dim: Optional[int] = None
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, bias=None):
        context = x if context is None else context
        inner = (self.head_dim or x.shape[-1] // self.num_heads) * self.num_heads
        out_dim = self.out_dim or x.shape[-1]
        # FLASH_TPU_FUSED_QKV=1 (self-attention only): one [C, 3·inner] GEMM
        # instead of three — the activation ([B, S, C], the dominant operand
        # at self-attn shapes) streams from HBM once instead of three times.
        # Param tree is unchanged (_ProjParams mirrors LoraDense), so
        # checkpoints/LoRA/exports are unaffected by the gate.
        if os.environ.get("FLASH_TPU_FUSED_QKV", "0") == "1" and context is x:
            parts = [
                _ProjParams(inner, self.qkv_bias, name=n)(x.shape[-1])
                for n in ("to_q", "to_k", "to_v")
            ]
            kernels = []
            for kern, _b, _ab, scale in parts:
                if kern.dtype == jnp.int8:  # dequantize int8 trees on the fly
                    kern = kern.astype(jnp.float32) * scale
                kernels.append(kern)
            xq, *kernels = nn.dtypes.promote_dtype(x, *kernels, dtype=self.dtype)
            qkv = xq @ jnp.concatenate(kernels, axis=-1)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            outs = []
            for proj, (_k, b, ab, _s) in zip((q, k, v), parts):
                if ab is not None:
                    a_ = ab["a"].astype(proj.dtype)
                    b_ = ab["b"].astype(proj.dtype)
                    proj = proj + (xq @ a_) @ b_
                if b is not None:
                    proj = proj + b.astype(proj.dtype)
                outs.append(proj)
            q, k, v = outs
        else:
            dense = lambda name: LoraDense(
                inner, use_bias=self.qkv_bias, dtype=self.dtype, name=name
            )
            q = dense("to_q")(x)
            k = dense("to_k")(context)
            v = dense("to_v")(context)
        b, sq, _ = q.shape
        h = self.num_heads
        d = inner // h
        q = q.reshape(b, sq, h, d)
        k = k.reshape(b, context.shape[1], h, d)
        v = v.reshape(b, context.shape[1], h, d)
        out = dot_product_attention(q, k, v, bias=bias)
        out = out.reshape(b, sq, inner)
        return LoraDense(out_dim, dtype=self.dtype, name="to_out")(out)


def _gate_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-gelu semantics at the compute precision in use.

    diffusers' GEGLU gates with F.gelu (erf form). On TPU the erf lowering is
    a slow rational: measured 48 ms of a 517 ms SDXL 1024² batch-8 forward
    (9%), while tanh-gelu hits the fast tanh path and costs ~nothing. The
    tanh form deviates from exact gelu by ≤ 4.74e-4 absolute (at x≈2.69,
    where bf16 ulp is 0.0156) — under bf16 compute the difference is below
    the representation's own rounding, so bf16 uses tanh and fp32 (parity
    tests, imports) keeps exact erf.
    """
    if x.dtype == jnp.bfloat16:
        return nn.gelu(x, approximate=True)
    return nn.gelu(x, approximate=False)


class GEGLUFeedForward(nn.Module):
    """GEGLU MLP: proj to 2·inner, gelu-gate, project back."""

    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        inner = dim * self.mult
        x = LoraDense(inner * 2, dtype=self.dtype, name="proj_in")(x)
        # Fused gelu-gate + down-projection Pallas GEMM (ops/gemm.py): the
        # gate is computed in-register inside the contraction loop, fixing
        # BOTH r3 losses on this op — the 46 TF/s XLA emitter schedule and
        # the split producer fusion of the r3 down-GEMM attempt. bf16 only
        # (tanh-gelu — _gate_gelu's own bf16 semantics); other dtypes and
        # off-family shapes fall back below. _ProjParams mirrors LoraDense's
        # param tree exactly, so checkpoints/LoRA/exports are unaffected.
        if os.environ.get("FLASH_TPU_FFN_FUSED", "0") == "1" and x.dtype == jnp.bfloat16:
            kern, bias, ab, scale = _ProjParams(dim, True, name="proj_out")(inner)
            if kern.dtype == jnp.int8:  # int8 trees: dequantize on the fly
                kern = kern.astype(jnp.float32) * scale
            x2k, kern, bias = nn.dtypes.promote_dtype(x, kern, bias, dtype=self.dtype)
            y = geglu_down_proj(x2k, kern, bias)
            if ab is not None:
                h = _geglu_fallback_h(x2k)
                y = y + (h @ ab["a"].astype(y.dtype)) @ ab["b"].astype(y.dtype)
            return y
        x, gate = jnp.split(x, 2, axis=-1)
        # diffusers GEGLU gates with EXACT gelu (F.gelu default), not tanh;
        # see _gate_gelu for the bf16 fast path
        x = x * _gate_gelu(gate)
        # Pallas GEMM on the down projection (env-gated for on-chip A/B) —
        # the XLA emitter for this shape family measured 46 TF/s vs 96 for
        # the up-projection (see ops/gemm.py)
        dp = os.environ.get("FLASH_TPU_FFN_DOWN_GEMM", "0") == "1"
        return LoraDense(dim, dtype=self.dtype, down_proj=dp, name="proj_out")(x)


class BasicTransformerBlock(nn.Module):
    """LN→self-attn →LN→cross-attn →LN→GEGLU FF, all residual."""

    num_heads: int
    head_dim: int
    cross_attention: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        h = LayerNorm(name="norm1")(x)
        x = x + Attention(self.num_heads, self.head_dim, dtype=self.dtype, name="attn1")(h)
        if self.cross_attention:
            h = LayerNorm(name="norm2")(x)
            x = x + Attention(self.num_heads, self.head_dim, dtype=self.dtype, name="attn2")(
                h, context=context
            )
        h = LayerNorm(name="norm3")(x)
        x = x + GEGLUFeedForward(dtype=self.dtype, name="ff")(h)
        return x


class SpatialTransformer(nn.Module):
    """diffusers Transformer2DModel for UNets: GN → proj_in → N blocks → proj_out."""

    num_heads: int
    head_dim: int
    depth: int = 1
    cross_attention: bool = True
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        b, hh, ww, c = x.shape
        residual = x
        x = GroupNorm(self.groups, eps=1e-6, name="norm")(x)
        x = LoraDense(c, dtype=self.dtype, name="proj_in")(x.reshape(b, hh * ww, c))
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.num_heads,
                self.head_dim,
                cross_attention=self.cross_attention,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, context=context)
        x = LoraDense(c, dtype=self.dtype, name="proj_out")(x)
        return x.reshape(b, hh, ww, c) + residual
