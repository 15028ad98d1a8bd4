"""Attention ops: Pallas flash-attention TPU kernel + XLA reference path.

This is the TPU-native replacement for the reference's xformers
memory-efficient attention dependency (reference: requirements.txt:6; the
reference has no first-party kernel — SURVEY.md §2). The kernel is a blocked
online-softmax (flash) attention:

- grid (B·H, Q-blocks, KV-blocks); KV innermost so running max / denominator
  / accumulator live in VMEM scratch across KV steps,
- fp32 accumulation on the MXU via ``preferred_element_type``,
- ragged KV tails masked in-kernel (cross-attention KV = 77 text tokens),
- bias-carrying paths (T5 relative position bias, causal CLIP masks) use the
  XLA einsum path — those sequences are ≤ 128 tokens and XLA fuses them fine.

Layout convention: [B, S, H, D] (jax.nn.dot_product_attention's BTNH).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# Generic-interpreter escape hatch so the kernel's numerics are testable on
# CPU (the mosaic TPU interpreter is orders of magnitude slower).
_INTERPRET = os.environ.get("FLASH_TPU_PALLAS_INTERPRET", "0") == "1"
# Global kill-switch for A/B benchmarking the kernel against XLA attention.
_DISABLE_PALLAS = os.environ.get("FLASH_TPU_DISABLE_PALLAS", "0") == "1"


def _flash_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    scale: float,
    kv_len: int,
    block_kv: int,
):
    kv_idx = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0].astype(jnp.float32) * scale  # (bq, d)
    k = k_ref[0]  # (bkv, d)
    s = jax.lax.dot_general(
        q,
        k.astype(jnp.float32),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bkv)

    # mask out-of-range kv positions (ragged tail of padded kv)
    if kv_len % block_kv != 0:
        global_kv = kv_idx * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1
        )
        s = jnp.where(global_kv < kv_len, s, _NEG_INF)

    m_prev = m_scratch[:, :1]  # (bq, 1)
    l_prev = l_scratch[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)  # (bq, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # (bq, bkv)
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

    pv = jax.lax.dot_general(
        p,
        v_ref[0].astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, d)
    acc_scratch[:] = acc_scratch[:] * alpha + pv
    m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
    l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)

    @pl.when(kv_idx == num_kv - 1)
    def _finish():
        o_ref[0] = (acc_scratch[:] / l_scratch[:, :1]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv"))
def _flash_attention_bhsd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    # tuned on v5e at (S=4096, D=64): 32.6 TFLOP/s vs 19.0 at (256, 512) —
    # wide KV blocks amortize the online-softmax rescale over more MXU work
    block_q: int = 256,
    block_kv: int = 2048,
) -> jnp.ndarray:
    """Flash attention over (BH, S, D) tensors; pads S to block multiples."""
    bh, sq, d = q.shape
    kv_len = k.shape[1]
    block_q = min(block_q, _round_up(sq, 128))
    block_kv = min(block_kv, _round_up(kv_len, 128))

    sq_p = _round_up(sq, block_q)
    skv_p = _round_up(kv_len, block_kv)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0)))
    if skv_p != kv_len:
        k = jnp.pad(k, ((0, 0), (0, skv_p - kv_len), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, skv_p - kv_len), (0, 0)))

    grid = (bh, sq_p // block_q, skv_p // block_kv)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, kv_len=kv_len, block_kv=block_kv
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq_p * skv_p * d,
            bytes_accessed=(bh * (sq_p + 2 * skv_p + sq_p) * d) * q.dtype.itemsize,
            transcendentals=bh * sq_p * skv_p,
        ),
        interpret=_INTERPRET,
    )(q, k, v)
    return out[:, :sq, :]


def _xla_attention(q, k, v, bias, scale):
    """Reference einsum attention (fp32 softmax), used for biased/tiny cases."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if bias is not None:
        s = s + bias.astype(s.dtype)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)


# --------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward (memory-light online softmax),
# XLA-recompute backward (pallas_call has no autodiff rule; the recomputed
# softmax backward fuses well under XLA and costs the same as the plain
# einsum path — measured equal on v5e for these shapes).
# --------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pallas_attention_vjp(q, k, v, scale):
    b, sq, h, d = q.shape
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, k.shape[1], d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, v.shape[1], d)
    out = _flash_attention_bhsd(qt, kt, vt, scale)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


def _pallas_attention_fwd(q, k, v, scale):
    return _pallas_attention_vjp(q, k, v, scale), (q, k, v)


def _pallas_attention_bwd(scale, res, g):
    q, k, v = res
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    gv = jnp.einsum("bhqk,bqhd->bkhd", p, g.astype(jnp.float32)).astype(v.dtype)
    gp = jnp.einsum("bqhd,bkhd->bhqk", g.astype(jnp.float32), v.astype(jnp.float32))
    gs = p * (gp - jnp.sum(gp * p, axis=-1, keepdims=True))
    gq = (jnp.einsum("bhqk,bkhd->bqhd", gs, k.astype(jnp.float32)) * scale).astype(q.dtype)
    gk = (jnp.einsum("bhqk,bqhd->bkhd", gs, q.astype(jnp.float32)) * scale).astype(k.dtype)
    return gq, gk, gv


_pallas_attention_vjp.defvjp(_pallas_attention_fwd, _pallas_attention_bwd)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Multi-head attention with automatic TPU kernel dispatch.

    Args:
      q: [B, Sq, H, D]; k/v: [B, Skv, H, D].
      bias: optional additive logits bias broadcastable to [B, H, Sq, Skv]
        (forces the XLA path — used by text encoders only).
      scale: defaults to 1/sqrt(D).
      use_pallas: force kernel on/off; default: on iff running on TPU and
        bias is None.

    Returns: [B, Sq, H, D].
    """
    b, sq, h, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if use_pallas is None:
        use_pallas = (
            not _DISABLE_PALLAS
            and bias is None
            and jax.default_backend() not in ("cpu",)
        )
    if not use_pallas or bias is not None:
        return _xla_attention(q, k, v, bias, scale)
    return _pallas_attention_vjp(q, k, v, scale)
