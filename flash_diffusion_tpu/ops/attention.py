"""Attention ops: Pallas flash-attention TPU kernels (fwd + bwd) + XLA path.

This is the TPU-native replacement for the reference's xformers
memory-efficient attention dependency (reference: requirements.txt:6; the
reference has no first-party kernel — SURVEY.md §2).

Forward: blocked online-softmax (flash) attention —
- grid (B·H, Q-blocks, KV-blocks); KV innermost so running max / denominator
  / accumulator live in VMEM scratch across KV steps,
- matmuls run with the input dtype (bf16 on TPU) on the MXU with fp32
  accumulation via ``preferred_element_type`` — keeping operands bf16 is the
  difference between full and fractional MXU throughput,
- per-row logsumexp is written as a second output so the backward never
  materializes the [Sq, Skv] probability matrix,
- ragged KV tails masked in-kernel (cross-attention KV = 77 text tokens).

Backward: two flash kernels (no O(S²) memory):
- dKV kernel: grid (B·H, KV-blocks, Q-blocks), Q innermost; recomputes
  pᵀ = exp(K·Qᵀ·scale − lse) blockwise, accumulates dV += pᵀ·dO and
  dK += (pᵀ∘(V·dOᵀ − Δ))·Q·scale in fp32 VMEM scratch,
- dQ kernel: grid (B·H, Q-blocks, KV-blocks), KV innermost; accumulates
  dQ += (p∘(dO·Vᵀ − Δ))·K·scale,
where Δ = rowsum(dO∘O) is precomputed by XLA (a cheap fused reduction).

Bias-carrying paths (T5 relative position bias, causal CLIP masks) use the
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
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# Generic-interpreter escape hatch so the kernel's numerics are testable on
# CPU (the mosaic TPU interpreter is orders of magnitude slower).
_INTERPRET = os.environ.get("FLASH_TPU_PALLAS_INTERPRET", "0") == "1"
# Global kill-switch for A/B benchmarking the kernel against XLA attention.
_DISABLE_PALLAS = os.environ.get("FLASH_TPU_DISABLE_PALLAS", "0") == "1"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fit_block(seq_len: int, max_block: int) -> int:
    """Largest block ≤ max_block (multiple of 128) minimizing the PADDED
    sequence length round_up(seq, block).

    The naive ``min(tuned_block, seq)`` pads to a multiple of the tuned
    block: SD3's joint 4250-token sequence (4096 image + 154 text,
    SURVEY §5 long-context note) rounded up to block_kv=4096 computed
    attention on 8192 KV columns — 2.09× the logical work, 61% of the
    whole MMDiT forward in the r5 device trace. Splitting the 128-rounded
    length over the fewest blocks that fit (4352 = 2 × 2176) removes the
    waste for any ragged shape while leaving exact-fit shapes (4096 ÷
    4096) untouched."""
    s0 = _round_up(seq_len, 128)
    if s0 <= max_block:
        return s0
    j = -(-s0 // max_block)  # fewest blocks of at most max_block
    return _round_up(-(-s0 // j), 128)


def _is_pow2(scale: float) -> bool:
    """True when |scale| is an exact power of two (bf16-lossless to fold)."""
    s = float(scale)
    return s != 0.0 and math.frexp(abs(s))[0] == 0.5


# --------------------------------------------------------------------------
# Forward kernel
# --------------------------------------------------------------------------
def _flash_fwd_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    lse_ref,
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    scale: float,
    kv_len: int,
    block_kv: int,
    skv_p: int,
):
    kv_idx = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    # bf16 operands on the MXU, fp32 accumulation. When scale is an exact
    # power of two (every d = 4ᵏ head: 1/√64 = 0.125, …) it folds into the
    # bf16 q block LOSSLESSLY on the tiny (bq, d) tile, saving a full-tile
    # fp32 multiply over (bq, bkv) per grid step; otherwise it is applied
    # to the fp32 product (more accurate than rounding bf16 q).
    q = q_ref[0]
    if _is_pow2(scale):
        q = q * jnp.asarray(scale, q.dtype)
    s = jax.lax.dot_general(
        q,
        k_ref[0],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bkv)
    if not _is_pow2(scale):
        s = s * scale

    # mask out-of-range kv positions (alignment padding / ragged tail) —
    # the condition is on the PADDED length: kv_valid may be an exact
    # block multiple while later blocks are entirely invalid
    if skv_p != kv_len:
        global_kv = kv_idx * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1
        )
        s = jnp.where(global_kv < kv_len, s, _NEG_INF)

    m_prev = m_scratch[:, :1]  # (bq, 1)
    l_prev = l_scratch[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)  # (bq, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # (bq, bkv) fp32
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype),  # bf16 PV matmul: full MXU rate
        v_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, d)
    acc_scratch[:] = acc_scratch[:] * alpha + pv
    m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
    l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)

    @pl.when(kv_idx == num_kv - 1)
    def _finish():
        l = l_scratch[:, :1]
        o_ref[0] = (acc_scratch[:] / l).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_scratch[:, 0] + jnp.log(l[:, 0])).astype(jnp.float32)


# --------------------------------------------------------------------------
# One-shot forward kernel (short KV)
#
# r3 finding: when the whole KV sequence fits one block, the streaming kernel
# degenerates to num_kv==1 — every grid step runs init+finish and exposes its
# DMAs serially (~4-6 µs/step of overhead on v5e), capping S=1024 self-attn
# at ~10 TFLOP/s. The one-shot kernel does the full softmax in-register with
# no scratch carries; K/V block index is constant per bh so Mosaic keeps it
# VMEM-resident across the q loop. Measured (same scan harness): S=1024
# self-attn 4.16 ms → 2.35 ms; cross-attn (KV=77) 5.6 ms → 2.2 ms.
# --------------------------------------------------------------------------
def _flash_fwd_oneshot_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float, kv_len: int, block_kv: int
):
    q = q_ref[0]
    if _is_pow2(scale):
        q = q * jnp.asarray(scale, q.dtype)
    s = jax.lax.dot_general(
        q,
        k_ref[0],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if not _is_pow2(scale):
        s = s * scale
    if kv_len % block_kv != 0:
        gkv = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(gkv < kv_len, s, _NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    # PV first, divide after: 1/l touches the (bq, d) output tile instead of
    # a full-tile (bq, bkv) fp32 divide on the VPU.
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype),
        v_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)
    lse_ref[0, 0] = (m[:, 0] + jnp.log(l[:, 0])).astype(jnp.float32)


# KV lengths up to this use the one-shot kernel (skv_p ≤ 1024 ⇒ the fp32
# score block at block_q=512 is ≤ 2 MB — far inside the 16 MB scoped VMEM).
_ONESHOT_KV_MAX = int(os.environ.get("FLASH_TPU_ONESHOT_KV_MAX", "1024"))


# --------------------------------------------------------------------------
# Packed-layout forward ([B, S, H·D] — the projection's native output)
#
# The r3 SDXL trace showed the q/k/v/out head transposes ([B,S,H,D] ⇄
# [B·H,S,D]) costing ~28 ms per batch-8 forward at roofline bandwidth —
# pure relayout traffic the per-head kernels force. These kernels instead
# block the FULL feature axis (block last dim = H·D = the whole array dim,
# so every HBM stream is contiguous and min-tile-legal) and loop heads
# *inside* the grid step over static 64/128-wide lane slices. Per-head
# running max / denominator live in lane columns of one (bq, 128) scratch.
#
# Inference-only by design: the custom-VJP *primal* dispatches here (no lse
# output needed), while differentiation keeps the BHSD kernels whose saved
# tensors feed the flash backward without extra relayouts.
# --------------------------------------------------------------------------
def _flash_fwd_packed_kernel(
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
    num_heads: int,
    head_dim: int,
):
    kv_idx = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # (bq, H·D)
    k = k_ref[0]  # (bkv, H·D)
    v = v_ref[0]
    ragged = kv_len % block_kv != 0
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = (
            jax.lax.dot_general(
                q[:, sl],
                k[:, sl],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # (bq, bkv)
        if ragged:
            gkv = kv_idx * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 1
            )
            s = jnp.where(gkv < kv_len, s, _NEG_INF)
        m_prev = m_scratch[:, h : h + 1]
        l_prev = l_scratch[:, h : h + 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype),
            v[:, sl],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scratch[:, sl] = acc_scratch[:, sl] * alpha + pv
        m_scratch[:, h : h + 1] = m_new
        l_scratch[:, h : h + 1] = l_new

    @pl.when(kv_idx == num_kv - 1)
    def _finish():
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            l = l_scratch[:, h : h + 1]
            o_ref[0, :, sl] = (acc_scratch[:, sl] / l).astype(o_ref.dtype)


def _flash_fwd_oneshot_packed_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    *,
    scale: float,
    kv_len: int,
    block_kv: int,
    num_heads: int,
    head_dim: int,
):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    ragged = kv_len % block_kv != 0
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = (
            jax.lax.dot_general(
                q[:, sl],
                k[:, sl],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        if ragged:
            gkv = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(gkv < kv_len, s, _NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype),
            v[:, sl],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o / l).astype(o_ref.dtype)


# Conservative scoped-VMEM budget for the packed block search (the real
# limit is ~16 MB; transient score/prob blocks double-count here).
_PACKED_VMEM_BUDGET = 10.5 * 2**20


def _packed_vmem(bq: int, bkv: int, hd: int, itemsize: int, oneshot: bool) -> int:
    # Pipelined in/out blocks are double-buffered by Mosaic (x2 on the io
    # terms) — measured on-chip: the streaming kernel's real stack at
    # (512, 1024, hd=640) is 17.78M where the single-buffer model said 9.9M.
    io = 2 * (2 * bq * hd * itemsize + 2 * bkv * hd * itemsize)  # q+o, k+v
    return (
        io
        + (0 if oneshot else 4 * bq * hd)  # fp32 acc carry
        + 2 * 4 * bq * bkv  # fp32 score + prob transients
        + (0 if oneshot else 2 * 4 * bq * 128)  # m/l scratch
    )


def _packed_blocks(sq: int, kv_len: int, hd: int, itemsize: int, oneshot: bool):
    """(block_q, block_kv) maximizing block area within the VMEM budget.

    One-shot mode fixes block_kv to the whole padded KV axis and searches
    block_q only; returns None when nothing fits (callers fall back to the
    per-head BHSD kernels).
    """
    if oneshot:
        bkv = _round_up(kv_len, 128)
        for bq in (512, 256, 128):
            if _packed_vmem(bq, bkv, hd, itemsize, True) <= _PACKED_VMEM_BUDGET:
                return bq, bkv
        return None
    best = None
    for bq in (512, 256, 128):
        for bkv in (2048, 1024, 512, 256):
            if _packed_vmem(bq, bkv, hd, itemsize, False) > _PACKED_VMEM_BUDGET:
                continue
            if best is None or bq * bkv > best[0] * best[1]:
                best = (bq, bkv)
    return best


def _packed_eligible(q4) -> bool:
    if os.environ.get("FLASH_TPU_ATTN_PACKED", "0") != "1":
        return False
    _, _, h, d = q4.shape
    if os.environ.get("FLASH_TPU_ATTN_PACKED_ANY_D", "0") == "1":
        # lane-tile-unaligned head dims (Pixart 72, SD1.5 40/80/160): the
        # static slices are legal Mosaic but their relayout cost is unproven
        # — separate experimental gate until measured on-chip
        return h >= 2 and d % 8 == 0
    return h >= 2 and d in (64, 128)


# Short-KV cross-attention (text context, 77 tokens) through the PACKED
# one-shot kernel by default: the per-head one-shot grid degenerates to
# (B·H × q-blocks) tiny steps whose DMA/grid overhead dominates — the r3
# trace showed S=4096 KV=77 cross at ~20× its byte cost (2.2 ms where the
# q/out streams alone are ~0.1 ms). Packing all heads per block divides
# the grid step count by H and deletes the q/k/v/out head transposes for
# this call. The r3 objection to packed SELF-attention (per-head K/V VMEM
# residency across the q loop) does not apply: the whole packed K/V block
# at KV ≤ 256 is ≤ h·d·256·2·2 bytes ≈ 1.3 MB. Inference-primal only
# (same rationale as _packed_eligible).
_PACKED_CROSS_KV_MAX = int(os.environ.get("FLASH_TPU_PACKED_CROSS_KV_MAX", "256"))


def _packed_cross_eligible(q4, kv_len: int) -> bool:
    if os.environ.get("FLASH_TPU_ATTN_PACKED_CROSS", "1") != "1":
        return False
    _, _, h, d = q4.shape
    if _round_up(kv_len, 128) > _PACKED_CROSS_KV_MAX or h < 2:
        return False
    if os.environ.get("FLASH_TPU_ATTN_PACKED_ANY_D", "0") == "1":
        # lane-unaligned head dims (Pixart 72, SD1.5 40/80/160) — legal
        # static slices, relayout cost unproven; experimental gate
        return d % 8 == 0
    return d in (64, 128)


def _flash_fwd_packed(q4, k4, v4, scale: float):
    """Forward-only flash attention in [B, Sq, H, D] without head transposes.

    Reshapes to the projection-native [B, S, H·D] (free — same layout),
    runs the packed kernel, returns [B, Sq, H, D].
    """
    b, sq, h, d = q4.shape
    kv_len = k4.shape[1]
    hd = h * d
    q = q4.reshape(b, sq, hd)
    k = k4.reshape(b, kv_len, hd)
    v = v4.reshape(b, kv_len, hd)

    oneshot = _round_up(kv_len, 128) <= _ONESHOT_KV_MAX
    blocks = _packed_blocks(sq, kv_len, hd, q.dtype.itemsize, oneshot)
    if blocks is None:
        return None
    block_q, block_kv = blocks
    block_q = min(block_q, _round_up(sq, 128))
    sq_p = _round_up(sq, block_q)
    skv_p = _round_up(kv_len, block_kv)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0)))
    if skv_p != kv_len:
        k = jnp.pad(k, ((0, 0), (0, skv_p - kv_len), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, skv_p - kv_len), (0, 0)))

    q_spec = pl.BlockSpec((1, block_q, hd), lambda bi, i, *rest: (bi, i, 0), memory_space=pltpu.VMEM)
    kv_spec_stream = pl.BlockSpec((1, block_kv, hd), lambda bi, i, j: (bi, j, 0), memory_space=pltpu.VMEM)
    kv_spec_one = pl.BlockSpec((1, block_kv, hd), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, sq_p, hd), q.dtype)
    cost = pl.CostEstimate(
        flops=4 * b * h * sq_p * skv_p * d,
        bytes_accessed=(b * (2 * sq_p + 2 * skv_p) * hd) * q.dtype.itemsize,
        transcendentals=b * h * sq_p * skv_p,
    )
    if oneshot:
        out = pl.pallas_call(
            functools.partial(
                _flash_fwd_oneshot_packed_kernel,
                scale=scale,
                kv_len=kv_len,
                block_kv=block_kv,
                num_heads=h,
                head_dim=d,
            ),
            grid=(b, sq_p // block_q),
            in_specs=[q_spec, kv_spec_one, kv_spec_one],
            out_specs=q_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=_INTERPRET,
        )(q, k, v)
    else:
        out = pl.pallas_call(
            functools.partial(
                _flash_fwd_packed_kernel,
                scale=scale,
                kv_len=kv_len,
                block_kv=block_kv,
                num_heads=h,
                head_dim=d,
            ),
            grid=(b, sq_p // block_q, skv_p // block_kv),
            in_specs=[q_spec, kv_spec_stream, kv_spec_stream],
            out_specs=q_spec,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, hd), jnp.float32),
            ],
            cost_estimate=cost,
            interpret=_INTERPRET,
        )(q, k, v)
    return out[:, :sq, :].reshape(b, sq, h, d)


def _flash_fwd_oneshot_bhsd(q, k, v, scale: float, block_q: int = 512, kv_valid=None):
    bh, sq, d = q.shape
    kv_len = kv_valid if kv_valid is not None else k.shape[1]
    skv_p = _round_up(k.shape[1], 128)
    # experimental override (A/B): larger q blocks cut the per-grid-step
    # init/finish exposure (S=1024 self-attn runs 2 steps/head at 512)
    block_q = int(os.environ.get("FLASH_TPU_ONESHOT_BLOCK_Q", block_q))
    block_q = min(block_q, _round_up(sq, 128))
    # q side: cdiv grid — boundary blocks read garbage rows (row-isolated
    # math, outputs masked on write), so no pad/slice copies are emitted
    if skv_p != k.shape[1]:
        # kv side stays explicitly zero-padded: garbage V columns would
        # poison valid rows through 0·NaN in the PV matmul
        k = jnp.pad(k, ((0, 0), (0, skv_p - k.shape[1]), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, skv_p - v.shape[1]), (0, 0)))
    grid = (bh, pl.cdiv(sq, block_q))
    out, lse = pl.pallas_call(
        functools.partial(
            _flash_fwd_oneshot_kernel, scale=scale, kv_len=kv_len, block_kv=skv_p
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_p, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_p, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, sq), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * skv_p * d,
            bytes_accessed=(bh * (2 * sq + 2 * skv_p) * d) * q.dtype.itemsize,
            transcendentals=bh * sq * skv_p,
        ),
        interpret=_INTERPRET,
    )(q, k, v)
    return out, lse


# Streaming-forward VMEM model: q + out blocks, k + v blocks — each ×2 for
# Mosaic's pipeline double-buffering (observed: the b8 VAE mid-attention
# [8,16384,512] compile OOMs at 16.09 MiB where a single-buffer model said
# 11 MiB; at D=64 the doubled model still keeps the measured-good
# (512, 4096) default at 11.4 MiB) — plus ONE live fp32 [bq, bkv] score
# tile (Mosaic reuses the exp output buffer) and the fp32 scratch.
_STREAM_FWD_VMEM_BUDGET = 13 * 2**20


def _stream_fwd_vmem(bq: int, bkv: int, d: int, itemsize: int) -> int:
    return (2 * bq * d + 2 * bkv * d) * itemsize * 2 + bq * bkv * 4 + (2 * bq * 128 + bq * d) * 4


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv", "kv_valid"))
def _flash_fwd_bhsd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    # tuned on v5e at (S=4096, D=64), r3 sweep (tools/bench_attention.py):
    # 49.3 TFLOP/s @ (512, 4096) vs 46.7 @ (256, 2048) — wide KV blocks
    # amortize the online-softmax rescale AND larger q blocks cut K/V
    # re-streaming from HBM (traffic ∝ S/block_q). (1024, 4096) overflows
    # VMEM (the fp32 [bq, bkv] score block).
    block_q: int = 512,
    block_kv: int = 4096,
    # logical KV length when the caller's K/V arrays carry trailing
    # alignment padding (MMDiT's 128-aligned joint sequence) — positions
    # ≥ kv_valid are masked in-kernel
    kv_valid: Optional[int] = None,
):
    """Flash forward over (BH, S, D); returns (out [BH,Sq,D], lse [BH,Sq])."""
    bh, sq, d = q.shape
    kv_len = kv_valid if kv_valid is not None else k.shape[1]
    if _round_up(k.shape[1], 128) <= _ONESHOT_KV_MAX:
        return _flash_fwd_oneshot_bhsd(q, k, v, scale, block_q=block_q, kv_valid=kv_valid)
    block_q = min(block_q, _round_up(sq, 128))
    block_kv = _fit_block(k.shape[1], block_kv)
    # VMEM guard: the tuned (512, 4096) default was validated at D=64; for
    # wider heads (or caller-supplied blocks) shrink KV then Q blocks until
    # the estimated footprint fits, instead of failing Mosaic allocation.
    while (
        _stream_fwd_vmem(block_q, block_kv, d, q.dtype.itemsize) > _STREAM_FWD_VMEM_BUDGET
        and block_kv > 512
    ):
        block_kv //= 2
    while (
        _stream_fwd_vmem(block_q, block_kv, d, q.dtype.itemsize) > _STREAM_FWD_VMEM_BUDGET
        and block_q > 128
    ):
        block_q //= 2

    skv_p = _round_up(k.shape[1], block_kv)
    if skv_p != k.shape[1]:
        # kv side: explicit zero-pad (garbage V would poison valid rows via
        # 0·NaN in the PV matmul); q side: cdiv grid with masked boundary
        # writes — garbage q rows are row-isolated, so no pad/slice copies
        k = jnp.pad(k, ((0, 0), (0, skv_p - k.shape[1]), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, skv_p - v.shape[1]), (0, 0)))

    grid = (bh, pl.cdiv(sq, block_q), skv_p // block_kv)
    out, lse = pl.pallas_call(
        functools.partial(
            _flash_fwd_kernel, scale=scale, kv_len=kv_len, block_kv=block_kv,
            skv_p=skv_p,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            # lse carries a singleton middle dim: TPU block tiling requires
            # the 2nd-to-last block dim to equal the array dim or be 8-aligned
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, sq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * skv_p * d,
            bytes_accessed=(bh * (sq + 2 * skv_p + sq) * d) * q.dtype.itemsize,
            transcendentals=bh * sq * skv_p,
        ),
        interpret=_INTERPRET,
    )(q, k, v)
    return out, lse


# --------------------------------------------------------------------------
# Backward kernels
# --------------------------------------------------------------------------
def _flash_bwd_dkv_kernel(
    q_ref,
    do_ref,
    lse_ref,
    delta_ref,
    k_ref,
    v_ref,
    dk_ref,
    dv_ref,
    dk_scratch,
    dv_scratch,
    *,
    scale: float,
    kv_len: int,
    block_kv: int,
    skv_p: int,
):
    q_idx = pl.program_id(2)
    num_q = pl.num_programs(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    k = k_ref[0]  # (bkv, d)
    v = v_ref[0]
    q = q_ref[0]  # (bq, d)
    do = do_ref[0]  # (bq, d)
    lse = lse_ref[0, 0]  # (bq,) fp32
    delta = delta_ref[0, 0]  # (bq,) fp32

    # sᵀ = (K Qᵀ)·scale : (bkv, bq) — computed transposed so dV/dK matmuls
    # contract over q without any in-kernel transposes.
    st = (
        jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )
    if skv_p != kv_len:
        kv_idx = pl.program_id(1)
        global_kv = kv_idx * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, st.shape, dimension=0
        )
        st = jnp.where(global_kv < kv_len, st, _NEG_INF)
    pt = jnp.exp(st - lse[None, :])  # (bkv, bq)

    dv_scratch[:] += jax.lax.dot_general(
        pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dpᵀ = V dOᵀ : (bkv, bq)
    dpt = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dst = pt * (dpt - delta[None, :])  # (bkv, bq) fp32
    dk_scratch[:] += jax.lax.dot_general(
        dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(q_idx == num_q - 1)
    def _finish():
        dk_ref[0] = (dk_scratch[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    q_ref,
    do_ref,
    lse_ref,
    delta_ref,
    k_ref,
    v_ref,
    dq_ref,
    dq_scratch,
    *,
    scale: float,
    kv_len: int,
    block_kv: int,
    skv_p: int,
):
    kv_idx = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]
    k = k_ref[0]
    v = v_ref[0]

    # transposed (bkv, bq) orientation so lse/delta broadcast as row
    # vectors (lane-dim broadcasts; no sublane relayout)
    st = (
        jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )  # (bkv, bq)
    if skv_p != kv_len:
        global_kv = kv_idx * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, st.shape, dimension=0
        )
        st = jnp.where(global_kv < kv_len, st, _NEG_INF)
    pt = jnp.exp(st - lse[None, :])  # (bkv, bq)
    dpt = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bkv, bq)
    dst = pt * (dpt - delta[None, :])
    # dq[q,d] = Σ_kv dsᵀ[kv,q]·k[kv,d] — contract dim 0 of both
    dq_scratch[:] += jax.lax.dot_general(
        dst.astype(k.dtype), k, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kv_idx == num_kv - 1)
    def _finish():
        dq_ref[0] = (dq_scratch[:] * scale).astype(dq_ref.dtype)


# --------------------------------------------------------------------------
# One-shot backward (short Sq AND short KV): dq, dk, dv from a single kernel
# with one grid step per head — one HBM read of q/k/v/do instead of two
# (the streaming dkv+dq pair), and none of the per-step init/finish DMA
# exposure that dominates short-sequence grids (see the forward one-shot
# note). Intermediates: three [skv_p, sq_p] fp32 tiles ≈ 12 MB at 1024² —
# inside the 16 MB scoped-VMEM limit.
# --------------------------------------------------------------------------
def _flash_bwd_oneshot_kernel(
    q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
    dq_ref, dk_ref, dv_ref, *, scale: float, kv_len: int, skv_p: int
):
    q = q_ref[0]
    do = do_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]
    st = (
        jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )  # (skv, sq)
    if kv_len != skv_p:
        gkv = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
        st = jnp.where(gkv < kv_len, st, _NEG_INF)
    pt = jnp.exp(st - lse[None, :])
    dv_ref[0] = jax.lax.dot_general(
        pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dpt = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (skv, sq)
    dst = pt * (dpt - delta[None, :])
    dk_ref[0] = (
        jax.lax.dot_general(
            dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    ).astype(dk_ref.dtype)
    dq_ref[0] = (
        jax.lax.dot_general(
            dst.astype(k.dtype), k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    ).astype(dq_ref.dtype)


def _flash_bwd_oneshot_bhsd(q, k, v, o, lse, do, scale: float, kv_valid=None):
    bh, sq, d = q.shape
    kv_arr = k.shape[1]
    kv_len = kv_valid if kv_valid is not None else kv_arr
    sq_p = _round_up(sq, 128)
    skv_p = _round_up(kv_arr, 128)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)[:, None, :]
    if sq_p != sq:
        pad_q = ((0, 0), (0, sq_p - sq), (0, 0))
        q = jnp.pad(q, pad_q)
        do = jnp.pad(do, pad_q)
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, sq_p - sq)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_p - sq)))
    if skv_p != kv_arr:
        pad_kv = ((0, 0), (0, skv_p - kv_arr), (0, 0))
        k = jnp.pad(k, pad_kv)
        v = jnp.pad(v, pad_kv)
    q_spec = pl.BlockSpec((1, sq_p, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, sq_p), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, skv_p, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_oneshot_kernel, scale=scale, kv_len=kv_len, skv_p=skv_p
        ),
        grid=(bh,),
        in_specs=[q_spec, q_spec, row_spec, row_spec, kv_spec, kv_spec],
        out_specs=[q_spec, kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((bh, skv_p, d), k.dtype),
            jax.ShapeDtypeStruct((bh, skv_p, d), v.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * sq_p * skv_p * d,
            bytes_accessed=(bh * (4 * sq_p + 4 * skv_p) * d) * q.dtype.itemsize,
            transcendentals=bh * sq_p * skv_p,
        ),
        interpret=_INTERPRET,
    )(q, do, lse, delta, k, v)
    return dq[:, :sq], dk[:, :kv_arr], dv[:, :kv_arr]


# KV within this bound AND the kernel's whole VMEM footprint within budget
# use the one-shot backward. Covers S=1024 self-attn (1024×1024) and ALL
# KV=77 cross-attention incl. S=4096 (128×4096) — in both, the streaming
# pair degenerates to single-inner-step grids.
_ONESHOT_BWD_MAX = int(os.environ.get("FLASH_TPU_ONESHOT_BWD_MAX", "1024"))
# 14 MiB of the 16 MiB scoped-VMEM limit: the measured-good S=1024² D=64
# case estimates to 13.5 MiB under this model, so a tighter budget would
# lose it; long-Sq/short-KV shapes (e.g. Sq=8192 cross at KV=77) estimate
# past this and correctly fall back to streaming.
_ONESHOT_BWD_VMEM_BUDGET = 14 * 2**20


def _oneshot_bwd_vmem(sq_p: int, skv_p: int, d: int, itemsize: int) -> int:
    """Whole-kernel VMEM estimate: q/do/dq + k/v/dk/dv blocks, lse/delta
    rows, and the three live [skv_p, sq_p] fp32 intermediates."""
    lin = (3 * sq_p * d + 4 * skv_p * d) * itemsize
    rows = 2 * 4 * sq_p
    inter = 3 * 4 * sq_p * skv_p
    return lin + rows + inter


def _use_oneshot_bwd(sq: int, kv_len: int, d: int, itemsize: int) -> bool:
    sq_p = _round_up(sq, 128)
    skv_p = _round_up(kv_len, 128)
    return (
        skv_p <= _ONESHOT_BWD_MAX
        and _oneshot_bwd_vmem(sq_p, skv_p, d, itemsize) <= _ONESHOT_BWD_VMEM_BUDGET
    )


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_kv", "kv_valid")
)
def _flash_bwd_bhsd(
    q,
    k,
    v,
    o,
    lse,
    do,
    scale: float,
    # tuned on v5e at (S=4096, D=64): 48 vs 34 TFLOP/s for (256, 512) —
    # big square blocks keep the MXU fed despite the (bkv, bq) fp32
    # intermediates (~3×4 MB live per step at 1024²)
    block_q: int = 1024,
    block_kv: int = 1024,
    kv_valid: Optional[int] = None,
):
    bh, sq, d = q.shape
    kv_arr = k.shape[1]
    kv_len = kv_valid if kv_valid is not None else kv_arr
    if _use_oneshot_bwd(sq, kv_arr, d, q.dtype.itemsize):
        return _flash_bwd_oneshot_bhsd(q, k, v, o, lse, do, scale, kv_valid=kv_valid)
    block_q = _fit_block(sq, block_q)
    block_kv = _fit_block(kv_arr, block_kv)
    sq_p = _round_up(sq, block_q)
    skv_p = _round_up(kv_arr, block_kv)

    # Δ = rowsum(dO ∘ O): cheap fused XLA reduction, fp32; [bh, 1, sq]
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)[:, None, :]

    if sq_p != sq:
        pad_q = ((0, 0), (0, sq_p - sq), (0, 0))
        q = jnp.pad(q, pad_q)
        do = jnp.pad(do, pad_q)
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, sq_p - sq)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_p - sq)))
    if skv_p != kv_arr:
        pad_kv = ((0, 0), (0, skv_p - kv_arr), (0, 0))
        k = jnp.pad(k, pad_kv)
        v = jnp.pad(v, pad_kv)

    q_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, j), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=scale, kv_len=kv_len, block_kv=block_kv,
            skv_p=skv_p,
        ),
        grid=(bh, skv_p // block_kv, sq_p // block_q),
        in_specs=[q_spec, q_spec, row_spec, row_spec, kv_spec, kv_spec],
        out_specs=[kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, skv_p, d), k.dtype),
            jax.ShapeDtypeStruct((bh, skv_p, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * bh * sq_p * skv_p * d,
            bytes_accessed=(bh * (2 * sq_p + 4 * skv_p) * d) * q.dtype.itemsize,
            transcendentals=bh * sq_p * skv_p,
        ),
        interpret=_INTERPRET,
    )(q, do, lse, delta, k, v)

    q_spec2 = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    row_spec2 = pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i), memory_space=pltpu.VMEM)
    kv_spec2 = pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, scale=scale, kv_len=kv_len, block_kv=block_kv,
            skv_p=skv_p,
        ),
        grid=(bh, sq_p // block_q, skv_p // block_kv),
        in_specs=[q_spec2, q_spec2, row_spec2, row_spec2, kv_spec2, kv_spec2],
        out_specs=q_spec2,
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=5 * bh * sq_p * skv_p * d,
            bytes_accessed=(bh * (3 * sq_p + 2 * skv_p) * d) * q.dtype.itemsize,
            transcendentals=bh * sq_p * skv_p,
        ),
        interpret=_INTERPRET,
    )(q, do, lse, delta, k, v)

    return dq[:, :sq], dk[:, :kv_arr], dv[:, :kv_arr]


def _xla_attention(q, k, v, bias, scale, kv_valid=None):
    """Reference einsum attention (fp32 softmax), used for biased/tiny cases."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if bias is not None:
        s = s + bias.astype(s.dtype)
    if kv_valid is not None and kv_valid < k.shape[1]:
        kv_pos = jnp.arange(k.shape[1])[None, None, None, :]
        s = jnp.where(kv_pos < kv_valid, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)


# --------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward + Pallas flash backward. The
# forward saves per-row logsumexp so neither pass materializes the
# [Sq, Skv] probability matrix (the round-1 recompute backward did, in
# fp32 — multi-GB per layer at SDXL 1024² shapes).
# --------------------------------------------------------------------------
def _to_bhsd(x):
    b, s, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _from_bhsd(x, b, h):
    bh, s, d = x.shape
    return x.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _attn_primal(q, k, v, scale, kv_valid=None):
    """Per-shard (or single-device) Pallas forward, BSHD in/out."""
    if kv_valid is None and (
        _packed_eligible(q) or _packed_cross_eligible(q, k.shape[1])
    ):
        out = _flash_fwd_packed(q, k, v, scale)
        if out is not None:
            return out
    b, _, h, _ = q.shape
    out, _ = _flash_fwd_bhsd(
        _to_bhsd(q), _to_bhsd(k), _to_bhsd(v), scale, kv_valid=kv_valid
    )
    return _from_bhsd(out, b, h)


# --------------------------------------------------------------------------
# Tensor-parallel partitioning of the Pallas forward.
#
# Under a jit over a ("data", "model") mesh with Megatron column-parallel
# q/k/v projections (parallel/tp.py), activations arrive HEAD-sharded:
# [B, S, H/n, D]. A bare pallas_call has no SPMD rule, so GSPMD would
# all-gather every operand per layer (or fail). Attention is pointwise over
# (batch, head), so custom_partitioning declares exactly that: keep
# whatever sharding q carries on dims 0 (batch) and 2 (heads), force the
# sequence and feature dims replicated, and run the SAME kernel per shard.
# The counter lets tests assert this rule actually drove the lowering.
# --------------------------------------------------------------------------
PARTITION_CALLS = {"n": 0}


def _attn_io_sharding(mesh, arg_infos):
    from jax.sharding import NamedSharding, PartitionSpec

    qs = getattr(arg_infos[0], "sharding", None)
    spec = tuple(qs.spec) if isinstance(qs, NamedSharding) else ()
    spec = spec + (None,) * (4 - len(spec))
    return NamedSharding(mesh, PartitionSpec(spec[0], None, spec[2], None))


def _attn_infer_sharding(scale, kv_valid, mesh, arg_infos, result_infos):
    del scale, kv_valid, result_infos
    return _attn_io_sharding(mesh, arg_infos)


def _attn_partition(scale, kv_valid, mesh, arg_infos, result_infos):
    del result_infos
    PARTITION_CALLS["n"] += 1
    io = _attn_io_sharding(mesh, arg_infos)

    def lower_fn(q, k, v):
        return _attn_primal(q, k, v, scale, kv_valid)

    return mesh, lower_fn, io, (io, io, io)


_attn_primal_cp = custom_partitioning(_attn_primal, static_argnums=(3, 4))
_attn_primal_cp.def_partition(
    partition=_attn_partition,
    infer_sharding_from_operands=_attn_infer_sharding,
    # Shardy (the default partitioner on current JAX) propagates through the
    # einsum-like rule instead of the callbacks: batch and head factors pass
    # sharding through; sequence and feature dims are forced replicated
    # (attention is global over the KV sequence).
    sharding_rule="b s h d, b t h d, b t h d -> b s h d",
    # order matters: Shardy wants these sorted by factor index (s=1, d=3, t=4)
    need_replication_factors=("s", "d", "t"),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _pallas_attention_vjp(q, k, v, scale, kv_valid=None):
    # Primal (inference / no-grad) path: the packed-layout kernel skips all
    # four head transposes, and the custom_partitioning wrapper makes the
    # kernel leg TP-correct (head-sharded per-shard dispatch instead of a
    # GSPMD all-gather). Differentiation goes through the fwd rule below,
    # which keeps the BHSD kernels (their saved tensors feed the flash
    # backward with no extra relayout); TP training is not a supported
    # path (training shards batch/params, never heads).
    return _attn_primal_cp(q, k, v, scale, kv_valid)


def _pallas_attention_fwd(q, k, v, scale, kv_valid=None):
    b, _, h, _ = q.shape
    qt, kt, vt = _to_bhsd(q), _to_bhsd(k), _to_bhsd(v)
    out, lse = _flash_fwd_bhsd(qt, kt, vt, scale, kv_valid=kv_valid)
    return _from_bhsd(out, b, h), (qt, kt, vt, out, lse)


def _pallas_attention_bwd(scale, kv_valid, res, g):
    qt, kt, vt, out, lse = res
    b, _, h, _ = g.shape  # static shape info recovered from the cotangent
    dq, dk, dv = _flash_bwd_bhsd(
        qt, kt, vt, out, lse, _to_bhsd(g), scale, kv_valid=kv_valid
    )
    return _from_bhsd(dq, b, h), _from_bhsd(dk, b, h), _from_bhsd(dv, b, h)


_pallas_attention_vjp.defvjp(_pallas_attention_fwd, _pallas_attention_bwd)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
    kv_valid: Optional[int] = None,
) -> jnp.ndarray:
    """Multi-head attention with automatic TPU kernel dispatch.

    Args:
      q: [B, Sq, H, D]; k/v: [B, Skv, H, D].
      bias: optional additive logits bias broadcastable to [B, H, Sq, Skv]
        (forces the XLA path — used by text encoders only).
      scale: defaults to 1/sqrt(D).
      use_pallas: force kernel on/off; default: on iff running on TPU and
        bias is None.
      kv_valid: logical KV length when K/V carry trailing alignment
        padding (static int); positions ≥ kv_valid are masked. Lets
        callers keep 128-aligned sequences (MMDiT's joint stream) without
        per-layer pad/slice traffic.

    Returns: [B, Sq, H, D].
    """
    b, sq, h, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if kv_valid is not None and kv_valid >= k.shape[1]:
        kv_valid = None
    if use_pallas is None:
        use_pallas = (
            not _DISABLE_PALLAS
            and bias is None
            and jax.default_backend() not in ("cpu",)
        )
    if not use_pallas or bias is not None:
        return _xla_attention(q, k, v, bias, scale, kv_valid=kv_valid)
    return _pallas_attention_vjp(q, k, v, scale, kv_valid)
