"""Pallas GEMM for the FFN down-projection shape family.

The r3 SDXL trace showed XLA:TPU's emitter for deep-contraction /
narrow-output dots ([B·S, 4C] @ [4C, C], C=640-1280) running at ~46 TFLOP/s
while the mirror-image up-projection runs at ~96 — XLA's own cost model
(estimated_cycles) expects the slow schedule, so it is an emitter limitation,
not a fusion accident (materializing the producer via optimization_barrier
changed nothing). This kernel is a plain blocked GEMM: grid (M/bm, K/bk)
with the full N kept per step, K innermost, fp32 accumulator in VMEM —
deep inner loop, fat steps, bias folded into the final store.

Dispatch is opt-in per call site (the GEGLU down projection); everything
else stays on XLA, whose emitters are fine for the other shapes in these
models. Backward: dx = dy·Wᵀ is the FAST (wide-output) XLA shape; dW = xᵀ·dy
re-enters this kernel when its shape qualifies.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = os.environ.get("FLASH_TPU_PALLAS_INTERPRET", "0") == "1"
_DISABLE_PALLAS = os.environ.get("FLASH_TPU_DISABLE_PALLAS", "0") == "1"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _gemm_kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, act=None):
    k_idx = pl.program_id(1)
    num_k = pl.num_programs(1)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    if act == "gelu":
        # activation prologue fused into the contraction loop: each x block
        # is gated in-register on its way to the MXU (tanh form — the bf16
        # compute semantics of every dispatching call site)
        x = jax.nn.gelu(x, approximate=True)
    elif act == "silu":
        x = jax.nn.silu(x)
    acc_ref[:] += jax.lax.dot_general(
        x, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k_idx == num_k - 1)
    def _finish():
        o_ref[...] = (acc_ref[:] + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _gemm_call(x2, w, bias, block_m: int, block_k: int, act=None):
    m, k = x2.shape
    n = w.shape[1]
    operands = [x2, w, bias.reshape(1, n)]
    in_specs = [
        pl.BlockSpec((block_m, block_k), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_k, n), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    # ragged M: boundary blocks read padded garbage rows and their outputs
    # are masked on write — safe because K % block_k == 0 (garbage never
    # contaminates in-range output rows)
    return pl.pallas_call(
        functools.partial(_gemm_kernel, act=act),
        grid=(pl.cdiv(m, block_m), k // block_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_m, n), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), x2.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=(m * k + k * n + m * n) * x2.dtype.itemsize,
            transcendentals=m * k if act else 0,
        ),
        interpret=_INTERPRET,
    )(*operands)


def _pick_blocks(m: int, k: int, n: int, itemsize: int):
    """(block_m, block_k) with acc + x + w blocks inside ~8 MB of VMEM
    (block_k dividing K; M may be ragged — handled by cdiv grids with
    masked boundary writes); None when no layout fits."""
    for bm in (512, 256, 128, 64, 32, 16, 8):
        if m < bm and bm > 8:
            continue
        for bk in (1024, 512, 256, 128):
            if k % bk:
                continue
            vmem = 4 * bm * n + itemsize * (bm * bk + bk * n)
            if vmem <= 8 * 2**20:
                return bm, bk
    return None


def gemm_eligible(m: int, k: int, n: int) -> bool:
    """The down-projection family XLA schedules badly: deep contraction into
    a narrow output."""
    if _DISABLE_PALLAS:
        return False
    if not _INTERPRET and jax.default_backend() in ("cpu",):
        return False
    return (
        k >= 2 * n
        and k >= 2048
        and 128 <= n <= 2048
        and n % 128 == 0
        and k % 128 == 0
        and m >= 1024
        and m % 8 == 0
        and _pick_blocks(m, k, n, 2) is not None
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _gemm_p(x2, w, bias):
    bm, bk = _pick_blocks(x2.shape[0], x2.shape[1], w.shape[1], x2.dtype.itemsize)
    return _gemm_call(x2, w, bias, bm, bk)


def _gemm_p_fwd(x2, w, bias):
    return _gemm_p(x2, w, bias), (x2, w)


def _gemm_p_bwd(res, dy):
    x2, w = res
    # dy·Wᵀ: wide-output shape — XLA's fast emitter
    dx = jax.lax.dot_general(
        dy, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x2.dtype)
    # xᵀ·dy: same slow family when K (=M here) is deep — reuse the kernel
    m, k = x2.shape
    n = dy.shape[1]
    if gemm_eligible(k, m, n):
        dw = _gemm_p(
            jnp.asarray(x2.T), dy, jnp.zeros((n,), dy.dtype)
        ).astype(w.dtype)
    else:
        dw = jax.lax.dot_general(
            x2, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(w.dtype)
    dbias = jnp.sum(dy.astype(jnp.float32), axis=0).astype(dy.dtype)
    return dx, dw, dbias


_gemm_p.defvjp(_gemm_p_fwd, _gemm_p_bwd)


# --------------------------------------------------------------------------
# Fused-dequant W8A8 GEMM: int8·int8 → int32 on the MXU (2× the bf16 rate on
# v5e), with BOTH scale applications (per-token activation s_x, per-channel
# weight s_w) and the bias fold applied in-register on the fp32 output tile
# at the last contraction step. The r3/r4 XLA int8 path lost at model level
# (+7.7% denoiser) because XLA lowers the per-channel dequant as separate
# full-tensor passes — here dequant costs one VPU multiply-add on the
# (block_m, N) tile per output block, amortized over the whole K loop.
# Inference-only (quant.py trees never reach training).
# --------------------------------------------------------------------------
def _int8_gemm_kernel(x_ref, w_ref, sx_ref, sw_ref, b_ref, o_ref, acc_ref, *, act=None):
    k_idx = pl.program_id(1)
    num_k = pl.num_programs(1)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k_idx == num_k - 1)
    def _finish():
        y = acc_ref[:].astype(jnp.float32) * sx_ref[...] * sw_ref[...]
        y = y + b_ref[...]
        if act == "gelu":
            y = jax.nn.gelu(y, approximate=True)
        o_ref[...] = y.astype(o_ref.dtype)


def _pick_blocks_int8(m: int, k: int, n: int):
    """(block_m, block_k) under a measured-honest VMEM model: int32 acc +
    fp32 finish temp (both bm·n·4), double-buffered bf16 out (2·2·bm·n),
    double-buffered int8 x/w blocks, scale/bias rows. The first model
    (acc + single-buffered inputs only) OOMed scoped VMEM by 4.6M at the
    GEGLU up-projection shape [8192,1280]x[1280,10240] on-chip. int8 min
    sublane tile is 32."""
    for bm in (512, 256, 128, 64, 32):
        if m < bm and bm > 32:
            continue
        for bk in (2048, 1024, 512, 256, 128):
            if k % bk:
                continue
            vmem = 12 * bm * n + 2 * (bm * bk + bk * n) + 8 * (n + bm)
            if vmem <= 12 * 2**20:
                return bm, bk
    return None


def int8_gemm_eligible(m: int, k: int, n: int) -> bool:
    if _DISABLE_PALLAS or os.environ.get("FLASH_TPU_INT8_GEMM", "1") != "1":
        return False
    if not _INTERPRET and jax.default_backend() in ("cpu",):
        return False
    return (
        m >= 256
        and k >= 256
        and k % 128 == 0
        and n % 128 == 0
        and _pick_blocks_int8(m, k, n) is not None
    )


def int8_gemm(xq, sx, wq, sw, bias, act=None):
    """y = dequant(xq·wq) (+bias) — xq [M,K] int8, sx [M,1] f32 per-token
    scales, wq [K,N] int8, sw [1,N] f32 per-channel scales, bias [1,N] f32
    or None. Output bf16."""
    m, k = xq.shape
    n = wq.shape[1]
    bm, bk = _pick_blocks_int8(m, k, n)
    if bias is None:
        bias = jnp.zeros((1, n), jnp.float32)
    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, n), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        functools.partial(_int8_gemm_kernel, act=act),
        grid=(pl.cdiv(m, bm), k // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, n), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, n), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k + k * n + 2 * m * n,
            transcendentals=m * n if act else 0,
        ),
        interpret=_INTERPRET,
    )(xq, wq, sx.astype(jnp.float32), sw.astype(jnp.float32), bias.astype(jnp.float32))


# --------------------------------------------------------------------------
# Fused GEGLU down-projection: y = (a · gelu(g)) @ W + bias in ONE kernel.
#
# The r3 Pallas-GEMM attempt on this projection lost 4.9% at model level
# because dispatching a pallas_call on the *gated product* split XLA's
# producer fusion — the gelu·mul materialized to HBM, was read back, and
# the GEMM ran without its producer. This kernel reads the RAW proj_in
# output (value and gate halves as two views of the same [M, 2K] array —
# no split copy) and computes gelu(g)·a in-register inside the contraction
# loop, so each element is read once, gated once, and fed straight to the
# MXU. gelu uses the tanh form — identical to the model's bf16 compute
# semantics (models/layers.py::_gate_gelu; bf16-only dispatch below).
# --------------------------------------------------------------------------
def _geglu_gemm_kernel(a_ref, g_ref, w_ref, b_ref, o_ref, acc_ref):
    k_idx = pl.program_id(1)
    num_k = pl.num_programs(1)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    h = a_ref[...] * jax.nn.gelu(g_ref[...], approximate=True)
    acc_ref[:] += jax.lax.dot_general(
        h, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k_idx == num_k - 1)
    def _finish():
        o_ref[...] = (acc_ref[:] + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _geglu_call(x2k, w, bias, block_m: int, block_k: int):
    m, k2 = x2k.shape
    k = k2 // 2
    n = w.shape[1]
    nk = k // block_k
    in_specs = [
        # value and gate halves: two views of the SAME array, offset by the
        # gate half's block index — avoids materializing a jnp.split copy
        pl.BlockSpec((block_m, block_k), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (block_m, block_k), lambda i, j: (i, j + nk), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((block_k, n), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        _geglu_gemm_kernel,
        grid=(m // block_m, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_m, n), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), x2k.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=(2 * m * k + k * n + m * n) * x2k.dtype.itemsize,
            transcendentals=m * k,
        ),
        interpret=_INTERPRET,
    )(x2k, x2k, w, bias.reshape(1, n))


def _pick_blocks_geglu(m: int, k: int, n: int, itemsize: int):
    """Like _pick_blocks but with TWO x blocks (value + gate) live."""
    for bm in (512, 256, 128, 64, 32, 16, 8):
        if m % bm:
            continue
        for bk in (1024, 512, 256, 128):
            if k % bk:
                continue
            vmem = 4 * bm * n + itemsize * (2 * bm * bk + bk * n)
            if vmem <= 8 * 2**20:
                return bm, bk
    return None


def _geglu_h(x2k):
    a, g = jnp.split(x2k, 2, axis=-1)
    return a * jax.nn.gelu(g, approximate=True)


@jax.custom_vjp
def _geglu_p(x2k, w, bias):
    bm, bk = _pick_blocks_geglu(
        x2k.shape[0], x2k.shape[1] // 2, w.shape[1], x2k.dtype.itemsize
    )
    return _geglu_call(x2k, w, bias, bm, bk)


def _geglu_p_fwd(x2k, w, bias):
    return _geglu_p(x2k, w, bias), (x2k, w)


def _geglu_p_bwd(res, dy):
    x2k, w = res
    h, h_vjp = jax.vjp(_geglu_h, x2k)
    # dh = dy · Wᵀ: wide-output shape — XLA's fast emitter
    dh = jax.lax.dot_general(
        dy, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(h.dtype)
    (dx2k,) = h_vjp(dh)
    # dW = hᵀ · dy: fat-output shape, fine on XLA (the gated product h is
    # recomputed above — cheap elementwise vs materializing it in fwd)
    dw = jax.lax.dot_general(
        h, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w.dtype)
    dbias = jnp.sum(dy.astype(jnp.float32), axis=0).astype(dy.dtype)
    return dx2k, dw, dbias


_geglu_p.defvjp(_geglu_p_fwd, _geglu_p_bwd)


def geglu_down_proj(x2k, w, bias):
    """y = (a · gelu(g)) @ w + bias where x2k = [a | g] along the last axis.

    Dispatches the fused Pallas kernel for the down-projection shape family
    in bf16 (tanh-gelu — the model's own bf16 semantics); falls back to the
    unfused XLA ops otherwise (incl. fp32 parity paths, which keep exact
    erf-gelu upstream).
    """
    k = w.shape[0]
    n = w.shape[1]
    m = 1
    for s in x2k.shape[:-1]:
        m *= s
    if (
        x2k.dtype == jnp.bfloat16
        and x2k.dtype == w.dtype
        and gemm_eligible(m, k, n)
        and _pick_blocks_geglu(m, k, n, 2) is not None
    ):
        b = jnp.zeros((n,), x2k.dtype) if bias is None else bias.astype(x2k.dtype)
        y = _geglu_p(x2k.reshape(m, 2 * k), w, b)
        return y.reshape(*x2k.shape[:-1], n)
    y = _geglu_h(x2k) @ w
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def down_proj_gemm(x, w, bias):
    """y = x @ w (+ bias) with Pallas dispatch for the slow shape family.

    x: [..., K]; w: [K, N]; bias: [N] or None. Falls back to jnp when the
    shape is out of family (or on CPU without interpret mode).
    """
    k = x.shape[-1]
    n = w.shape[1]
    m = 1
    for s in x.shape[:-1]:
        m *= s
    if gemm_eligible(m, k, n) and x.dtype == w.dtype:
        b = bias if bias is None else bias.astype(x.dtype)
        if b is None:
            b = jnp.zeros((n,), x.dtype)
        y = _gemm_p(x.reshape(m, k), w, b)
        return y.reshape(*x.shape[:-1], n)
    y = x @ w
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
