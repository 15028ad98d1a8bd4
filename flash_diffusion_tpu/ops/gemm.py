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


def _gemm_kernel(x_ref, w_ref, b_ref, o_ref, acc_ref):
    k_idx = pl.program_id(1)
    num_k = pl.num_programs(1)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k_idx == num_k - 1)
    def _finish():
        o_ref[...] = (acc_ref[:] + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _gemm_call(x2, w, bias, block_m: int, block_k: int):
    m, k = x2.shape
    n = w.shape[1]
    operands = [x2, w, bias.reshape(1, n)]
    in_specs = [
        pl.BlockSpec((block_m, block_k), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_k, n), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        _gemm_kernel,
        grid=(m // block_m, k // block_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_m, n), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), x2.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=(m * k + k * n + m * n) * x2.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(*operands)


def _pick_blocks(m: int, k: int, n: int, itemsize: int):
    """(block_m, block_k) with acc + x + w blocks inside ~8 MB of VMEM, both
    dividing their dims; None when no layout fits."""
    for bm in (512, 256, 128, 64, 32, 16, 8):
        if m % bm:
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
