"""Attention-kernel ablation bench (VERDICT r2 directive 7).

Measures, on the real chip, at the SDXL/DiT hot shape (S=4096, D=64,
BH=80 = batch 8 x 10 heads):

1. the Pallas flash forward across a block-size sweep,
2. pure-matmul probes at the exact kernel shapes (QK^T: [bq,64]x[64,bkv];
   PV: [bq,bkv]x[bkv,64]) and their D=128 counterparts — the structural
   bound the kernel is judged against,
3. fwd+bwd effective TFLOP/s.

Timing discipline: ``jax.block_until_ready`` is NOT a reliable barrier
under the axon relay (it returns before device completion), so every
measurement is a SINGLE dispatch — a jitted ``lax.scan`` chaining the
iterate through the op ``iters`` times — finished by a scalar device read
(``float(...)``), which is an unambiguous execution barrier.

Run: python tools/bench_attention.py [--sweep]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flash_diffusion_tpu.ops import attention as A


def _timed_scalar(run, *args, iters):
    """Median-of-3 of one-dispatch jitted loops, closed by a scalar read."""
    _ = float(run(*args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def bench_fwd(bh, s, d, block_q, block_kv, iters=20):
    q = jax.random.normal(jax.random.PRNGKey(0), (bh, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (bh, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (bh, s, d), jnp.bfloat16)
    f = functools.partial(
        A._flash_fwd_bhsd, scale=1.0 / d**0.5, block_q=block_q, block_kv=block_kv
    )

    @jax.jit
    def run(q, k, v):
        def body(x, _):
            o, _lse = f(x, k, v)
            return o, None  # softmax-avg of v: bounded, safe to chain

        o, _ = jax.lax.scan(body, q, None, length=iters)
        return o[0, 0, 0].astype(jnp.float32)

    dt = _timed_scalar(run, q, k, v, iters=iters)
    return 4.0 * bh * s * s * d / dt / 1e12


def bench_fwd_bwd(bh, s, d, iters=10):
    q = jax.random.normal(jax.random.PRNGKey(0), (1, s, bh, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (1, s, bh, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, s, bh, d), jnp.bfloat16)

    def loss(q, k, v):
        return A.dot_product_attention(q, k, v).astype(jnp.float32).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def run(q, k, v):
        def body(x, _):
            dq, _dk, _dv = g(x, k, v)
            return (x + jnp.bfloat16(1e-4) * dq.astype(jnp.bfloat16)), None

        x, _ = jax.lax.scan(body, q, None, length=iters)
        return x[0, 0, 0, 0].astype(jnp.float32)

    dt = _timed_scalar(run, q, k, v, iters=iters)
    flops = (4.0 + 10.0) * bh * s * s * d  # fwd 4 + bwd 10 (dq 5 + dkv 5)
    return flops / dt / 1e12


def bench_matmul(m, kdim, n, iters=20):
    """bf16 matmul achieved TFLOP/s at an exact (m,k)x(k,n) kernel shape,
    batched over the kernel's grid extent to mirror real occupancy."""
    batch = max(1, (80 * 4096 * 4096) // (m * n))  # ~same total work as attn
    # cap argument HBM at ~2G (bf16): thin shapes otherwise explode the batch
    mem_cap = int(2e9) // (2 * (m * kdim + kdim * n + m * n))
    batch = max(1, min(batch, mem_cap))
    a = jax.random.normal(jax.random.PRNGKey(0), (batch, m, kdim), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (batch, kdim, n), jnp.bfloat16)

    @jax.jit
    def run(s0, a, b):
        def body(s, _):
            o = jax.lax.dot_general(
                a + s.astype(jnp.bfloat16),  # scalar-chain: serializes iterations
                b,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            # depend on ALL of o: a bare o[0,0,0] lets XLA slice the dot
            # down to one row/column (observed: "1730 TFLOP/s")
            return o.mean() * 1e-20, None

        s, _ = jax.lax.scan(body, s0, None, length=iters)
        return s

    dt = _timed_scalar(run, jnp.float32(0.0), a, b, iters=iters)
    return 2.0 * batch * m * kdim * n / dt / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true", help="full block-size sweep")
    ap.add_argument("--s", type=int, default=4096)
    ap.add_argument("--bh", type=int, default=80)
    ap.add_argument("--d", type=int, default=64)
    args = ap.parse_args()
    bh, s, d = args.bh, args.s, args.d

    print(f"# attention ablation  BH={bh} S={s} D={d}  backend={jax.default_backend()}")

    print("\n## pure-matmul bounds at kernel shapes (bf16, fp32 accum)")
    for m, kk, n, tag in [
        (256, d, 2048, "QK^T fwd (bq x D x bkv)"),
        (256, 2048, d, "PV fwd   (bq x bkv x D)"),
        (256, 128, 2048, "QK^T if D were 128"),
        (256, 2048, 128, "PV   if D were 128"),
        (4096, 4096, 4096, "square 4096 (roofline)"),
    ]:
        t = bench_matmul(m, kk, n)
        print(f"  {tag:28s}: {t:6.1f} TFLOP/s", flush=True)

    print("\n## flash forward")
    combos = (
        [(bq, bkv) for bq in (128, 256, 512, 1024) for bkv in (512, 1024, 2048, 4096)]
        if args.sweep
        else [(256, 1024), (256, 2048), (512, 2048), (256, 4096), (512, 4096)]
    )
    best = (0.0, None)
    for bq, bkv in combos:
        if bq > s or bkv > s:
            continue
        try:
            t = bench_fwd(bh, s, d, bq, bkv)
        except Exception as e:
            print(f"  bq={bq:5d} bkv={bkv:5d}: FAILED {type(e).__name__}", flush=True)
            continue
        mark = ""
        if t > best[0]:
            best, mark = (t, (bq, bkv)), "  <-- best"
        print(f"  bq={bq:5d} bkv={bkv:5d}: {t:6.1f} TFLOP/s{mark}", flush=True)
    print(f"  best: {best[0]:.1f} @ {best[1]}")

    print("\n## fwd+bwd effective")
    t = bench_fwd_bwd(bh, s, d)
    print(f"  {t:.1f} TFLOP/s")

    # --- short-sequence (one-shot) kernels: S=1024 self + KV=77 cross ---
    print("\n## short-KV one-shot vs streaming (BH=160 S=1024 D=64)")
    saved_kv, saved_bwd = A._ONESHOT_KV_MAX, A._ONESHOT_BWD_MAX
    for label, oneshot in (("one-shot", True), ("streaming", False)):
        A._ONESHOT_KV_MAX = 1024 if oneshot else 0
        A._ONESHOT_BWD_MAX = 1024 if oneshot else 0
        A._flash_fwd_bhsd.clear_cache()
        A._flash_bwd_bhsd.clear_cache()
        t = bench_fwd(160, 1024, 64, 512, 1024)
        tb = bench_fwd_bwd(160, 1024, 64)
        print(f"  {label:10s}: fwd {t:6.1f} TFLOP/s   fwd+bwd {tb:6.1f} TFLOP/s", flush=True)
    A._ONESHOT_KV_MAX, A._ONESHOT_BWD_MAX = saved_kv, saved_bwd
    A._flash_fwd_bhsd.clear_cache()
    A._flash_bwd_bhsd.clear_cache()

    print("\n## cross-attention (BH=160 Sq=1024 KV=77) wall ms per call")
    q = jax.random.normal(jax.random.PRNGKey(0), (160, 1024, 64), jnp.bfloat16)
    kv = jax.random.normal(jax.random.PRNGKey(1), (160, 77, 64), jnp.bfloat16)

    @jax.jit
    def run_cross(q, kv):
        def body(x, _):
            o, _lse = A._flash_fwd_bhsd(x, kv, kv, scale=0.125)
            return o, None
        o, _ = jax.lax.scan(body, q, None, length=20)
        return o.mean()

    dt = _timed_scalar(run_cross, q, kv, iters=20)
    print(f"  one-shot: {dt*1e3:.3f} ms")


if __name__ == "__main__":
    main()
