"""Gradients through the Pallas attention path (custom VJP) match XLA."""

import jax
import jax.numpy as jnp
import numpy as np

import flash_diffusion_tpu.ops.attention as A
from flash_diffusion_tpu.ops import dot_product_attention
from flash_diffusion_tpu.ops.attention import _xla_attention


def test_pallas_vjp_matches_xla_grads():
    kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(kq, (1, 128, 2, 16))
    k = jax.random.normal(kk, (1, 96, 2, 16))
    v = jax.random.normal(kv, (1, 96, 2, 16))
    cotangent = jax.random.normal(kg, (1, 128, 2, 16))

    def loss_pallas(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v, use_pallas=True) * cotangent)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, None, 16**-0.5) * cotangent)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        assert np.allclose(np.array(a), np.array(b), atol=2e-2), (
            np.abs(np.array(a) - np.array(b)).max()
        )

    # also under jit (training path)
    gj = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(gj, gp):
        assert np.allclose(np.array(a), np.array(b), atol=1e-4)


def test_flash_bwd_multiblock_accumulation(monkeypatch):
    """STREAMING dq/dk/dv kernels accumulate correctly across >1 q-block and
    >1 kv-block, including a ragged (padded+masked) kv tail. (The one-shot
    fwd/bwd dispatch is forced off so the blocked kernels stay covered.)"""
    from flash_diffusion_tpu.ops import attention as A
    from flash_diffusion_tpu.ops.attention import (
        _flash_bwd_bhsd,
        _flash_fwd_bhsd,
    )

    monkeypatch.setattr(A, "_ONESHOT_KV_MAX", 0)
    monkeypatch.setattr(A, "_ONESHOT_BWD_MAX", 0)
    # the dispatch happens at trace time — drop any cached traces
    _flash_fwd_bhsd.clear_cache()
    _flash_bwd_bhsd.clear_cache()

    kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(1), 4)
    bh, sq, skv, d = 2, 384, 320, 32  # 3 q-blocks / 3 kv-blocks at 128
    q = jax.random.normal(kq, (bh, sq, d))
    k = jax.random.normal(kk, (bh, skv, d))
    v = jax.random.normal(kv, (bh, skv, d))
    do = jax.random.normal(kg, (bh, sq, d))
    scale = d**-0.5

    out, lse = _flash_fwd_bhsd(q, k, v, scale, block_q=128, block_kv=128)
    dq, dk, dv = _flash_bwd_bhsd(
        q, k, v, out, lse, do, scale, block_q=128, block_kv=128
    )

    def ref_loss(q, k, v):
        s = jnp.einsum("bqd,bkd->bqk", q, k) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.einsum("bqk,bkd->bqd", p, v) * do)

    rq, rk, rv = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in [(dq, rq, "dq"), (dk, rk, "dk"), (dv, rv, "dv")]:
        err = np.abs(np.array(a) - np.array(b)).max()
        assert err < 2e-2, (name, err)


def test_oneshot_bwd_gate_bounds_whole_footprint():
    """The one-shot backward budget must count the Sq-linear VMEM terms
    (q/do/dq blocks, lse/delta rows), not just the [skv,sq] intermediates —
    long-Sq/short-KV shapes (aspect-bucket latents) must fall back to the
    streaming pair instead of failing Mosaic VMEM allocation."""
    # measured-good residents stay one-shot
    assert A._use_oneshot_bwd(1024, 1024, 64, 2)   # S=1024 self-attn
    assert A._use_oneshot_bwd(4096, 77, 64, 2)     # KV=77 cross at S=4096
    # long-Sq cross: intermediates alone pass the old check, whole
    # footprint (~15.8 MiB) does not
    assert not A._use_oneshot_bwd(8192, 77, 64, 2)
    assert not A._use_oneshot_bwd(8192, 77, 128, 2)


def test_stream_fwd_vmem_guard_keeps_tuned_and_rejects_overflow():
    """Streaming-forward block guard under the double-buffered cost model
    (r4: Mosaic pipelines q/k/v/out blocks ×2 — the single-buffer model let
    the b8 VAE mid-attention compile OOM): the tuned (512,4096) default
    still fits at D=64; at D=128 it now correctly exceeds budget and the
    shrink loop must land on a fitting KV block; (1024,4096) (measured
    Mosaic overflow at D=64) is rejected."""
    B = A._STREAM_FWD_VMEM_BUDGET
    assert A._stream_fwd_vmem(512, 4096, 64, 2) <= B
    assert A._stream_fwd_vmem(1024, 4096, 64, 2) > B
    # D=128: the tuned default overflows under double-buffering...
    assert A._stream_fwd_vmem(512, 4096, 128, 2) > B
    # ...and the guard's halving schedule (kv first, then q) recovers a
    # block pair that fits without degenerating below the floor sizes.
    bq, bkv = 512, 4096
    while A._stream_fwd_vmem(bq, bkv, 128, 2) > B and bkv > 512:
        bkv //= 2
    while A._stream_fwd_vmem(bq, bkv, 128, 2) > B and bq > 128:
        bq //= 2
    assert A._stream_fwd_vmem(bq, bkv, 128, 2) <= B
    assert (bq, bkv) == (512, 2048)
