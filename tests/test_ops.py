"""Op-level numerics: flash attention (interpret mode) vs XLA reference, norms."""

import jax
import jax.numpy as jnp
import numpy as np

from flash_diffusion_tpu.ops import dot_product_attention, group_norm, layer_norm, modulate
from flash_diffusion_tpu.ops.attention import _xla_attention

# NOTE on tolerances: JAX's default matmul precision rounds inputs to
# bfloat16 (on CPU and TPU MXU alike), so kernel-vs-einsum comparisons agree
# to ~1e-2 absolute, not fp32 epsilon. Verified: the kernel is bit-identical
# to jnp matmul at the same precision.


def _rand_qkv(key, b=2, sq=192, skv=77, h=3, d=32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, skv, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, skv, h, d), jnp.float32)
    return q, k, v


def test_flash_attention_matches_xla_ragged_kv():
    """Pallas kernel (interpret mode on CPU) == XLA softmax attention,
    including a KV length (77) that is not a block multiple."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(0))
    ref = _xla_attention(q, k, v, None, 1.0 / np.sqrt(32))
    out = dot_product_attention(q, k, v, use_pallas=True)
    assert np.allclose(np.array(out), np.array(ref), atol=2e-2)


def test_flash_attention_self_attn_square():
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), b=1, sq=256, skv=256, h=2, d=64)
    ref = _xla_attention(q, k, v, None, 1.0 / 8.0)
    out = dot_product_attention(q, k, v, use_pallas=True)
    assert np.allclose(np.array(out), np.array(ref), atol=2e-2)


def test_flash_attention_packed_layout_matches_xla(monkeypatch):
    """Packed-layout ([B,S,H·D]) forward == XLA attention on the no-grad
    (primal) path, for both the streaming (long KV) and one-shot (short
    KV, ragged 77) kernels."""
    monkeypatch.setenv("FLASH_TPU_ATTN_PACKED", "1")
    # streaming: kv long enough to exceed the one-shot bound
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), b=2, sq=256, skv=1280, h=4, d=64)
    ref = _xla_attention(q, k, v, None, 1.0 / 8.0)
    out = dot_product_attention(q, k, v, use_pallas=True)
    assert np.allclose(np.array(out), np.array(ref), atol=2e-2)
    # one-shot: ragged short KV (cross-attention shape)
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), b=2, sq=192, skv=77, h=4, d=64)
    ref = _xla_attention(q, k, v, None, 1.0 / 8.0)
    out = dot_product_attention(q, k, v, use_pallas=True)
    assert np.allclose(np.array(out), np.array(ref), atol=2e-2)


def test_flash_attention_packed_any_head_dim(monkeypatch):
    """ANY_D gate: lane-unaligned head dims (Pixart 72, SD1.5 40)."""
    monkeypatch.setenv("FLASH_TPU_ATTN_PACKED", "1")
    monkeypatch.setenv("FLASH_TPU_ATTN_PACKED_ANY_D", "1")
    for d, skv in ((72, 1280), (40, 77)):
        q, k, v = _rand_qkv(jax.random.PRNGKey(6), b=1, sq=256, skv=skv, h=4, d=d)
        ref = _xla_attention(q, k, v, None, d**-0.5)
        out = dot_product_attention(q, k, v, use_pallas=True)
        assert np.allclose(np.array(out), np.array(ref), atol=2e-2), d


def test_flash_attention_packed_grad_path_unchanged(monkeypatch):
    """Differentiation under the packed gate still uses the BHSD flash
    backward (the packed kernel is primal-only) and matches XLA grads."""
    monkeypatch.setenv("FLASH_TPU_ATTN_PACKED", "1")
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), b=1, sq=128, skv=128, h=2, d=64)

    def loss_pallas(q, k, v):
        return dot_product_attention(q, k, v, use_pallas=True).sum()

    def loss_ref(q, k, v):
        return _xla_attention(q, k, v, None, 1.0 / 8.0).sum()

    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pallas, g_ref):
        assert np.allclose(np.array(a), np.array(b), atol=5e-2)


def test_attention_bias_path():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), b=2, sq=16, skv=16, h=2, d=8)
    bias = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, 16, 16), 3) <= jax.lax.broadcasted_iota(jnp.int32, (1, 1, 16, 16), 2),
        0.0,
        -1e9,
    )
    out = dot_product_attention(q, k, v, bias=bias)
    # row 0 attends only to kv 0 → equals v[:, 0]
    assert np.allclose(np.array(out[:, 0]), np.array(v[:, 0]), atol=1e-5)


def test_group_norm_matches_manual():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    scale = jnp.arange(8, dtype=jnp.float32) * 0.1 + 1.0
    bias = jnp.ones((8,)) * 0.5
    out = group_norm(x, 2, scale, bias)
    xr = np.array(x).reshape(2, 16, 2, 4)
    mean = xr.mean(axis=(1, 3), keepdims=True)
    var = xr.var(axis=(1, 3), keepdims=True)
    ref = ((xr - mean) / np.sqrt(var + 1e-5)).reshape(2, 4, 4, 8) * np.array(scale) + 0.5
    assert np.allclose(np.array(out), ref, atol=1e-5)


def test_group_norm_fused_silu():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2, 4))
    s, b = jnp.ones((4,)), jnp.zeros((4,))
    out = group_norm(x, 1, s, b, act="silu")
    plain = group_norm(x, 1, s, b)
    assert np.allclose(np.array(out), np.array(plain) / (1 + np.exp(-np.array(plain))), atol=1e-5)


def _ln_ref(x, scale=None, bias=None, eps=1e-5):
    xf = np.array(x, np.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    out = (xf - mean) / np.sqrt(var + eps)
    if scale is not None:
        out = out * np.array(scale) + np.array(bias)
    return out


def test_layer_norm_pallas_path_matches_reference():
    """Lane-aligned shapes dispatch to the fused Pallas kernel (interpret mode
    under the test conftest); compare against a two-pass numpy LayerNorm."""
    from flash_diffusion_tpu.ops import norms

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 256)) * 2.0 + 0.7
    s = jnp.arange(256, dtype=jnp.float32) * 0.01 + 1.0
    b = jnp.full((256,), 0.25)
    assert norms._ln_eligible(x, s, b)
    out = layer_norm(x, s, b)
    assert np.allclose(np.array(out), _ln_ref(x, s, b), atol=1e-4)
    # affine-free variant
    assert norms._ln_eligible(x, None, None)
    out = layer_norm(x)
    assert np.allclose(np.array(out), _ln_ref(x), atol=1e-4)
    # bf16 storage
    xb = x.astype(jnp.bfloat16)
    out = layer_norm(xb, s, b)
    # bf16 output resolution: ulp(|out|max≈7) = 0.0625
    assert np.allclose(np.array(out, np.float32), _ln_ref(xb, s, b), atol=1e-1)


def test_layer_norm_pallas_grads_match_fallback():
    """custom_vjp closed-form backward == autodiff through the jnp fallback."""
    from flash_diffusion_tpu.ops import norms

    x = jax.random.normal(jax.random.PRNGKey(4), (4, 8, 128)) * 1.5
    s = jax.random.normal(jax.random.PRNGKey(5), (128,)) * 0.1 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(6), (128,)) * 0.1

    def fallback_ln(x, s, b):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean, 0.0)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * s + b

    loss_p = lambda x, s, b: jnp.sum(jnp.sin(layer_norm(x, s, b)))
    loss_f = lambda x, s, b: jnp.sum(jnp.sin(fallback_ln(x, s, b)))
    assert norms._ln_eligible(x, s, b)
    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, s, b)
    gf = jax.grad(loss_f, argnums=(0, 1, 2))(x, s, b)
    for a, r in zip(gp, gf):
        assert np.allclose(np.array(a), np.array(r), atol=1e-4), np.abs(np.array(a) - np.array(r)).max()


def test_layer_norm_ineligible_shapes_fall_back():
    from flash_diffusion_tpu.ops import norms

    # C not lane-aligned and row count not a multiple of 8: jnp path
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 77, 120))
    assert not norms._ln_eligible(x, None, None)
    out = layer_norm(x)
    assert np.allclose(np.array(out), _ln_ref(x), atol=1e-4)


def test_group_norm_pallas_stats_path(monkeypatch):
    """Batch-1 large-spatial GN dispatches to the Pallas stats kernel
    (interpret mode under conftest; opt-in — the path lost its on-chip A/B
    and defaults off); numerics + closed-form VJP vs the jnp fallback."""
    from flash_diffusion_tpu.ops import norms

    monkeypatch.setenv("FLASH_TPU_GN_PALLAS", "1")

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 128)) * 2 + 0.3
    g = 32
    scale = jax.random.normal(jax.random.PRNGKey(1), (128,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (128,)) * 0.1
    assert norms._gn_eligible(x, g)

    def fallback(x, scale, bias, act=None):
        b, c = x.shape[0], x.shape[-1]
        xg = x.reshape(b, -1, g, c // g)
        mean = xg.mean(axis=(1, 3), keepdims=True)
        var = xg.var(axis=(1, 3), keepdims=True)
        out = (xg - mean) * jax.lax.rsqrt(var + 1e-5)
        out = out.reshape(x.shape) * scale + bias
        if act == "silu":
            out = out * jax.nn.sigmoid(out)
        return out

    for act in (None, "silu"):
        y = group_norm(x, g, scale, bias, act=act)
        ref = fallback(x, scale, bias, act=act)
        assert np.allclose(np.array(y), np.array(ref), atol=2e-4), (
            act, np.abs(np.array(y) - np.array(ref)).max())

    lp = lambda x, s, b: jnp.sum(jnp.cos(group_norm(x, g, s, b)))
    lf = lambda x, s, b: jnp.sum(jnp.cos(fallback(x, s, b)))
    gp = jax.grad(lp, argnums=(0, 1, 2))(x, scale, bias)
    gf = jax.grad(lf, argnums=(0, 1, 2))(x, scale, bias)
    for a, r in zip(gp, gf):
        assert np.allclose(np.array(a), np.array(r), atol=2e-3), (
            np.abs(np.array(a) - np.array(r)).max())

    # batch>1 stays on the (conv-fusable) jnp path
    assert not norms._gn_eligible(jnp.zeros((2, 64, 64, 128)), g)


def test_down_proj_gemm_matches_xla():
    """Pallas down-proj GEMM (interpret mode): fwd + custom-VJP grads vs a
    plain jnp matmul."""
    from flash_diffusion_tpu.ops import gemm

    m, k, n = 1024, 2048, 128
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, m // 4, k)) * 0.5
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n)) * 0.02
    b = jax.random.normal(jax.random.PRNGKey(2), (n,)) * 0.1
    assert gemm.gemm_eligible(m, k, n)

    y = gemm.down_proj_gemm(x, w, b)
    ref = x @ w + b
    assert np.allclose(np.array(y), np.array(ref), atol=2e-2), np.abs(np.array(y) - np.array(ref)).max()

    lp = lambda x, w, b: jnp.sum(jnp.sin(gemm.down_proj_gemm(x, w, b)))
    lr = lambda x, w, b: jnp.sum(jnp.sin(x @ w + b))
    gp = jax.grad(lp, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(lr, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(gp, gr):
        assert np.allclose(np.array(a), np.array(r), atol=5e-2), np.abs(np.array(a) - np.array(r)).max()

    # out-of-family shapes stay on jnp
    assert not gemm.gemm_eligible(512, 2048, 128)   # m too small
    assert not gemm.gemm_eligible(1024, 256, 128)   # contraction too shallow
    assert not gemm.gemm_eligible(1024, 2048, 4096) # output too wide


def test_folded_upsample_conv_exact(monkeypatch):
    """_FoldedUpConv (low-res sub-pixel fold) == nearest-×2 + 3×3 conv with
    the SAME kernel params, to float tolerance, including borders.
    Opt-in (the fold lost its on-chip decode A/B and defaults off)."""
    import flax.linen as nn
    from flash_diffusion_tpu.models.layers import _FoldedUpConv, nearest_upsample_2x

    monkeypatch.setenv("FLASH_TPU_FOLDED_UPSAMPLE", "1")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 5, 7, 6))
    folded = _FoldedUpConv(4)
    params = folded.init(jax.random.PRNGKey(1), x)
    y = folded.apply(params, x)

    w = params["params"]["kernel"]
    b = params["params"]["bias"]
    up = nearest_upsample_2x(x)
    ref = jax.lax.conv_general_dilated(
        up, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    assert y.shape == ref.shape == (2, 10, 14, 4)
    assert np.allclose(np.array(y), np.array(ref), atol=1e-5), np.abs(np.array(y) - np.array(ref)).max()


def test_layer_norm_and_modulate():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 6))
    out = layer_norm(x)
    assert np.allclose(np.array(out).mean(-1), 0.0, atol=1e-5)
    assert np.allclose(np.array(out).var(-1), 1.0, atol=1e-4)
    shift = jnp.ones((2, 6))
    scale = jnp.full((2, 6), 0.5)
    m = modulate(x, shift, scale)
    assert np.allclose(np.array(m), np.array(x) * 1.5 + 1.0, atol=1e-6)


def test_fit_block_minimizes_kv_padding():
    """SD3's joint 4250-token sequence must not round up to 8192 (the r5
    trace showed that padding costing 2.09× the logical attention work —
    61% of the MMDiT forward)."""
    from flash_diffusion_tpu.ops.attention import _fit_block

    assert _fit_block(4250, 4096) == 2176      # 2 × 2176 = 4352, not 8192
    assert _fit_block(4096, 4096) == 4096      # exact fit unchanged
    assert _fit_block(1024, 4096) == 1024      # short seq: one block
    assert _fit_block(4736, 1024) == 1024      # 37·128: 5 × 1024 = 5120
    for seq, mx in ((4250, 4096), (4736, 1024), (999, 512), (8192, 4096)):
        blk = _fit_block(seq, mx)
        assert blk % 128 == 0 and blk <= max(mx, 128)
        padded = -(-seq // blk) * blk
        assert padded < seq + blk  # no more than one block of waste


def test_flash_attention_sd3_joint_shape_fwd_bwd():
    """Ragged joint-sequence shape (image+text, ≠ multiple of the tuned
    block) through the STREAMING fwd/bwd kernels (block sizes forced below
    the sequence length) vs the XLA reference."""
    from flash_diffusion_tpu.ops.attention import _flash_bwd_bhsd, _flash_fwd_bhsd

    bh, s, d = 2, 531, 32  # 531 rounds to 640; fit(531, 256) = 256
    key = jax.random.PRNGKey(7)
    q, k, v = (
        jax.random.normal(kk, (bh, s, d), jnp.float32)
        for kk in jax.random.split(key, 3)
    )
    scale = d ** -0.5
    out, lse = _flash_fwd_bhsd(q, k, v, scale, block_q=256, block_kv=256)

    def ref_fn(q, k, v):
        s_ = jnp.einsum("bqd,bkd->bqk", q, k) * scale
        return jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(s_, -1), v)

    ref = ref_fn(q, k, v)
    assert np.allclose(np.array(out), np.array(ref), atol=2e-2)

    do = jax.random.normal(jax.random.PRNGKey(8), (bh, s, d), jnp.float32)
    dq, dk, dv = _flash_bwd_bhsd(q, k, v, out, lse, do, scale, block_q=256, block_kv=256)
    _, vjp = jax.vjp(ref_fn, q, k, v)
    for got, want in zip((dq, dk, dv), vjp(do)):
        assert np.allclose(np.array(got), np.array(want), atol=5e-2)


def test_geglu_down_proj_fused_matches_reference():
    """Fused gelu-gate + down-proj GEMM (interpret mode): fwd and grads vs
    the unfused ops, bf16 (the only dispatching dtype)."""
    from flash_diffusion_tpu.ops import gemm

    m, k, n = 1024, 2048, 128
    x2k = jax.random.normal(jax.random.PRNGKey(0), (2, m // 2, 2 * k), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16) * 0.02
    b = jax.random.normal(jax.random.PRNGKey(2), (n,), jnp.bfloat16) * 0.1

    y = gemm.geglu_down_proj(x2k, w, b)
    ref = gemm._geglu_h(x2k) @ w + b
    assert y.dtype == jnp.bfloat16
    assert np.allclose(np.float32(y), np.float32(ref), atol=5e-2)

    lp = lambda *a: jnp.sum(jnp.sin(gemm.geglu_down_proj(*a).astype(jnp.float32)))
    lr = lambda x2k, w, b: jnp.sum(jnp.sin((gemm._geglu_h(x2k) @ w + b).astype(jnp.float32)))
    gp = jax.grad(lp, argnums=(0, 1, 2))(x2k, w, b)
    gr = jax.grad(lr, argnums=(0, 1, 2))(x2k, w, b)
    for a, r in zip(gp, gr):
        d = np.abs(np.float32(a) - np.float32(r))
        assert d.max() <= 0.1 + 0.05 * np.abs(np.float32(r)).max(), d.max()


def test_geglu_feedforward_fused_gate_matches_unfused(monkeypatch):
    """GEGLUFeedForward with FLASH_TPU_FFN_FUSED=1 == the default path,
    param tree identical, including a live LoRA side path on proj_out."""
    from flash_diffusion_tpu.models.layers import GEGLUFeedForward

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 512, 128), jnp.bfloat16)
    ff = GEGLUFeedForward(dtype=jnp.bfloat16)
    monkeypatch.delenv("FLASH_TPU_FFN_FUSED", raising=False)
    params = ff.init(jax.random.PRNGKey(1), x)
    ref = ff.apply(params, x)

    monkeypatch.setenv("FLASH_TPU_FFN_FUSED", "1")
    params_fused = ff.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(params_fused) == jax.tree_util.tree_structure(params)
    y = ff.apply(params, x)
    assert np.allclose(np.float32(y), np.float32(ref), atol=3e-2)

    # LoRA side path on proj_out still applies under the fused gate
    from flax import traverse_util
    from flash_diffusion_tpu.lora import init_lora, lora_collection

    lora = init_lora(params["params"], rank=4, rng=jax.random.PRNGKey(2))
    flat = traverse_util.flatten_dict(lora, sep="/")
    assert any("proj_out" in k for k in flat)
    # b factors are zero-init (merged model == base); randomize to make the
    # side path visible in the output
    flat = {
        k: (jax.random.normal(jax.random.PRNGKey(9), v.shape, v.dtype) * 0.1
            if k.endswith("/b") else v)
        for k, v in flat.items()
    }
    lora = traverse_util.unflatten_dict(flat, sep="/")
    vars_ = {"params": params["params"], "lora": lora_collection(lora)}
    y_lora = ff.apply(vars_, x)
    monkeypatch.delenv("FLASH_TPU_FFN_FUSED")
    ref_lora = ff.apply(vars_, x)
    assert np.allclose(np.float32(y_lora), np.float32(ref_lora), atol=3e-2)
    assert not np.allclose(np.float32(y_lora), np.float32(ref), atol=1e-3)


def test_int8_gemm_fused_dequant_matches_xla():
    """Fused-dequant int8 GEMM (interpret mode) vs the XLA separate-pass
    lowering, including a ragged (non-block-multiple) M."""
    from flash_diffusion_tpu.ops import gemm

    m, k, n = 777, 512, 256
    xq = jax.random.randint(jax.random.PRNGKey(0), (m, k), -127, 128, jnp.int8)
    wq = jax.random.randint(jax.random.PRNGKey(1), (k, n), -127, 128, jnp.int8)
    sx = jax.random.uniform(jax.random.PRNGKey(2), (m, 1), jnp.float32, 0.001, 0.02)
    sw = jax.random.uniform(jax.random.PRNGKey(3), (1, n), jnp.float32, 0.001, 0.02)
    assert gemm.int8_gemm_eligible(m, k, n)
    y = gemm.int8_gemm(xq, sx, wq, sw, None)
    ref = (
        jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        * sx
        * sw
    )
    rel = np.abs(np.float32(y) - np.array(ref)) / (np.abs(np.array(ref)).max() + 1e-9)
    assert rel.max() < 5e-3, rel.max()

    # gelu epilogue variant
    yg = gemm.int8_gemm(xq, sx, wq, sw, None, act="gelu")
    refg = jax.nn.gelu(ref, approximate=True)
    relg = np.abs(np.float32(yg) - np.array(refg)) / (np.abs(np.array(refg)).max() + 1e-9)
    assert relg.max() < 5e-3, relg.max()


def test_packed_cross_attention_default_dispatch(monkeypatch):
    """Short-KV cross-attention dispatches the packed one-shot kernel by
    default (inference primal) and matches the per-head path bit-for-bit at
    fp32/interpret; the gate turns it off."""
    from flash_diffusion_tpu.ops import attention as A

    q = jax.random.normal(jax.random.PRNGKey(0), (2, 260, 4, 64))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 4, 64))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 4, 64))
    assert A._packed_cross_eligible(q, 77)
    assert not A._packed_cross_eligible(q, 1024)  # self-attn shape: per-head
    out = A._attn_primal(q, k, v, 0.125)
    monkeypatch.setenv("FLASH_TPU_ATTN_PACKED_CROSS", "0")
    ref = A._attn_primal(q, k, v, 0.125)
    assert np.allclose(np.array(out), np.array(ref), atol=2e-2)
