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
