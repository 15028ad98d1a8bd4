"""int8 W8A8 inference quantization: math bounds, tree transform, pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_diffusion_tpu.quant import int8_matmul, quantize_dense, quantize_weight


def test_int8_matmul_error_bound():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    w = jax.random.normal(k1, (512, 384), jnp.float32)
    x = jax.random.normal(k2, (8, 512), jnp.float32)
    wq, scale = quantize_weight(w)
    assert wq.dtype == jnp.int8 and scale.shape == (384,)
    y = int8_matmul(x, wq, scale)
    ref = x @ w
    rel = np.linalg.norm(np.array(y - ref)) / np.linalg.norm(np.array(ref))
    # per-channel W8 + per-token A8 on gaussian data: ~0.5-1% typical
    assert rel < 0.02, rel


def test_quantize_dense_transform_and_apply():
    from flash_diffusion_tpu.models.layers import LoraDense

    class MLP:  # simple two-layer stack via flax
        pass

    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = LoraDense(64, name="big")(x)
            return LoraDense(4, name="head")(x)

    net = Net()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 48))
    params = net.init(jax.random.PRNGKey(2), x)
    ref = net.apply(params, x)

    qparams, n = quantize_dense(params, min_dim=32, include=None)
    # only "big" (48x64) passes min_dim=32; "head" (64x4) does not
    assert n == 1
    assert qparams["params"]["big"]["kernel"].dtype == jnp.int8
    assert "kernel_scale" in qparams["params"]["big"]
    assert qparams["params"]["head"]["kernel"].dtype != jnp.int8

    out = net.apply(qparams, x)
    rel = np.linalg.norm(np.array(out - ref)) / np.linalg.norm(np.array(ref))
    assert rel < 0.05, rel

    # include/exclude filters
    _, n_exc = quantize_dense(params, min_dim=32, include=None, exclude="big")
    assert n_exc == 0


def test_quantize_dense_lora_side_path_preserved():
    """LoRA 'lora'-collection side path still applies on the int8 branch."""
    from flash_diffusion_tpu.models.layers import LoraDense

    dense = LoraDense(64)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 48))
    params = dense.init(jax.random.PRNGKey(4), x)
    qparams, n = quantize_dense(params, min_dim=32, include=None)
    assert n == 1
    base = dense.apply(qparams, x)

    lora = {
        "kernel": {
            "a": jnp.full((48, 2), 0.1, jnp.float32),
            "b": jnp.full((2, 64), 0.1, jnp.float32),
        }
    }
    out = dense.apply({**qparams, "lora": lora}, x)
    expect_delta = (x @ lora["kernel"]["a"]) @ lora["kernel"]["b"]
    assert np.allclose(np.array(out - base), np.array(expect_delta), atol=1e-4)


def test_pipeline_int8_mode():
    from tests.test_serving import _tiny_pipeline

    pipe = _tiny_pipeline()
    ref = pipe.generate(["cat"], num_inference_steps=2, guidance_scale=0.0)
    pipe.quantize("int8", min_dim=8)
    out = pipe.generate(["cat"], num_inference_steps=2, guidance_scale=0.0)
    assert out.shape == ref.shape and np.all(np.isfinite(np.array(out)))
    # int8 drift through a 2-step sampler stays bounded on the tiny model
    rel = np.linalg.norm(np.array(out - ref)) / max(
        1e-6, np.linalg.norm(np.array(ref))
    )
    assert rel < 0.5, rel
    # back to full precision restores the original result
    pipe.quantize("none")
    out2 = pipe.generate(["cat"], num_inference_steps=2, guidance_scale=0.0)
    assert np.allclose(np.array(out2), np.array(ref), atol=1e-6)


def test_pipeline_int8_no_match_raises():
    from tests.test_serving import _tiny_pipeline

    pipe = _tiny_pipeline()
    with pytest.raises(ValueError):
        pipe.quantize("int8", min_dim=4096)


def test_quantize_dense_allowlist_protects_plain_dense():
    """Default include-set must skip scopes without an int8 branch (e.g.
    MMDiT's context_embedder is a plain nn.Dense — an int8 kernel there
    would be silently upcast WITHOUT its scale)."""
    w = jnp.ones((512, 512), jnp.float32)
    tree = {
        "params": {
            "context_embedder": {"kernel": w},
            "blocks_0": {"attn": {"to_q": {"kernel": w}}},
        }
    }
    q, n = quantize_dense(tree)
    assert n == 1
    assert q["params"]["context_embedder"]["kernel"].dtype == jnp.float32
    assert q["params"]["blocks_0"]["attn"]["to_q"]["kernel"].dtype == jnp.int8


def test_int8_conv_and_resnet_block():
    """QConv int8 branch == float conv within W8A8 error; ResnetBlock2D
    end-to-end with quantized convs stays close."""
    from flash_diffusion_tpu.models.layers import ResnetBlock2D
    from flash_diffusion_tpu.quant import int8_conv

    # op-level bound
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    x = jax.random.normal(k1, (2, 16, 16, 64), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 64, 96), jnp.float32) * 0.05
    wq, scale = quantize_weight(w)
    y = int8_conv(x, wq, scale, (1, 1), ((1, 1), (1, 1)))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    rel = np.linalg.norm(np.array(y - ref)) / np.linalg.norm(np.array(ref))
    assert rel < 0.03, rel

    block = ResnetBlock2D(out_channels=32, groups=4)
    bx = jax.random.normal(jax.random.PRNGKey(8), (2, 8, 8, 16), jnp.float32)
    params = block.init(jax.random.PRNGKey(9), bx)
    ref_out = block.apply(params, bx)
    qparams, n = quantize_dense(params, convs=True, conv_min_dim=8)
    assert n >= 2  # conv1, conv2 (+ shortcut)
    out = block.apply(qparams, bx)
    rel = np.linalg.norm(np.array(out - ref_out)) / np.linalg.norm(np.array(ref_out))
    assert rel < 0.1, rel


def test_quantize_dense_never_touches_root_proj_out_head():
    """The DiT/MMDiT patch-unembed head is a ROOT-level plain nn.Dense also
    named "proj_out" (no int8 branch — an int8 kernel would be silently
    upcast without its scale). The depth anchor must exclude it at ANY
    min_dim, while nested LoraDense proj_out modules still quantize."""
    params = {
        "params": {
            "blocks_0": {"ff": {"proj_out": {"kernel": jnp.ones((512, 512))}}},
            "proj_out": {"kernel": jnp.ones((512, 512))},  # unembed head
        }
    }
    out, n = quantize_dense(params, min_dim=32)
    assert n == 1
    assert out["params"]["blocks_0"]["ff"]["proj_out"]["kernel"].dtype == jnp.int8
    assert out["params"]["proj_out"]["kernel"].dtype == jnp.float32  # untouched
    # same without the "params" wrapper (callers pass inner trees too)
    out2, n2 = quantize_dense(params["params"], min_dim=32)
    assert n2 == 1 and out2["proj_out"]["kernel"].dtype == jnp.float32
