"""LoRA param-tree transform + PEFT safetensors round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from flash_diffusion_tpu.lora import (
    from_peft,
    init_lora,
    lora_paths,
    lora_scaling,
    merge_lora,
    to_peft,
)

PARAMS = {
    "block_0": {
        "attn1": {"to_q": {"kernel": jnp.ones((8, 8))}, "to_out": {"kernel": jnp.ones((8, 8)), "bias": jnp.zeros((8,))}},
        "ff_in": {"kernel": jnp.ones((8, 16))},
        "norm": {"scale": jnp.ones((8,))},
    },
    "conv_in": {"kernel": jnp.ones((3, 3, 4, 8))},
}


def test_lora_paths_select_attention_and_ff_only():
    paths = lora_paths(PARAMS)
    assert "block_0/attn1/to_q/kernel" in paths
    assert "block_0/attn1/to_out/kernel" in paths
    assert "block_0/ff_in/kernel" in paths
    assert all("norm" not in p and "bias" not in p and "conv_in" not in p for p in paths)


def test_merge_changes_only_targets():
    lora = init_lora(PARAMS, rank=2, rng=jax.random.PRNGKey(0))
    # push B away from zero so the delta is visible
    lora = jax.tree_util.tree_map(lambda x: x + 0.1, lora)
    merged = merge_lora(PARAMS, lora, scaling=lora_scaling(2, alpha=4))
    flat_m = traverse_util.flatten_dict(merged, sep="/")
    flat_p = traverse_util.flatten_dict(PARAMS, sep="/")
    for k in flat_p:
        if k in lora_paths(PARAMS):
            assert not np.allclose(np.array(flat_m[k]), np.array(flat_p[k])), k
        else:
            assert np.allclose(np.array(flat_m[k]), np.array(flat_p[k])), k


def test_peft_roundtrip_preserves_merge():
    lora = init_lora(PARAMS, rank=2, rng=jax.random.PRNGKey(1))
    lora = jax.tree_util.tree_map(
        lambda x: x + jnp.arange(x.size, dtype=x.dtype).reshape(x.shape) * 0.01, lora
    )
    tensors = to_peft(lora, prefix="unet")
    assert any(k.endswith(".lora_A.weight") for k in tensors)
    assert any(k.endswith(".lora_B.weight") for k in tensors)
    # torch Linear layout: A is [r, in]
    a_key = "unet.block_0.attn1.to_q.lora_A.weight"
    assert tensors[a_key].shape == (2, 8)

    back, scaling = from_peft(tensors, PARAMS, prefix="unet")
    m1 = merge_lora(PARAMS, lora, 1.0)
    m2 = merge_lora(PARAMS, back, 1.0)
    for a, b in zip(jax.tree_util.tree_leaves(m1), jax.tree_util.tree_leaves(m2)):
        assert np.allclose(np.array(a), np.array(b), atol=1e-6)
    assert scaling == 1.0


def test_peft_safetensors_file_roundtrip(tmp_path):
    from flash_diffusion_tpu.lora import load_peft_safetensors, save_peft_safetensors

    lora = init_lora(PARAMS, rank=2, rng=jax.random.PRNGKey(2))
    path = str(tmp_path / "adapter.safetensors")
    save_peft_safetensors(path, lora, prefix="unet")
    back, _ = load_peft_safetensors(path, PARAMS, prefix="unet")
    for a, b in zip(jax.tree_util.tree_leaves(lora), jax.tree_util.tree_leaves(back)):
        assert np.allclose(np.array(a), np.array(b), atol=1e-6)


def test_sidepath_matches_merged_forward_and_grads_flow():
    """LoraDense side path (y = x·W + (x·A)·B via the "lora" collection)
    must equal the weight-merged forward; grads must reach every factor."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flash_diffusion_tpu.lora import (
        init_lora,
        lora_collection,
        lora_is_dense_only,
        merge_lora,
    )
    from flash_diffusion_tpu.models import UNet2DCondition, UNetConfig

    unet = UNet2DCondition(
        UNetConfig(
            in_channels=4, out_channels=4, block_out_channels=[16, 32],
            down_block_types=["CrossAttnDownBlock2D", "DownBlock2D"],
            layers_per_block=1, transformer_layers_per_block=[1, 1],
            num_heads=[2, 2], cross_attention_dim=16, norm_num_groups=8,
        )
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 16, 4))
    t = jnp.zeros((2,), jnp.int32)
    cond = {"cond": {"crossattn": jax.random.normal(rng, (2, 8, 16))}}
    params = unet.init(jax.random.PRNGKey(1), x, t, cond)
    lora = init_lora(params, rank=4, rng=jax.random.PRNGKey(2))
    lora = jax.tree_util.tree_map(lambda v: v + 0.05, lora)  # nonzero delta
    assert lora_is_dense_only(lora)

    scaling = 1.37
    y_merged = unet.apply(merge_lora(params, lora, scaling), x, t, cond)
    y_side = unet.apply({**params, "lora": lora_collection(lora, scaling)}, x, t, cond)
    np.testing.assert_allclose(np.array(y_side), np.array(y_merged), atol=1e-4)

    def loss(l):
        y = unet.apply({**params, "lora": lora_collection(l, scaling)}, x, t, cond)
        return jnp.mean(y**2)

    g = jax.grad(loss)(lora)
    assert all(float(jnp.abs(v).sum()) > 0 for v in jax.tree_util.tree_leaves(g))
