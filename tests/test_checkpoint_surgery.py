"""State-dict adaptation / renaming (reference trainer/utils.py:41-224)
and model remat flags."""

import jax
import jax.numpy as jnp
import numpy as np

from flash_diffusion_tpu.trainer import adapt_state_dict, rename_keys


def test_rename_keys_prefix_and_exact():
    tree = {"add_embedding": {"linear_1": {"kernel": jnp.ones((2, 3))}}, "other": {"x": jnp.zeros(1)}}
    out = rename_keys(tree, {"add_embedding": "class_embedding"})
    assert "class_embedding" in out and "add_embedding" not in out
    assert out["class_embedding"]["linear_1"]["kernel"].shape == (2, 3)
    assert "other" in out


def test_adapt_state_dict_grow_and_narrow():
    tree = {"conv_in": {"kernel": jnp.ones((3, 3, 4, 8))}, "keep": {"w": jnp.ones(2)}}
    out = adapt_state_dict(
        tree,
        target_shapes={"conv_in/kernel": (3, 3, 6, 8)},
        key_patterns=[r"conv_in.*"],
    )
    k = np.array(out["conv_in"]["kernel"])
    assert k.shape == (3, 3, 6, 8)
    assert np.allclose(k[:, :, :4, :], 1.0)  # original values preserved
    assert np.allclose(k[:, :, 4:, :], 0.0)  # grown with zeros
    # narrowing
    out2 = adapt_state_dict(
        tree, target_shapes={"conv_in/kernel": (3, 3, 2, 8)}, key_patterns=[r"conv_in.*"]
    )
    assert np.array(out2["conv_in"]["kernel"]).shape == (3, 3, 2, 8)


def test_adapt_state_dict_normal_fill_matches_stats():
    tree = {"w": jnp.ones((4, 4)) * 2.0}
    out = adapt_state_dict(
        tree, target_shapes={"w": (4, 8)}, fill="normal", rng=jax.random.PRNGKey(0)
    )
    w = np.array(out["w"])
    assert w.shape == (4, 8)
    assert np.allclose(w[:, :4], 2.0)  # original slice preserved


def test_unet_remat_matches_no_remat():
    from flash_diffusion_tpu.models import UNet2DCondition, UNetConfig

    kwargs = dict(
        in_channels=4, out_channels=4, block_out_channels=[8, 16],
        down_block_types=["CrossAttnDownBlock2D", "DownBlock2D"], layers_per_block=1,
        transformer_layers_per_block=[1, 1], num_heads=[2, 2],
        cross_attention_dim=8, norm_num_groups=4,
    )
    m_plain = UNet2DCondition(UNetConfig(**kwargs))
    m_remat = UNet2DCondition(UNetConfig(**kwargs, remat=True))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    t = jnp.array([5])
    cond = {"cond": {"crossattn": jnp.ones((1, 4, 8))}}
    params = m_plain.init(jax.random.PRNGKey(1), x, t, cond)
    out_p = m_plain.apply(params, x, t, cond)
    out_r = m_remat.apply(params, x, t, cond)
    assert np.allclose(np.array(out_p), np.array(out_r), atol=1e-5)

    # remat path is differentiable
    g = jax.grad(lambda p: jnp.sum(m_remat.apply(p, x, t, cond) ** 2))(params)
    assert np.isfinite(
        sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    )
