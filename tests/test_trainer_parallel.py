"""Trainer mechanics + multi-device data parallelism on the 8-CPU mesh.

The reference has no distributed tests (SURVEY.md §4 gap); these validate
the mesh DP path: sharded batches, identical results to single-device,
alternating-GAN parity semantics, checkpoint save/restore, EMA.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_diffusion_tpu.parallel import batch_sharding, create_mesh, replicate, shard_batch
from flash_diffusion_tpu.trainer import TrainingConfig, restore_state, save_state
from flash_diffusion_tpu.utils import init_ema, update_ema


def test_mesh_and_batch_sharding():
    assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
    mesh = create_mesh()
    batch = {"x": jnp.arange(16.0).reshape(8, 2), "s": ["a"] * 8}
    # non-array leaves should be left alone by callers; shard arrays only
    sharded = shard_batch({"x": batch["x"]}, mesh)
    assert sharded["x"].sharding.is_equivalent_to(batch_sharding(mesh), 2)

    @jax.jit
    def mean_sq(x):
        return jnp.mean(x**2)

    out = mean_sq(sharded["x"])
    assert np.isclose(float(out), float(np.mean(np.arange(16.0) ** 2)))


def test_dp_grads_match_single_device():
    """psum-by-jit: gradient over a sharded batch == unsharded gradient."""
    mesh = create_mesh()
    w = jnp.ones((4, 4))
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4))

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_ref = jax.grad(loss)(w, x)
    xs = jax.device_put(x, batch_sharding(mesh))
    wr = replicate(w, mesh)
    g_dp = jax.jit(jax.grad(loss))(wr, xs)
    assert np.allclose(np.array(g_ref), np.array(g_dp), atol=1e-6)


def test_training_config_optimizer_build():
    cfg = TrainingConfig(
        optimizers_name=["AdamW", "SGD"],
        learning_rates=[1e-4, 1e-3],
        lr_schedulers_name=["warmup_cosine", None],
        lr_schedulers_kwargs=[{"warmup_steps": 10, "decay_steps": 100}, None],
        gradient_clip_norm=1.0,
    )
    tx0 = cfg.build_optimizer(0)
    tx1 = cfg.build_optimizer(1)
    params = {"w": jnp.ones((3,))}
    s0 = tx0.init(params)
    u, _ = tx0.update({"w": jnp.ones((3,))}, s0, params)
    assert jax.tree_util.tree_leaves(u)[0].shape == (3,)
    s1 = tx1.init(params)
    u1, _ = tx1.update({"w": jnp.ones((3,))}, s1, params)
    # global-norm clip: ||(1,1,1)|| = √3 > 1 → scaled to 1/√3, then ·lr
    assert np.allclose(np.array(u1["w"]), -1e-3 / np.sqrt(3), atol=1e-8)


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "lora": {"a": jnp.arange(4.0)},
        "step": jnp.int32(7),
    }
    d = str(tmp_path / "ckpt")
    save_state(d, 7, jax.device_get(state))
    like = {"lora": {"a": jnp.zeros(4)}, "step": jnp.int32(0)}
    restored, step = restore_state(d, like)
    assert step == 7
    assert np.allclose(np.array(restored["lora"]["a"]), [0, 1, 2, 3])
    assert int(restored["step"]) == 7


def test_ema_updates():
    p = {"w": jnp.zeros(3)}
    ema = init_ema(p)
    p2 = {"w": jnp.ones(3)}
    ema = update_ema(ema, p2, decay=0.9)
    assert np.allclose(np.array(ema["w"]), 0.1)
    ema = update_ema(ema, p2, decay=0.9)
    assert np.allclose(np.array(ema["w"]), 0.19)


def test_alternating_gan_update_parity():
    """alternating mode: G updates on even steps only, D on odd only."""
    from flash_diffusion_tpu.distill import (
        ConvDiscriminator,
        DiscriminatorConfig,
        FlashDiffusion,
        FlashDiffusionConfig,
    )
    from flash_diffusion_tpu.lora import init_lora, lora_scaling
    from flash_diffusion_tpu.models import UNet2DCondition, UNetConfig
    from flash_diffusion_tpu.trainer import TrainingPipeline

    B, HW, C = 2, 16, 4
    unet = UNet2DCondition(
        UNetConfig(
            in_channels=C, out_channels=C, block_out_channels=[8, 16],
            down_block_types=["AttnDownBlock2D", "DownBlock2D"], layers_per_block=1,
            transformer_layers_per_block=[1, 1], num_heads=[2, 2],
            cross_attention_dim=None, norm_num_groups=4, mid_block_attn=False,
        )
    )
    x = jnp.ones((B, HW, HW, C))
    t = jnp.zeros((B,), jnp.int32)
    teacher = unet.init(jax.random.PRNGKey(0), x, t, None)
    disc = ConvDiscriminator(DiscriminatorConfig(feature_dim=4, num_stages=1))
    disc_params = disc.init(jax.random.PRNGKey(1), jnp.zeros((B, HW // 2, HW // 2, 16)))
    lora = init_lora(teacher, rank=2, rng=jax.random.PRNGKey(2))

    model = FlashDiffusion(
        FlashDiffusionConfig(
            K=[2], num_iterations_per_K=[10], guidance_scale_min=1.0,
            guidance_scale_max=2.0, timestep_distribution="uniform",
            gan_loss_type="hinge", gan_update_mode="alternating",
        ),
        student_module=unet, teacher_module=unet, discriminator=disc,
        lora_scaling=lora_scaling(2),
    )
    pipe = TrainingPipeline(
        model, TrainingConfig(learning_rates=[1e-2, 1e-2]),
        frozen={"teacher": teacher}, lora_init=lora, disc_init=disc_params,
    )
    state = pipe.init_state()
    assert pipe.alternating
    batch = {"image": jax.random.normal(jax.random.PRNGKey(3), (B, HW, HW, C))}

    def step(state, frozen, batch):
        # fit()'s phase selection: even steps run the generator variant,
        # odd steps the discriminator variant (each pays ONE backward)
        phase = "g" if int(state.step) % 2 == 0 else "d"
        return pipe.step_fn_for_stage(0, phase)(state, frozen, batch)

    d0 = jax.device_get(state.disc)
    l0 = jax.device_get(state.lora)
    state, _ = step(state, pipe.frozen, batch)  # step 0 (even): G only
    assert any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(l0), jax.tree_util.tree_leaves(jax.device_get(state.lora)))
    )
    assert all(
        np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(d0), jax.tree_util.tree_leaves(jax.device_get(state.disc)))
    )
    d1 = jax.device_get(state.disc)
    l1 = jax.device_get(state.lora)
    state, _ = step(state, pipe.frozen, batch)  # step 1 (odd): D only
    assert all(
        np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(l1), jax.tree_util.tree_leaves(jax.device_get(state.lora)))
    )
    assert any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(d1), jax.tree_util.tree_leaves(jax.device_get(state.disc)))
    )
