"""End-to-end distillation behavior on tiny models.

Mirrors the reference's core behavioral test
(reference: tests/test_flash/test_flash_diffusion.py:146-222): a full
forward produces positive generator and discriminator losses; an optimizer
step changes the student LoRA and discriminator but leaves the teacher
untouched; sampling produces finite outputs of the right shape.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from flash_diffusion_tpu.distill import (
    ConvDiscriminator,
    DiscriminatorConfig,
    FlashDiffusion,
    FlashDiffusionConfig,
    FlashDiffusionSD3,
    FlashDiffusionSD3Config,
)
from flash_diffusion_tpu.lora import init_lora, lora_scaling, merge_lora
from flash_diffusion_tpu.models import MMDiTConfig, MMDiT, UNet2DCondition, UNetConfig
from flash_diffusion_tpu.models.embedders import (
    ClipEmbedder,
    ClipEmbedderConfig,
    ConditionerWrapper,
)
from flash_diffusion_tpu.trainer import TrainingConfig, TrainingPipeline

B, HW, C = 2, 16, 4


def tiny_unet():
    return UNet2DCondition(
        UNetConfig(
            in_channels=C,
            out_channels=C,
            block_out_channels=[16, 32],
            down_block_types=["CrossAttnDownBlock2D", "DownBlock2D"],
            layers_per_block=1,
            transformer_layers_per_block=[1, 1],
            num_heads=[2, 2],
            cross_attention_dim=16,
            norm_num_groups=8,
        )
    )


def tiny_conditioner():
    emb = ClipEmbedder(
        ClipEmbedderConfig(
            input_key="text",
            ucg_rate=0.1,
            text_embedder_config=dict(
                vocab_size=64,
                hidden_size=16,
                intermediate_size=32,
                num_layers=1,
                num_heads=2,
                max_positions=8,
                eos_token_id=63,
            ),
        )
    )
    return ConditionerWrapper([emb])


def make_batch(rng):
    k1, k2 = jax.random.split(rng)
    return {
        "image": jax.random.normal(k1, (B, HW, HW, C)),
        "text_ids": jax.random.randint(k2, (B, 8), 0, 63),
    }


@pytest.fixture(scope="module")
def setup():
    rng = jax.random.PRNGKey(0)
    unet = tiny_unet()
    cond = tiny_conditioner()
    disc = ConvDiscriminator(DiscriminatorConfig(feature_dim=8, num_stages=1))
    batch = make_batch(rng)

    x = batch["image"]
    t = jnp.zeros((B,), jnp.int32)
    dummy_cond = {"cond": {"crossattn": jnp.zeros((B, 8, 16))}}
    teacher_params = unet.init(jax.random.PRNGKey(1), x, t, dummy_cond)
    cond_params = cond.init(jax.random.PRNGKey(2), batch)
    disc_params = disc.init(jax.random.PRNGKey(3), jnp.zeros((B, HW // 2, HW // 2, 32)))
    lora = init_lora(teacher_params, rank=2, rng=jax.random.PRNGKey(4))

    config = FlashDiffusionConfig(
        K=[2, 2],
        num_iterations_per_K=[2, 2],
        guidance_scale_min=1.0,
        guidance_scale_max=3.0,
        distill_loss_type="l2",
        timestep_distribution="mixture",
        mixture_num_components=2,
        use_dmd_loss=True,
        gan_loss_type="hinge",
    )
    model = FlashDiffusion(
        config,
        student_module=unet,
        teacher_module=unet,
        conditioner=cond,
        discriminator=disc,
        lora_scaling=lora_scaling(2),
    )
    frozen = {"teacher": teacher_params, "conditioners": cond_params}
    trainable = {"lora": lora, "disc": disc_params}
    return model, frozen, trainable, batch


def test_losses_positive_and_finite(setup):
    model, frozen, trainable, batch = setup
    total, aux = model.losses(trainable, frozen, batch, jax.random.PRNGKey(5), stage=0)
    assert np.isfinite(float(total))
    assert float(aux["loss/distill"]) > 0
    assert np.isfinite(float(aux["loss/dmd"]))
    assert np.isfinite(float(aux["loss/gan_g"]))
    assert float(aux["loss/gan_d"]) > 0


def test_gradients_partition_cleanly(setup):
    """G-losses produce grads only in lora; D-loss only in disc."""
    model, frozen, trainable, batch = setup

    def loss_fn(tr):
        return model.losses(tr, frozen, batch, jax.random.PRNGKey(6), stage=0)[0]

    grads = jax.grad(loss_fn)(trainable)
    lora_norms = [float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["lora"])]
    disc_norms = [float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["disc"])]
    assert sum(lora_norms) > 0, "student LoRA must receive gradient"
    assert sum(disc_norms) > 0, "discriminator must receive gradient"
    assert all(np.isfinite(v) for v in lora_norms + disc_norms)


def test_train_step_updates_student_and_disc_not_teacher(setup):
    model, frozen, trainable, batch = setup
    tc = TrainingConfig(learning_rates=[1e-3, 1e-3], log_every_n_steps=1000)
    pipe = TrainingPipeline(model, tc, frozen, trainable["lora"], trainable["disc"])
    state = pipe.init_state()
    step = pipe.step_fn_for_stage(0)

    lora_before = jax.device_get(state.lora)
    disc_before = jax.device_get(state.disc)
    teacher_before = jax.device_get(pipe.frozen["teacher"])

    state, aux = step(state, pipe.frozen, batch)
    state, aux = step(state, pipe.frozen, batch)
    assert int(state.step) == 2

    changed = lambda a, b: any(
        not np.allclose(x, y)
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(jax.device_get(b)))
    )
    assert changed(lora_before, state.lora)
    assert changed(disc_before, state.disc)
    assert not changed(teacher_before, pipe.frozen["teacher"])


def test_sampling_shapes_and_finiteness(setup):
    model, frozen, trainable, batch = setup
    z = jax.random.normal(jax.random.PRNGKey(7), (B, HW, HW, C))
    out = model.sample(
        frozen, trainable["lora"], z, batch, num_steps=2, guidance_scale=1.0,
        decode=False, rng=jax.random.PRNGKey(8),
    )
    assert out.shape == z.shape
    assert np.all(np.isfinite(np.array(out)))
    # CFG path (2 forwards)
    out_cfg = model.sample(
        frozen, trainable["lora"], z, batch, num_steps=2, guidance_scale=3.0,
        decode=False, rng=jax.random.PRNGKey(8),
    )
    assert out_cfg.shape == z.shape
    assert not np.allclose(np.array(out), np.array(out_cfg))


def test_lora_merge_zero_init_is_identity(setup):
    model, frozen, trainable, _ = setup
    merged = merge_lora(frozen["teacher"], trainable["lora"], 1.0)
    for a, b in zip(
        jax.tree_util.tree_leaves(frozen["teacher"]), jax.tree_util.tree_leaves(merged)
    ):
        assert np.allclose(np.array(a), np.array(b)), "B=0 ⇒ merged == base"


def test_sd3_losses_and_sampling():
    rng = jax.random.PRNGKey(0)
    mmdit = MMDiT(
        MMDiTConfig(
            in_channels=C, out_channels=C, hidden_size=16, depth=2, num_heads=2,
            joint_attention_dim=12, pooled_projection_dim=8, sample_size=HW,
        )
    )
    x = jax.random.normal(rng, (B, HW, HW, C))
    t = jnp.zeros((B,), jnp.float32)
    cond = {"cond": {"crossattn": jnp.ones((B, 6, 12)), "vector": jnp.ones((B, 8))}}
    teacher_params = mmdit.init(jax.random.PRNGKey(1), x, t, cond)
    disc = ConvDiscriminator(DiscriminatorConfig(feature_dim=8, num_stages=1))
    disc_params = disc.init(jax.random.PRNGKey(2), jnp.zeros((B, HW, HW, C)))
    lora = init_lora(teacher_params, rank=2, rng=jax.random.PRNGKey(3))

    cfg = FlashDiffusionSD3Config(
        K=[2], num_iterations_per_K=[2], guidance_scale_min=1.0, guidance_scale_max=3.0,
        distill_loss_type="l2", timestep_distribution="uniform", use_dmd_loss=True,
        gan_loss_type="lsgan",
    )

    class FixedCond:
        def __call__(self, params, batch, rng=None, ucg_keys=None, set_ucg_rate_zero=False):
            c = dict(cond["cond"])
            if ucg_keys:
                c = {k: jnp.zeros_like(v) for k, v in c.items()}
            return {"cond": c}

        def init(self, rng, batch):
            return []

    model = FlashDiffusionSD3(
        cfg, student_module=mmdit, teacher_module=mmdit,
        conditioner=FixedCond(), discriminator=disc, lora_scaling=lora_scaling(2),
    )
    frozen = {"teacher": teacher_params, "conditioners": []}
    trainable = {"lora": lora, "disc": disc_params}
    batch = {"image": x}
    total, aux = model.losses(trainable, frozen, batch, jax.random.PRNGKey(4), stage=0)
    assert np.isfinite(float(total))
    assert float(aux["loss/distill"]) > 0
    assert np.isfinite(float(aux["loss/dmd"]))
    assert np.isfinite(float(aux["loss/gan_d"]))

    z = jax.random.normal(jax.random.PRNGKey(5), (B, HW, HW, C))
    out = model.sample(frozen, lora, z, batch, num_steps=2, decode=False)
    assert out.shape == z.shape
    assert np.all(np.isfinite(np.array(out)))
