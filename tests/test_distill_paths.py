"""Remaining distillation paths: T2I-adapter conditioning in the train step,
lpips distill loss through the VAE, and gan loss variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_diffusion_tpu.distill import (
    LPIPS,
    ConvDiscriminator,
    DiscriminatorConfig,
    FlashDiffusion,
    FlashDiffusionConfig,
)
from flash_diffusion_tpu.distill.losses import gan_losses
from flash_diffusion_tpu.lora import init_lora, lora_scaling
from flash_diffusion_tpu.models import (
    AutoencoderKL,
    AutoencoderKLConfig,
    T2IAdapter,
    T2IAdapterConfig,
    UNet2DCondition,
    UNetConfig,
)

B, HW, C = 2, 16, 4


def tiny_unet():
    return UNet2DCondition(
        UNetConfig(
            in_channels=C, out_channels=C, block_out_channels=[8, 16],
            down_block_types=["AttnDownBlock2D", "DownBlock2D"], layers_per_block=1,
            transformer_layers_per_block=[1, 1], num_heads=[2, 2],
            cross_attention_dim=None, norm_num_groups=4, mid_block_attn=False,
        )
    )


def test_adapter_train_path():
    """Canny-adapter distillation: adapter residuals flow through student,
    teacher rollout, DMD, and GAN forwards (reference
    train_flash_canny_adapter wiring)."""
    unet = tiny_unet()
    adapter = T2IAdapter(
        T2IAdapterConfig(channels=[8, 16], num_res_blocks=1, downscale_factor=8)
    )
    x = jnp.zeros((B, HW, HW, C))
    t = jnp.zeros((B,), jnp.int32)
    edge = jnp.ones((B, HW * 8, HW * 8, 3))
    adapter_params = adapter.init(jax.random.PRNGKey(0), edge)
    res_shapes = [r.shape for r in adapter.apply(adapter_params, edge)]
    assert res_shapes == [(B, HW, HW, 8), (B, HW // 2, HW // 2, 16)]

    teacher = unet.init(
        jax.random.PRNGKey(1), x, t, None,
        adapter_residuals=[jnp.zeros(s) for s in res_shapes],
    )
    lora = init_lora(teacher, rank=2, rng=jax.random.PRNGKey(2))
    disc = ConvDiscriminator(DiscriminatorConfig(feature_dim=4, num_stages=1))
    disc_params = disc.init(jax.random.PRNGKey(3), jnp.zeros((B, HW // 2, HW // 2, 16)))

    model = FlashDiffusion(
        FlashDiffusionConfig(
            K=[2], num_iterations_per_K=[10], guidance_scale_min=1.0,
            guidance_scale_max=2.0, timestep_distribution="uniform",
            use_dmd_loss=True, gan_loss_type="hinge",
            adapter_input_key="edge", adapter_conditioning_scale=0.5,
        ),
        student_module=unet, teacher_module=unet, adapter=adapter,
        discriminator=disc, lora_scaling=lora_scaling(2),
    )
    frozen = {"teacher": teacher, "adapter": adapter_params}
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(4), (B, HW, HW, C)),
        "edge": edge,
    }
    total, aux = model.losses(
        {"lora": lora, "disc": disc_params}, frozen, batch, jax.random.PRNGKey(5), 0
    )
    assert np.isfinite(float(total))
    assert float(aux["loss/distill"]) > 0

    # adapter input changes the loss (conditioning is live)
    batch2 = dict(batch, edge=jnp.zeros_like(edge))
    total2, _ = model.losses(
        {"lora": lora, "disc": disc_params}, frozen, batch2, jax.random.PRNGKey(5), 0
    )
    assert not np.isclose(float(total), float(total2))


def test_lpips_distill_path():
    """lpips loss: crop → VAE decode → VGG distance, differentiable to LoRA."""
    unet = tiny_unet()
    vae = AutoencoderKL(
        AutoencoderKLConfig(
            block_out_channels=[4, 8], layers_per_block=1, norm_num_groups=2,
            latent_channels=C, mid_block_attn=False,
        )
    )
    lpips = LPIPS()
    x_img = jnp.zeros((B, HW * 2, HW * 2, 3))
    vae_params = vae.init(jax.random.PRNGKey(0), x_img)
    lpips_params = lpips.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 16, 16, 3))
    )
    x = jnp.zeros((B, HW, HW, C))
    t = jnp.zeros((B,), jnp.int32)
    teacher = unet.init(jax.random.PRNGKey(2), x, t, None)
    lora = init_lora(teacher, rank=2, rng=jax.random.PRNGKey(3))

    model = FlashDiffusion(
        FlashDiffusionConfig(
            K=[2], num_iterations_per_K=[10], guidance_scale_min=1.0,
            guidance_scale_max=1.0, timestep_distribution="uniform",
            distill_loss_type="lpips", lpips_crop=8,  # decodes to 16² pixels
        ),
        student_module=unet, teacher_module=unet, vae=vae, lpips=lpips,
        lora_scaling=lora_scaling(2),
    )
    frozen = {"teacher": teacher, "vae": vae_params, "lpips": lpips_params}
    batch = {"image": jax.random.normal(jax.random.PRNGKey(4), (B, HW * 2, HW * 2, 3))}

    def loss_fn(l):
        return model.losses({"lora": l, "disc": {}}, frozen, batch, jax.random.PRNGKey(5), 0)[0]

    loss, grads = jax.value_and_grad(loss_fn)(lora)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0 and np.isfinite(gnorm)


@pytest.mark.parametrize("loss_type", ["wgan", "lsgan", "hinge", "non-saturating", "vanilla"])
def test_all_gan_variants_partition(loss_type):
    disc = ConvDiscriminator(DiscriminatorConfig(feature_dim=4, num_stages=0))
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, 4, 4, 8))
    params = disc.init(jax.random.PRNGKey(1), feats)
    fake = jax.random.normal(jax.random.PRNGKey(2), feats.shape)

    def total(args):
        f, p = args
        g, d = gan_losses(lambda pp, xx: disc.apply(pp, xx), p, f, feats, loss_type)
        return g + d

    g_fake, g_disc = jax.grad(total)((fake, params))
    assert sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g_fake)) > 0
    assert sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g_disc)) > 0


def test_pixart_dit_gan_train_path():
    """Pixart family GAN path: the DiT 'features' are the 4-channel denoised
    output (reference swallows return_intermediate for transformers —
    train_flash_pixart.py builds a color_dim=4 discriminator), so a 4-ch
    disc must train against a DiT teacher end-to-end."""
    from flash_diffusion_tpu.models import DiT, DiTConfig
    from flash_diffusion_tpu.trainer import TrainingConfig, TrainingPipeline

    dit = DiT(
        DiTConfig(
            in_channels=C, out_channels=2 * C, hidden_size=32, depth=2,
            num_heads=2, patch_size=2, cross_attention_dim=24,
            num_vector_embeds=0, sample_size=HW,
        )
    )
    x = jnp.zeros((B, HW, HW, C))
    t = jnp.zeros((B,), jnp.int32)
    cond = {"cond": {"crossattn": jnp.ones((B, 6, 24))}}
    teacher = dit.init(jax.random.PRNGKey(0), x, t, cond)
    lora = init_lora(teacher, rank=2, rng=jax.random.PRNGKey(1))
    disc = ConvDiscriminator(DiscriminatorConfig(feature_dim=8, num_stages=1))
    disc_params = disc.init(jax.random.PRNGKey(2), jnp.zeros((B, HW, HW, C)))

    class FixedCond:
        def __call__(self, params, b, rng=None, ucg_keys=None, set_ucg_rate_zero=False):
            c = dict(cond["cond"])
            if ucg_keys:
                c = {k: jnp.zeros_like(v) for k, v in c.items()}
            return {"cond": c}

        def init(self, rng, b):
            return []

    model = FlashDiffusion(
        FlashDiffusionConfig(
            K=[2], num_iterations_per_K=[10], guidance_scale_min=1.0,
            guidance_scale_max=2.0, timestep_distribution="uniform",
            gan_loss_type="hinge",
        ),
        student_module=dit, teacher_module=dit, conditioner=FixedCond(),
        discriminator=disc, lora_scaling=lora_scaling(2),
    )
    pipe = TrainingPipeline(
        model, TrainingConfig(learning_rates=[1e-3, 1e-3]),
        frozen={"teacher": teacher, "conditioners": []},
        lora_init=lora, disc_init=disc_params,
    )
    state = pipe.init_state()
    state, aux = pipe.step_fn_for_stage(0)(state, pipe.frozen, {"image": x})
    assert np.isfinite(float(aux["loss/generator"]))
    assert np.isfinite(float(aux["loss/gan_d"]))
