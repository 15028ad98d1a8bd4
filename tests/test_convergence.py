"""Distillation convergence smoke: the student actually learns.

Beyond the reference's single-step behavioral test — run ~40 optimization
steps of pure-distillation (no GAN/DMD noise) on a tiny UNet pair and assert
the distill loss trends down. Guards gradient plumbing end-to-end (LoRA
merge → student forward → rollout target → loss → optax update).
"""

import jax
import jax.numpy as jnp
import numpy as np

from flash_diffusion_tpu.distill import FlashDiffusion, FlashDiffusionConfig
from flash_diffusion_tpu.lora import init_lora, lora_scaling
from flash_diffusion_tpu.models import UNet2DCondition, UNetConfig


def test_distill_loss_decreases():
    B, HW, C = 4, 8, 4
    unet = UNet2DCondition(
        UNetConfig(
            in_channels=C, out_channels=C, block_out_channels=[8, 16],
            down_block_types=["AttnDownBlock2D", "DownBlock2D"], layers_per_block=1,
            transformer_layers_per_block=[1, 1], num_heads=[2, 2],
            cross_attention_dim=None, norm_num_groups=4, mid_block_attn=False,
        )
    )
    x = jnp.zeros((B, HW, HW, C))
    t = jnp.zeros((B,), jnp.int32)
    teacher = unet.init(jax.random.PRNGKey(0), x, t, None)
    lora = init_lora(teacher, rank=4, rng=jax.random.PRNGKey(1))

    model = FlashDiffusion(
        FlashDiffusionConfig(
            K=[2], num_iterations_per_K=[1000], guidance_scale_min=1.0,
            guidance_scale_max=1.0, timestep_distribution="uniform",
            distill_loss_type="l2", use_dmd_loss=False,
        ),
        student_module=unet,
        teacher_module=unet,
        lora_scaling=lora_scaling(4),
    )
    import optax

    # differently-initialized student base: at init there is a real gap to
    # the teacher rollout for the LoRA to close (a tied base with a fixed
    # draw can start at loss ≈ 0)
    student_base = unet.init(jax.random.PRNGKey(7), x, t, None)
    frozen = {"teacher": teacher, "student_base": student_base}
    batch = {"image": jax.random.normal(jax.random.PRNGKey(2), (B, HW, HW, C))}
    # FIXED key ⇒ deterministic noising/target: the student must drive the
    # loss toward zero (overfit one specific rollout)
    fixed_key = jax.random.PRNGKey(3)
    tx = optax.adam(1e-2)
    opt = tx.init(lora)

    @jax.jit
    def train_step(lora, opt):
        def loss_fn(l):
            return model.losses({"lora": l, "disc": {}}, frozen, batch, fixed_key, 0)[0]

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, opt = tx.update(grads, opt, lora)
        return optax.apply_updates(lora, updates), opt, loss

    losses = []
    cur = lora
    for _ in range(60):
        cur, opt, loss = train_step(cur, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.55, f"no learning: {losses[0]:.4f} → {losses[-1]:.4f}"
    assert np.isfinite(losses[-1])
