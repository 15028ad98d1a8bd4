"""switch_teacher: at a K-changing stage boundary the teacher becomes the
merged student (the reference's never-assigned-attribute bug as a working
feature; reference flash_diffusion_model.py:228-233, SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from flash_diffusion_tpu.distill import FlashDiffusion, FlashDiffusionConfig
from flash_diffusion_tpu.lora import init_lora, lora_scaling
from flash_diffusion_tpu.models import UNet2DCondition, UNetConfig
from flash_diffusion_tpu.trainer import TrainingConfig, TrainingPipeline


def test_teacher_switches_at_stage_boundary():
    B, HW, C = 2, 8, 4
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
    lora = init_lora(teacher, rank=2, rng=jax.random.PRNGKey(1))
    # non-zero LoRA so the merged student differs from the teacher
    lora = jax.tree_util.tree_map(lambda v: v + 0.05, lora)

    model = FlashDiffusion(
        FlashDiffusionConfig(
            K=[2, 3], num_iterations_per_K=[2, 2], guidance_scale_min=1.0,
            guidance_scale_max=1.0, timestep_distribution="uniform",
            switch_teacher=True,
        ),
        student_module=unet, teacher_module=unet, lora_scaling=lora_scaling(2),
    )
    pipe = TrainingPipeline(
        model, TrainingConfig(optimizers_name=["AdamW"], learning_rates=[1e-4]),
        frozen={"teacher": teacher}, lora_init=lora,
    )
    teacher_before = jax.device_get(pipe.frozen["teacher"])

    batch = {"image": jax.random.normal(jax.random.PRNGKey(2), (B, HW, HW, C))}
    data = iter([batch] * 4)
    pipe.fit(data, max_steps=4)

    teacher_after = jax.device_get(pipe.frozen["teacher"])
    changed = any(
        not np.allclose(a, b)
        for a, b in zip(
            jax.tree_util.tree_leaves(teacher_before), jax.tree_util.tree_leaves(teacher_after)
        )
    )
    assert changed, "teacher must be replaced by the merged student at the K boundary"
