"""Flash-SD + Canny T2I-Adapter: edge-conditioned 4-NFE distillation.

TPU-native analog of the reference entry script
(reference: examples/train_flash_canny_adapter.py): SD1.5 UNet teacher with
T2I-Adapter residuals from a Canny edge map (dependency-free Canny mapper in
the data chain), LoRA rank 128 student.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from common import build_data, init_params_shape_only, load_yaml, maybe_import, parse_args, setup_logging, maybe_resume

from flash_diffusion_tpu.data import CannyEdgeMapper, CannyEdgeMapperConfig
from flash_diffusion_tpu.distill import (
    ConvDiscriminator,
    DiscriminatorConfig,
    FlashDiffusion,
    FlashDiffusionConfig,
)
from flash_diffusion_tpu.lora import init_lora, lora_scaling
from flash_diffusion_tpu.models import (
    AutoencoderKL,
    T2IAdapter,
    T2IAdapterConfig,
    UNet2DCondition,
    sd15_unet_config,
    sd_vae_config,
)
from flash_diffusion_tpu.models.embedders import ClipEmbedder, ClipEmbedderConfig, ConditionerWrapper
from flash_diffusion_tpu.schedulers import SchedulerConfig
from flash_diffusion_tpu.trainer import CheckpointCallback, MetricLogger, TrainingConfig, TrainingPipeline
from flash_diffusion_tpu.utils.hf import import_clip_text, import_unet, import_vae


def main():
    args = parse_args()
    cfg = load_yaml(args.config)
    setup_logging(args.output_dir)
    root = args.weights_root or cfg.get("WEIGHTS_ROOT", "")

    unet_cfg = sd15_unet_config(remat=True)  # rematerialize blocks: the K-step rollout + student backward
    # does not fit HBM at train res without it
    unet = UNet2DCondition(unet_cfg, dtype=jnp.bfloat16)
    vae_cfg = sd_vae_config()
    vae = AutoencoderKL(vae_cfg, dtype=jnp.bfloat16)
    adapter_cfg = T2IAdapterConfig()
    adapter = T2IAdapter(adapter_cfg, dtype=jnp.bfloat16)
    conditioner = ConditionerWrapper(
        [ClipEmbedder(ClipEmbedderConfig(input_key="text", layer="last"))]
    )
    mid_hw = cfg.get("IMAGE_SIZE", 512) // 64
    num_stages = max(0, int(math.log2(max(mid_hw // 4, 1))))
    disc = ConvDiscriminator(DiscriminatorConfig(feature_dim=64, num_stages=num_stages))

    rng = jax.random.PRNGKey(cfg.get("SEED", 0))
    size = cfg.get("IMAGE_SIZE", 512)
    lat = size // 8
    dummy_cond = {"cond": {"crossattn": jnp.zeros((1, 77, 768))}}
    teacher_params = maybe_import(
        os.path.join(root, "unet/diffusion_pytorch_model.safetensors"),
        import_unet, unet_cfg, args.random_init,
        lambda: init_params_shape_only(
            unet, jnp.zeros((1, lat, lat, 4)), jnp.zeros((1,), jnp.int32), dummy_cond
        ),
    )
    vae_params = maybe_import(
        os.path.join(root, "vae/diffusion_pytorch_model.safetensors"),
        import_vae, vae_cfg, args.random_init,
        lambda: init_params_shape_only(vae, jnp.zeros((1, 64, 64, 3))),
    )
    clip_params = maybe_import(
        os.path.join(root, "text_encoder/model.safetensors"),
        import_clip_text, conditioner.conditioners[0].encoder_config, args.random_init,
        lambda: conditioner.conditioners[0].init(rng, {"text_ids": jnp.zeros((1, 77), jnp.int32)}),
    )
    adapter_params = init_params_shape_only(adapter, jnp.zeros((1, size, size, 3)))
    disc_params = disc.init(rng, jnp.zeros((1, mid_hw, mid_hw, 1280)))

    rank = cfg.get("LORA_RANK", 128)
    lora = init_lora(teacher_params, rank=rank, rng=rng)

    model = FlashDiffusion(
        FlashDiffusionConfig(
            K=cfg["K"],
            num_iterations_per_K=cfg["NUM_ITERATIONS_PER_K"],
            guidance_scale_min=float(cfg["GUIDANCE_MIN"]),
            guidance_scale_max=float(cfg["GUIDANCE_MAX"]),
            distill_loss_type=cfg.get("DISTILL_LOSS_TYPE", "l2"),
            timestep_distribution=cfg["TIMESTEP_DISTRIBUTION"],
            mixture_num_components=cfg["MIXTURE_NUM_COMPONENTS"],
            mixture_var=cfg["MIXTURE_VAR"],
            use_dmd_loss=cfg["USE_DMD_LOSS"],
            dmd_loss_scale=cfg["DMD_LOSS_SCALE"],
            distill_loss_scale=cfg["DISTILL_LOSS_SCALE"],
            adversarial_loss_scale=cfg["ADVERSARIAL_LOSS_SCALE"],
            gan_loss_type=cfg["GAN_LOSS_TYPE"],
            mode_probs=cfg.get("MODE_PROBS"),
            adapter_input_key="edge",
            adapter_conditioning_scale=cfg.get("ADAPTER_CONDITIONING_SCALE", 1.0),
            use_empty_prompt=cfg.get("USE_EMPTY_PROMPT", True),
        ),
        student_module=unet,
        teacher_module=unet,
        scheduler_config=SchedulerConfig(),
        teacher_scheduler=cfg.get("TEACHER_SCHEDULER", "DDPMScheduler"),
        sampling_scheduler=cfg.get("SAMPLING_SCHEDULER", "LCMScheduler"),
        vae=vae,
        conditioner=conditioner,
        adapter=adapter,
        discriminator=disc,
        lora_scaling=lora_scaling(rank),
    )

    frozen = {
        "teacher": teacher_params,
        "vae": vae_params,
        "conditioners": [clip_params],
        "adapter": adapter_params,
    }
    train_cfg = TrainingConfig(
        learning_rates=[float(cfg["LR"]), float(cfg.get("LR_DISCRIMINATOR", cfg["LR"]))],
        checkpoint_every_n_steps=cfg.get("CKPT_EVERY_N_STEPS", 5000),
        checkpoint_dir=os.path.join(args.output_dir, "checkpoints"),
        gradient_accumulation_steps=cfg.get("GRADIENT_ACCUMULATION_STEPS", 1),
    )
    pipeline = TrainingPipeline(
        model, train_cfg, frozen, lora, disc_params,
        # frozen teacher/vae/text-encoder trees stored bf16: the bodies
        # compute in bf16 anyway; fp32 storage only doubles rollout HBM
        # reads and resident footprint (see TrainingPipeline.frozen_dtype)
        frozen_dtype=jnp.bfloat16,
    )

    # Canny edge map computed host-side in the data chain
    data = build_data(cfg, extra_filters_mappers=[CannyEdgeMapper(CannyEdgeMapperConfig(key="image"))])

    def batches():
        for b in data:
            b["text_ids"] = np.zeros((b["image"].shape[0], 77), np.int32)
            yield b

    callbacks = [
        MetricLogger(every_n_steps=train_cfg.log_every_n_steps),
        CheckpointCallback(train_cfg.checkpoint_dir, train_cfg.checkpoint_every_n_steps),
    ]
    state = pipeline.fit(batches(), state=maybe_resume(pipeline, args), callbacks=callbacks, max_steps=args.max_steps)

    from flash_diffusion_tpu.lora import save_peft_safetensors
    from flash_diffusion_tpu.trainer import export_lora
    from flash_diffusion_tpu.utils.hf import unet_lora_name_map

    out = os.path.join(args.output_dir, "pytorch_lora_weights.safetensors")
    save_peft_safetensors(out, jax.device_get(export_lora(state)), unet_lora_name_map(unet_cfg), prefix="unet")
    print("saved", out)


if __name__ == "__main__":
    main()
