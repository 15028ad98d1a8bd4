"""Flash-SDXL: distill SDXL into a 4-NFE LoRA student at 1024².

TPU-native analog of the reference entry script
(reference: examples/train_flash_sdxl.py): SDXL UNet teacher, dual CLIP
conditioners (CLIP-L last-hidden + CLIP-G penultimate w/ projected pooled
vector) + 3 TimestepsEmbedders for size/crop conditioning, DPM-Solver++
teacher rollout, LCM student sampler, LoRA rank 64, lpips + DMD + LSGAN.

Run: python examples/train_flash_sdxl.py --config examples/configs/flash_sdxl.yaml
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from common import build_data, init_params_shape_only, load_yaml, maybe_import, parse_args, setup_logging, maybe_resume

from flash_diffusion_tpu.distill import (
    LPIPS,
    ConvDiscriminator,
    DiscriminatorConfig,
    FlashDiffusion,
    FlashDiffusionConfig,
)
from flash_diffusion_tpu.lora import init_lora, lora_scaling
from flash_diffusion_tpu.models import AutoencoderKL, UNet2DCondition, sd_vae_config, sdxl_unet_config
from flash_diffusion_tpu.models.embedders import (
    ClipEmbedder,
    ClipEmbedderConfig,
    ConditionerWrapper,
    TimestepsEmbedder,
    TimestepsEmbedderConfig,
)
from flash_diffusion_tpu.schedulers import SchedulerConfig
from flash_diffusion_tpu.trainer import CheckpointCallback, MetricLogger, TrainingConfig, TrainingPipeline
from flash_diffusion_tpu.utils.hf import import_clip_text, import_unet, import_vae


def main():
    args = parse_args()
    cfg = load_yaml(args.config)
    setup_logging(args.output_dir)
    root = args.weights_root or cfg.get("WEIGHTS_ROOT", "")

    unet_cfg = sdxl_unet_config(remat=True)  # rematerialize blocks: the K-step rollout + student backward
    # does not fit HBM at train res without it
    unet = UNet2DCondition(unet_cfg, dtype=jnp.bfloat16)
    vae_cfg = sd_vae_config(scaling_factor=0.13025)
    vae = AutoencoderKL(vae_cfg, dtype=jnp.bfloat16)

    # SDXL conditioning stack (reference train_flash_sdxl.py:137-195):
    # CLIP-L last hidden (crossattn 768) ⊕ CLIP-G penultimate (crossattn 1280,
    # pooled-projection vector 1280) ⊕ sinusoidal size/crop/target embeds
    # (vector 3×512) → crossattn 2048 + vector 2816.
    clip_l = ClipEmbedder(
        ClipEmbedderConfig(input_key="text", layer="hidden", layer_idx=-2)
    )
    clip_g = ClipEmbedder(
        ClipEmbedderConfig(
            input_key="text",
            text_embedder_config=dict(
                hidden_size=1280, intermediate_size=5120, num_layers=32,
                num_heads=20, hidden_act="gelu", projection_dim=1280,
            ),
            layer="hidden",
            layer_idx=-2,
            always_return_pooled=True,
            use_projection=True,
        )
    )
    size_embedders = [
        TimestepsEmbedder(TimestepsEmbedderConfig(input_key=key, num_channels=256))
        for key in ("original_size_as_tuple", "crop_coords_top_left", "target_size_as_tuple")
    ]
    conditioner = ConditionerWrapper([clip_l, clip_g, *size_embedders])

    size = cfg.get("IMAGE_SIZE", 1024)
    # SDXL UNet: 3 levels, mid features at latent/4 (= size/32); each disc
    # stage halves, the head is a 4x4 VALID conv -> stages sized to leave >=4
    mid_hw = size // 32
    import math

    num_stages = max(0, int(math.log2(max(mid_hw // 4, 1))))
    disc = ConvDiscriminator(DiscriminatorConfig(feature_dim=256, num_stages=num_stages))

    rng = jax.random.PRNGKey(cfg.get("SEED", 0))
    teacher_params = maybe_import(
        os.path.join(root, "unet/diffusion_pytorch_model.safetensors"),
        import_unet, unet_cfg, args.random_init,
        lambda: init_params_shape_only(
            unet, jnp.zeros((1, 128, 128, 4)), jnp.zeros((1,), jnp.int32),
            {"cond": {"crossattn": jnp.zeros((1, 77, 2048)), "vector": jnp.zeros((1, 2816))}},
        ),
    )
    vae_params = maybe_import(
        os.path.join(root, "vae/diffusion_pytorch_model.safetensors"),
        import_vae, vae_cfg, args.random_init,
        lambda: init_params_shape_only(vae, jnp.zeros((1, 64, 64, 3))),
    )
    tok_batch = {"text_ids": jnp.zeros((1, 77), jnp.int32)}
    clip_l_params = maybe_import(
        os.path.join(root, "text_encoder/model.safetensors"),
        import_clip_text, clip_l.encoder_config, args.random_init,
        lambda: init_params_shape_only(clip_l, tok_batch),
    )
    clip_g_params = maybe_import(
        os.path.join(root, "text_encoder_2/model.safetensors"),
        import_clip_text, clip_g.encoder_config, args.random_init,
        lambda: init_params_shape_only(clip_g, tok_batch),
    )
    disc_params = disc.init(rng, jnp.zeros((1, mid_hw, mid_hw, 1280)))

    rank = cfg.get("LORA_RANK", 64)
    lora = init_lora(teacher_params, rank=rank, rng=rng)
    lpips = LPIPS()
    lpips_params = init_params_shape_only(lpips, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))

    model = FlashDiffusion(
        FlashDiffusionConfig(
            K=cfg["K"],
            num_iterations_per_K=cfg["NUM_ITERATIONS_PER_K"],
            guidance_scale_min=float(cfg["GUIDANCE_MIN"]),
            guidance_scale_max=float(cfg["GUIDANCE_MAX"]),
            distill_loss_type=cfg["DISTILL_LOSS_TYPE"],
            ucg_keys=cfg.get("UCG_KEYS", ["text"]),
            timestep_distribution=cfg["TIMESTEP_DISTRIBUTION"],
            mixture_num_components=cfg["MIXTURE_NUM_COMPONENTS"],
            mixture_var=cfg["MIXTURE_VAR"],
            use_dmd_loss=cfg["USE_DMD_LOSS"],
            dmd_loss_scale=cfg["DMD_LOSS_SCALE"],
            distill_loss_scale=cfg["DISTILL_LOSS_SCALE"],
            adversarial_loss_scale=cfg["ADVERSARIAL_LOSS_SCALE"],
            gan_loss_type=cfg["GAN_LOSS_TYPE"],
            mode_probs=cfg.get("MODE_PROBS"),
            use_teacher_as_real=cfg.get("USE_TEACHER_AS_REAL", False),
            use_empty_prompt=cfg.get("USE_EMPTY_PROMPT", False),
        ),
        student_module=unet,
        teacher_module=unet,
        scheduler_config=SchedulerConfig(),
        teacher_scheduler=cfg.get("TEACHER_SCHEDULER", "DPMSolverMultistepScheduler"),
        sampling_scheduler=cfg.get("SAMPLING_SCHEDULER", "LCMScheduler"),
        teacher_sampling_scheduler=cfg.get("TEACHER_SAMPLING_SCHEDULER", "EulerDiscreteScheduler"),
        vae=vae,
        conditioner=conditioner,
        discriminator=disc,
        lpips=lpips,
        lora_scaling=lora_scaling(rank),
    )

    frozen = {
        "teacher": teacher_params,
        "vae": vae_params,
        "conditioners": [clip_l_params, clip_g_params, {}, {}, {}],
        "lpips": lpips_params,
    }
    train_cfg = TrainingConfig(
        learning_rates=[float(cfg["LR"]), float(cfg.get("LR_DISCRIMINATOR", cfg["LR"]))],
        checkpoint_every_n_steps=cfg.get("CKPT_EVERY_N_STEPS", 5000),
        checkpoint_dir=os.path.join(args.output_dir, "checkpoints"),
        ema_decay=cfg.get("EMA_DECAY"),
        gradient_accumulation_steps=cfg.get("GRADIENT_ACCUMULATION_STEPS", 1),
        val_every_n_steps=cfg.get("VAL_EVERY_N_STEPS"),
    )
    pipeline = TrainingPipeline(
        model, train_cfg, frozen, lora, disc_params,
        # frozen teacher/vae/text-encoder trees stored bf16: the bodies
        # compute in bf16 anyway; fp32 storage only doubles rollout HBM
        # reads and resident footprint (see TrainingPipeline.frozen_dtype)
        frozen_dtype=jnp.bfloat16,
    )

    data = build_data(cfg)

    def batches(source=None):
        try:
            tok_dir = os.path.join(root, "tokenizer")
            if not os.path.isdir(tok_dir):
                raise FileNotFoundError(tok_dir)  # avoid HF-hub network retries
            from transformers import CLIPTokenizerFast

            tok = CLIPTokenizerFast.from_pretrained(tok_dir)

            def tokenize(texts):
                out = tok(texts, padding="max_length", max_length=77, truncation=True, return_tensors="np")
                return {"text_ids": out["input_ids"]}
        except Exception:
            def tokenize(texts):
                return {"text_ids": np.zeros((len(texts), 77), np.int32)}
        for b in (data if source is None else source):
            n = b["image"].shape[0]
            b.update(tokenize(b["text"]))
            # SDXL micro-conditioning (original/crop/target size tuples) —
            # ASPECT_BUCKETING mappers emit the REAL per-sample tuples;
            # only fabricate the constant square ones when absent
            if "original_size_as_tuple" not in b:
                b["original_size_as_tuple"] = np.tile([size, size], (n, 1)).astype(np.float32)
                b["crop_coords_top_left"] = np.zeros((n, 2), np.float32)
                b["target_size_as_tuple"] = np.tile([size, size], (n, 1)).astype(np.float32)
            yield b

    eval_data = None
    if cfg.get("EVAL_SHARDS_PATH_OR_URLS"):
        eval_pipe = build_data(
            {**cfg, "SHARDS_PATH_OR_URLS": cfg["EVAL_SHARDS_PATH_OR_URLS"]}
        )

        def eval_data():  # fresh iterator per validation pass
            return batches(eval_pipe.batches(epoch=0))

    callbacks = [
        MetricLogger(every_n_steps=train_cfg.log_every_n_steps),
        CheckpointCallback(train_cfg.checkpoint_dir, train_cfg.checkpoint_every_n_steps),
    ]
    state = pipeline.fit(batches(), state=maybe_resume(pipeline, args), callbacks=callbacks, max_steps=args.max_steps, eval_data=eval_data)

    from flash_diffusion_tpu.lora import save_kohya_safetensors, save_peft_safetensors
    from flash_diffusion_tpu.trainer import export_lora
    from flash_diffusion_tpu.utils.hf import unet_lora_name_map

    lora_tree = jax.device_get(export_lora(state))
    name_map = unet_lora_name_map(unet_cfg)
    out = os.path.join(args.output_dir, "pytorch_lora_weights.safetensors")
    save_peft_safetensors(out, lora_tree, name_map, prefix="unet")
    print("saved", out)
    # ComfyUI-loadable kohya-format copy (reference ships the SDXL adapter
    # this way too: /root/reference/README.md:355-364 + examples/comfy/)
    comfy = os.path.join(args.output_dir, "comfy", "FlashSDXL.safetensors")
    os.makedirs(os.path.dirname(comfy), exist_ok=True)
    save_kohya_safetensors(comfy, lora_tree, name_map)
    print("saved", comfy)


if __name__ == "__main__":
    main()
