"""Flash-Pixart: distill Pixart-α (DiT) into a 4-NFE LoRA student.

TPU-native analog of the reference entry script
(reference: examples/train_flash_pixart.py): Pixart DiT teacher with
adaLN-single (+ resolution/aspect-ratio vector embeddings), T5 conditioner
(max_length 120, mask surfaced to cross-attention), K=16 teacher steps,
LoRA rank 64, 4-channel latent discriminator.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from common import build_data, init_params_shape_only, load_yaml, maybe_import, parse_args, setup_logging, maybe_resume

from flash_diffusion_tpu.distill import (
    ConvDiscriminator,
    DiscriminatorConfig,
    FlashDiffusion,
    FlashDiffusionConfig,
)
from flash_diffusion_tpu.lora import init_lora, lora_scaling
from flash_diffusion_tpu.models import AutoencoderKL, DiT, pixart_config, sd_vae_config
from flash_diffusion_tpu.models.embedders import (
    ConditionerWrapper,
    RawVectorEmbedder,
    RawVectorEmbedderConfig,
    T5TextEmbedder,
    T5TextEmbedderConfig,
)
from flash_diffusion_tpu.schedulers import SchedulerConfig
from flash_diffusion_tpu.trainer import CheckpointCallback, MetricLogger, TrainingConfig, TrainingPipeline
from flash_diffusion_tpu.utils.hf import import_pixart_dit, import_t5_encoder, import_vae


def main():
    args = parse_args()
    cfg = load_yaml(args.config)
    setup_logging(args.output_dir)
    root = args.weights_root or cfg.get("WEIGHTS_ROOT", "")

    dit_cfg = pixart_config(num_vector_embeds=3, remat=True)  # height, width, aspect ratio
    dit = DiT(dit_cfg, dtype=jnp.bfloat16)
    vae_cfg = sd_vae_config()
    vae = AutoencoderKL(vae_cfg, dtype=jnp.bfloat16)
    t5 = T5TextEmbedder(
        T5TextEmbedderConfig(input_key="text", max_length=cfg.get("T5_MAX_LENGTH", 120))
    )
    # (height, width, aspect_ratio) scalars pass through; the DiT embeds
    # them in its concat-style AdaLayerNormSingle (num_vector_embeds=3,
    # reference examples/train_flash_pixart.py:85-86 num_vector_conditionings=3)
    res_ar = RawVectorEmbedder(RawVectorEmbedderConfig(input_key="resolution_ar"))
    conditioner = ConditionerWrapper([t5, res_ar])
    disc = ConvDiscriminator(DiscriminatorConfig(feature_dim=64, num_stages=3))

    rng = jax.random.PRNGKey(cfg.get("SEED", 0))
    size = cfg.get("IMAGE_SIZE", 512)
    lat = size // 8
    dummy_cond = {
        "cond": {
            "crossattn": jnp.zeros((1, 120, 4096)),
            "attention_mask": jnp.ones((1, 120), jnp.int32),
            "vector": jnp.zeros((1, 3)),
        }
    }
    teacher_params = maybe_import(
        os.path.join(root, "transformer/diffusion_pytorch_model.safetensors"),
        import_pixart_dit, dit_cfg, args.random_init,
        lambda: init_params_shape_only(
            dit, jnp.zeros((1, lat, lat, 4)), jnp.zeros((1,), jnp.int32), dummy_cond
        ),
    )
    vae_params = maybe_import(
        os.path.join(root, "vae/diffusion_pytorch_model.safetensors"),
        import_vae, vae_cfg, args.random_init,
        lambda: init_params_shape_only(vae, jnp.zeros((1, 64, 64, 3))),
    )
    t5_params = maybe_import(
        os.path.join(root, "text_encoder/model.safetensors"),
        import_t5_encoder, t5.encoder_config, args.random_init,
        lambda: init_params_shape_only(t5, {"text_ids": jnp.zeros((1, 120), jnp.int32)}),
    )
    disc_params = disc.init(rng, jnp.zeros((1, lat, lat, 4)))

    rank = cfg.get("LORA_RANK", 64)
    lora = init_lora(teacher_params, rank=rank, rng=rng)

    model = FlashDiffusion(
        FlashDiffusionConfig(
            K=cfg["K"],
            num_iterations_per_K=cfg["NUM_ITERATIONS_PER_K"],
            guidance_scale_min=float(cfg["GUIDANCE_MIN"]),
            guidance_scale_max=float(cfg["GUIDANCE_MAX"]),
            distill_loss_type=cfg.get("DISTILL_LOSS_TYPE", "l2"),
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
            use_empty_prompt=cfg.get("USE_EMPTY_PROMPT", True),
        ),
        student_module=dit,
        teacher_module=dit,
        scheduler_config=SchedulerConfig(beta_schedule="linear", beta_start=0.0001, beta_end=0.02),
        teacher_scheduler=cfg.get("TEACHER_SCHEDULER", "DDPMScheduler"),
        sampling_scheduler=cfg.get("SAMPLING_SCHEDULER", "LCMScheduler"),
        teacher_sampling_scheduler=cfg.get("TEACHER_SAMPLING_SCHEDULER", "DPMSolverMultistepScheduler"),
        vae=vae,
        conditioner=conditioner,
        discriminator=disc,
        lora_scaling=lora_scaling(rank),
    )

    # [t5, res_ar]: the RawVectorEmbedder is param-less → {} (a short list
    # would drop it entirely — ConditionerWrapper raises on length mismatch)
    frozen = {"teacher": teacher_params, "vae": vae_params, "conditioners": [t5_params, {}]}
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

    data = build_data(cfg)

    def batches():
        try:
            tok_dir = os.path.join(root, "tokenizer")
            if not os.path.isdir(tok_dir):
                raise FileNotFoundError(tok_dir)  # avoid HF-hub network retries
            from transformers import T5TokenizerFast

            tok = T5TokenizerFast.from_pretrained(tok_dir)

            def tokenize(texts):
                out = tok(texts, padding="max_length", max_length=120, truncation=True, return_tensors="np")
                return {"text_ids": out["input_ids"], "text_mask": out["attention_mask"]}
        except Exception:
            def tokenize(texts):
                return {
                    "text_ids": np.zeros((len(texts), 120), np.int32),
                    "text_mask": np.ones((len(texts), 120), np.int32),
                }
        for b in data:
            n = b["image"].shape[0]
            b.update(tokenize(b["text"]))
            # Pixart micro-conditioning: resolution + aspect ratio
            b["resolution_ar"] = np.tile([float(size), float(size), 1.0], (n, 1)).astype(np.float32)
            yield b

    callbacks = [
        MetricLogger(every_n_steps=train_cfg.log_every_n_steps),
        CheckpointCallback(train_cfg.checkpoint_dir, train_cfg.checkpoint_every_n_steps),
    ]
    state = pipeline.fit(batches(), state=maybe_resume(pipeline, args), callbacks=callbacks, max_steps=args.max_steps)

    from flash_diffusion_tpu.lora import save_peft_safetensors
    from flash_diffusion_tpu.trainer import export_lora

    out = os.path.join(args.output_dir, "pytorch_lora_weights.safetensors")
    save_peft_safetensors(out, jax.device_get(export_lora(state)), prefix="transformer")
    print("saved", out)


if __name__ == "__main__":
    main()
