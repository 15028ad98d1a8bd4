"""Flash-SD3: distill SD3-medium (MMDiT) with rectified-flow matching.

TPU-native analog of the reference entry script
(reference: examples/train_flash_sd3.py): MMDiT teacher, triple text
encoders (CLIP-L + CLIP-G pooled+hidden, T5-XXL tokens — packed to the SD3
context layout), FlowMatch Euler teacher rollout, Flash flow-match student
sampler, LoRA rank 64, 16-channel post-mid-feature discriminator.
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
    FlashDiffusionSD3,
    FlashDiffusionSD3Config,
)
from flash_diffusion_tpu.lora import init_lora, lora_scaling
from flash_diffusion_tpu.models import AutoencoderKL, MMDiT, sd3_medium_config, sd3_vae_config
from flash_diffusion_tpu.models.embedders import (
    ClipEmbedder,
    ClipEmbedderConfig,
    SD3Conditioner,
    T5AsSD3Embedder,
    T5TextEmbedderConfig,
)
from flash_diffusion_tpu.schedulers import SchedulerConfig
from flash_diffusion_tpu.trainer import CheckpointCallback, MetricLogger, TrainingConfig, TrainingPipeline
from flash_diffusion_tpu.utils.hf import import_clip_text, import_sd3_mmdit, import_t5_encoder, import_vae


def main():
    args = parse_args()
    cfg = load_yaml(args.config)
    setup_logging(args.output_dir)
    root = args.weights_root or cfg.get("WEIGHTS_ROOT", "")

    mmdit_cfg = sd3_medium_config(remat=True)  # rematerialize blocks: the K-step rollout + student backward
    # does not fit HBM at train res without it
    mmdit = MMDiT(mmdit_cfg, dtype=jnp.bfloat16)
    vae_cfg = sd3_vae_config()
    vae = AutoencoderKL(vae_cfg, dtype=jnp.bfloat16)

    clip_l = ClipEmbedder(
        ClipEmbedderConfig(
            input_key="text", layer="hidden", layer_idx=-2,
            always_return_pooled=True, use_projection=True,
            text_embedder_config=dict(projection_dim=768),
        )
    )
    clip_g = ClipEmbedder(
        ClipEmbedderConfig(
            input_key="text",
            text_embedder_config=dict(
                hidden_size=1280, intermediate_size=5120, num_layers=32,
                num_heads=20, hidden_act="gelu", projection_dim=1280,
            ),
            layer="hidden", layer_idx=-2, always_return_pooled=True, use_projection=True,
        )
    )
    # USE_T5: false = the diffusers text_encoder_3=None mode (zeros for the
    # T5 stream) — drops ~9.4 GB of bf16 weights, the difference between
    # fitting and not fitting a single 16 GB chip.
    use_t5 = cfg.get("USE_T5", True)
    t5_len = cfg.get("T5_MAX_LENGTH", 77)
    if use_t5:
        # distinct input key: T5 ids come from the T5 tokenizer's vocabulary,
        # not the CLIP tokenizer's (serving uses the same contract —
        # examples/sample.py::_build_sd3)
        t5 = T5AsSD3Embedder(T5TextEmbedderConfig(input_key="t5_text", max_length=t5_len))
        conditioner = SD3Conditioner([clip_l, clip_g, t5])
    else:
        t5 = None
        conditioner = SD3Conditioner([clip_l, clip_g], t5_dim=4096)
    disc = ConvDiscriminator(DiscriminatorConfig(feature_dim=64, num_stages=4))

    rng = jax.random.PRNGKey(cfg.get("SEED", 0))
    size = cfg.get("IMAGE_SIZE", 1024)
    lat = size // 8
    dummy_cond = {
        "cond": {"crossattn": jnp.zeros((1, 154, 4096)), "vector": jnp.zeros((1, 2048))}
    }
    teacher_params = maybe_import(
        os.path.join(root, "transformer/diffusion_pytorch_model.safetensors"),
        import_sd3_mmdit, mmdit_cfg, args.random_init,
        lambda: init_params_shape_only(
            mmdit, jnp.zeros((1, lat, lat, 16)), jnp.zeros((1,), jnp.float32), dummy_cond
        ),
    )
    vae_params = maybe_import(
        os.path.join(root, "vae/diffusion_pytorch_model.safetensors"),
        import_vae, vae_cfg, args.random_init,
        lambda: init_params_shape_only(vae, jnp.zeros((1, 64, 64, 3))),
    )
    tok_batch = {"text_ids": jnp.zeros((1, 77), jnp.int32)}
    params_l = maybe_import(
        os.path.join(root, "text_encoder/model.safetensors"),
        import_clip_text, clip_l.encoder_config, args.random_init,
        lambda: init_params_shape_only(clip_l, tok_batch),
    )
    params_g = maybe_import(
        os.path.join(root, "text_encoder_2/model.safetensors"),
        import_clip_text, clip_g.encoder_config, args.random_init,
        lambda: init_params_shape_only(clip_g, tok_batch),
    )
    params_t5 = (
        maybe_import(
            os.path.join(root, "text_encoder_3/model.safetensors"),
            import_t5_encoder, t5.encoder_config, args.random_init,
            lambda: init_params_shape_only(
                t5, {"t5_text_ids": jnp.zeros((1, t5_len), jnp.int32)}
            ),
        )
        if use_t5
        else None
    )
    disc_params = disc.init(rng, jnp.zeros((1, lat, lat, 16)))

    rank = cfg.get("LORA_RANK", 64)
    lora = init_lora(teacher_params, rank=rank, rng=rng)

    model = FlashDiffusionSD3(
        FlashDiffusionSD3Config(
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
            use_teacher_as_real=cfg.get("USE_TEACHER_AS_REAL", False),
            use_adversarial_loss=cfg.get("USE_ADVERSARIAL_LOSS", True),
            # the uncond pass must zero ALL text streams (reference encodes
            # negatives through all three towers); t5 reads its own key
            ucg_keys=cfg.get("UCG_KEYS", ["text", "t5_text"] if use_t5 else ["text"]),
        ),
        student_module=mmdit,
        teacher_module=mmdit,
        scheduler_config=SchedulerConfig(shift=3.0),
        vae=vae,
        conditioner=conditioner,
        discriminator=disc,
        lora_scaling=lora_scaling(rank),
    )

    frozen = {
        "teacher": teacher_params,
        "vae": vae_params,
        "conditioners": [params_l, params_g] + ([params_t5] if use_t5 else []),
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
        # TEXT_ENCODER_OFFLOAD: N>0 keeps the 11G triple-encoder stack on
        # host and bursts it onto HBM every N batches (TPU-native
        # cpu_offload, reference flash_sd3/flash_diffusion_model.py:219-220)
        # — the setting that fits USE_T5:true on one 16G chip.
        text_encoder_offload=cfg.get("TEXT_ENCODER_OFFLOAD", 0),
    )

    data = build_data(cfg)

    def batches():
        from sample import _clip_tokenizer, _t5_tokenizer

        clip_tok = _clip_tokenizer(root)
        t5_tok = _t5_tokenizer(root, t5_len, subdir="tokenizer_3") if use_t5 else None

        def tokenize(texts):
            out = dict(clip_tok(texts))
            if t5_tok is not None:
                t5_out = t5_tok(texts)
                out["t5_text_ids"] = t5_out["text_ids"]
                out["t5_text_mask"] = t5_out["text_mask"]
            return out

        for b in data:
            b.update(tokenize(b["text"]))
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
