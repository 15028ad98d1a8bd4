"""Few-step text-to-image sampling CLI (the reference's README inference
recipe as a first-class command; reference: README.md:316-353).

    python examples/sample.py --model sd15 --weights-root /weights/sd15 \
        --lora /path/pytorch_lora_weights.safetensors \
        --prompt "A raccoon reading a book" --steps 4 --out out.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from common import init_params_shape_only, maybe_import

from flash_diffusion_tpu import FlashPipeline
from flash_diffusion_tpu.lora import load_peft_safetensors
from flash_diffusion_tpu.models import (
    AutoencoderKL,
    UNet2DCondition,
    sd15_unet_config,
    sd_vae_config,
    sdxl_unet_config,
)
from flash_diffusion_tpu.models.embedders import (
    ClipEmbedder,
    ClipEmbedderConfig,
    ConditionerWrapper,
)
from flash_diffusion_tpu.schedulers import SchedulerConfig
from flash_diffusion_tpu.trainer.loggers import make_grid, save_png
from flash_diffusion_tpu.utils.hf import (
    import_clip_text,
    import_unet,
    import_vae,
    unet_lora_name_map,
)


def _clip_tokenizer(root, max_length=77, key="text_ids"):
    try:
        tok_dir = os.path.join(root, "tokenizer")
        if not os.path.isdir(tok_dir):
            raise FileNotFoundError(tok_dir)  # avoid HF-hub network retries
        from transformers import CLIPTokenizerFast

        tok = CLIPTokenizerFast.from_pretrained(tok_dir)

        def tokenizer_fn(texts):
            out = tok(texts, padding="max_length", max_length=max_length, truncation=True, return_tensors="np")
            return {key: out["input_ids"]}
    except Exception:
        print("WARNING: no local tokenizer — using zero token ids", file=sys.stderr)

        def tokenizer_fn(texts):
            return {key: np.zeros((len(texts), max_length), np.int32)}

    return tokenizer_fn


def _t5_tokenizer(root, max_length=120, subdir="tokenizer"):
    try:
        tok_dir = os.path.join(root, subdir)
        if not os.path.isdir(tok_dir):
            raise FileNotFoundError(tok_dir)
        from transformers import T5TokenizerFast

        tok = T5TokenizerFast.from_pretrained(tok_dir)

        def tokenizer_fn(texts):
            out = tok(texts, padding="max_length", max_length=max_length, truncation=True, return_tensors="np")
            return {"text_ids": out["input_ids"], "text_mask": out["attention_mask"]}
    except Exception:
        print("WARNING: no local T5 tokenizer — using zero token ids", file=sys.stderr)

        def tokenizer_fn(texts):
            return {
                "text_ids": np.zeros((len(texts), max_length), np.int32),
                "text_mask": np.ones((len(texts), max_length), np.int32),
            }

    return tokenizer_fn


def _build_sd_unet(model, root, random_init, rng):
    """sd15 / sdxl: UNet + sd VAE + the family's conditioner stack."""
    from flash_diffusion_tpu.models.embedders import (
        TimestepsEmbedder,
        TimestepsEmbedderConfig,
    )

    if model == "sd15":
        unet_cfg, lat_hw, ctx = sd15_unet_config(), 64, 768
        clip = ClipEmbedder(ClipEmbedderConfig(input_key="text", layer="last"))
        conditioner = ConditionerWrapper([clip])
        towers = [("text_encoder/model.safetensors", clip)]
        dummy_cond = {"cond": {"crossattn": jnp.zeros((1, 77, ctx))}}
        size_cond_fn = None
    else:  # sdxl: dual CLIP + size/crop/target embeds (train_flash_sdxl stack)
        unet_cfg, lat_hw, ctx = sdxl_unet_config(), 128, 2048
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
                layer="hidden", layer_idx=-2,
                always_return_pooled=True, use_projection=True,
            )
        )
        size_embedders = [
            TimestepsEmbedder(TimestepsEmbedderConfig(input_key=key, num_channels=256))
            for key in ("original_size_as_tuple", "crop_coords_top_left", "target_size_as_tuple")
        ]
        conditioner = ConditionerWrapper([clip_l, clip_g, *size_embedders])
        towers = [
            ("text_encoder/model.safetensors", clip_l),
            ("text_encoder_2/model.safetensors", clip_g),
        ]
        dummy_cond = {
            "cond": {
                "crossattn": jnp.zeros((1, 77, ctx)),
                "vector": jnp.zeros((1, 2816)),
            }
        }

        def size_cond_fn(n, h, w):
            return {
                "original_size_as_tuple": np.tile([h, w], (n, 1)).astype(np.float32),
                "crop_coords_top_left": np.zeros((n, 2), np.float32),
                "target_size_as_tuple": np.tile([h, w], (n, 1)).astype(np.float32),
            }

    unet = UNet2DCondition(unet_cfg, dtype=jnp.bfloat16)
    vae_cfg = sd_vae_config(scaling_factor=0.13025 if model == "sdxl" else 0.18215)
    vae = AutoencoderKL(vae_cfg, dtype=jnp.bfloat16)
    denoiser_params = maybe_import(
        os.path.join(root, "unet/diffusion_pytorch_model.safetensors"),
        import_unet, unet_cfg, random_init,
        lambda: init_params_shape_only(
            unet, jnp.zeros((1, lat_hw, lat_hw, 4)), jnp.zeros((1,), jnp.int32), dummy_cond
        ),
    )
    vae_params = maybe_import(
        os.path.join(root, "vae/diffusion_pytorch_model.safetensors"),
        import_vae, vae_cfg, random_init,
        lambda: init_params_shape_only(vae, jnp.zeros((1, 64, 64, 3))),
    )
    cparams = [
        maybe_import(
            os.path.join(root, path), import_clip_text, tower.encoder_config,
            random_init,
            lambda tower=tower: tower.init(rng, {"text_ids": jnp.zeros((1, 77), jnp.int32)}),
        )
        for path, tower in towers
    ]
    cparams += [{}] * (len(conditioner.conditioners) - len(cparams))
    return dict(
        denoiser=unet, denoiser_params=denoiser_params,
        conditioner=conditioner, conditioner_params=cparams,
        vae=vae, vae_params=vae_params,
        tokenizer_fn=_clip_tokenizer(root),
        latent_shape=(lat_hw, lat_hw, 4),
        scheduler="LCMScheduler", scheduler_config=SchedulerConfig(),
        size_cond_fn=size_cond_fn,
        lora_name_map=unet_lora_name_map(unet_cfg), lora_prefix="unet",
    )


def _build_pixart(root, random_init, rng):
    """Pixart-α 1024²: DiT + T5 conditioner + resolution/aspect vector."""
    from flash_diffusion_tpu.models import DiT, pixart_config
    from flash_diffusion_tpu.models.embedders import (
        RawVectorEmbedder,
        RawVectorEmbedderConfig,
        T5TextEmbedder,
        T5TextEmbedderConfig,
    )
    from flash_diffusion_tpu.utils.hf import import_pixart_dit, import_t5_encoder

    dit_cfg = pixart_config(num_vector_embeds=3)
    dit = DiT(dit_cfg, dtype=jnp.bfloat16)
    vae_cfg = sd_vae_config()
    vae = AutoencoderKL(vae_cfg, dtype=jnp.bfloat16)
    t5 = T5TextEmbedder(T5TextEmbedderConfig(input_key="text", max_length=120))
    res_ar = RawVectorEmbedder(RawVectorEmbedderConfig(input_key="resolution_ar"))
    conditioner = ConditionerWrapper([t5, res_ar])
    lat = 128
    dummy_cond = {
        "cond": {
            "crossattn": jnp.zeros((1, 120, 4096)),
            "attention_mask": jnp.ones((1, 120), jnp.int32),
            "vector": jnp.zeros((1, 3)),
        }
    }
    dit_params = maybe_import(
        os.path.join(root, "transformer/diffusion_pytorch_model.safetensors"),
        import_pixart_dit, dit_cfg, random_init,
        lambda: init_params_shape_only(
            dit, jnp.zeros((1, lat, lat, 4)), jnp.zeros((1,), jnp.int32), dummy_cond
        ),
    )
    vae_params = maybe_import(
        os.path.join(root, "vae/diffusion_pytorch_model.safetensors"),
        import_vae, vae_cfg, random_init,
        lambda: init_params_shape_only(vae, jnp.zeros((1, 64, 64, 3))),
    )
    t5_params = maybe_import(
        os.path.join(root, "text_encoder/model.safetensors"),
        import_t5_encoder, t5.encoder_config, random_init,
        lambda: init_params_shape_only(t5, {"text_ids": jnp.zeros((1, 120), jnp.int32)}),
    )
    return dict(
        denoiser=dit, denoiser_params=dit_params,
        # res_ar (RawVectorEmbedder) is param-less → {}
        conditioner=conditioner, conditioner_params=[t5_params, {}],
        vae=vae, vae_params=vae_params,
        tokenizer_fn=_t5_tokenizer(root, 120),
        latent_shape=(lat, lat, 4),
        # Pixart trains on linear betas (reference train_flash_pixart.py)
        scheduler="LCMScheduler",
        scheduler_config=SchedulerConfig(
            beta_schedule="linear", beta_start=0.0001, beta_end=0.02
        ),
        size_cond_fn=lambda n, h, w: {
            "resolution_ar": np.tile([float(h), float(w), w / h], (n, 1)).astype(np.float32)
        },
        lora_name_map=None, lora_prefix="transformer",
    )


def _build_sd3(root, random_init, rng, use_t5=False, t5_max_length=256):
    """SD3-medium: MMDiT + SD3 conditioner + flow-match flash sampler.

    Default serving mode is dual-CLIP (diffusers' ``text_encoder_3=None``
    zero-T5-stream semantics; T5-XXL stays off the serving footprint).
    ``use_t5=True`` is the REFERENCE-FIDELITY configuration: the full
    triple-encoder stack (reference conditions SD3 on all three towers via
    ``StableDiffusion3Pipeline.encode_prompt``, reference
    src/flash/models/flash_sd3/flash_diffusion_model.py:195-233) with the
    T5-XXL token stream real. T5-XXL adds ~9.4 GB bf16 — single-chip 16 GB
    serving then needs ``--decode-chunk``/small batches, or ``--tp 2``
    (shard_tp now TP-shards the text towers too, halving the per-chip
    footprint). diffusers' default ``max_sequence_length`` is 256."""
    from flash_diffusion_tpu.models import MMDiT, sd3_medium_config, sd3_vae_config
    from flash_diffusion_tpu.models.embedders import (
        SD3Conditioner,
        T5AsSD3Embedder,
        T5TextEmbedderConfig,
    )
    from flash_diffusion_tpu.utils.hf import import_sd3_mmdit, import_t5_encoder

    mmdit_cfg = sd3_medium_config()
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
    t5 = None
    if use_t5:
        t5 = T5AsSD3Embedder(
            T5TextEmbedderConfig(input_key="t5_text", max_length=t5_max_length)
        )
        conditioner = SD3Conditioner([clip_l, clip_g, t5], t5_dim=4096)
        ctx_len = 77 + t5_max_length
    else:
        conditioner = SD3Conditioner([clip_l, clip_g], t5_dim=4096)
        ctx_len = 154
    lat = 128
    dummy_cond = {
        "cond": {
            "crossattn": jnp.zeros((1, ctx_len, 4096)),
            "vector": jnp.zeros((1, 2048)),
        }
    }
    mmdit_params = maybe_import(
        os.path.join(root, "transformer/diffusion_pytorch_model.safetensors"),
        import_sd3_mmdit, mmdit_cfg, random_init,
        lambda: init_params_shape_only(
            mmdit, jnp.zeros((1, lat, lat, 16)), jnp.zeros((1,), jnp.float32), dummy_cond
        ),
    )
    vae_params = maybe_import(
        os.path.join(root, "vae/diffusion_pytorch_model.safetensors"),
        import_vae, vae_cfg, random_init,
        lambda: init_params_shape_only(vae, jnp.zeros((1, 64, 64, 3))),
    )
    cparams = [
        maybe_import(
            os.path.join(root, path), import_clip_text, tower.encoder_config,
            random_init,
            lambda tower=tower: tower.init(rng, {"text_ids": jnp.zeros((1, 77), jnp.int32)}),
        )
        for path, tower in [
            ("text_encoder/model.safetensors", clip_l),
            ("text_encoder_2/model.safetensors", clip_g),
        ]
    ]
    tokenizer_fn = _clip_tokenizer(root)
    if use_t5:
        cparams.append(
            maybe_import(
                os.path.join(root, "text_encoder_3/model.safetensors"),
                import_t5_encoder, t5.encoder_config, random_init,
                lambda: init_params_shape_only(
                    t5, {"t5_text_ids": jnp.zeros((1, t5_max_length), jnp.int32)}
                ),
            )
        )
        clip_tok = tokenizer_fn
        t5_tok = _t5_tokenizer(root, t5_max_length, subdir="tokenizer_3")

        def tokenizer_fn(texts):
            out = dict(clip_tok(texts))
            t5_out = t5_tok(texts)
            out["t5_text_ids"] = t5_out["text_ids"]
            out["t5_text_mask"] = t5_out["text_mask"]
            return out

    return dict(
        denoiser=mmdit, denoiser_params=mmdit_params,
        conditioner=conditioner, conditioner_params=cparams,
        vae=vae, vae_params=vae_params,
        tokenizer_fn=tokenizer_fn,
        latent_shape=(lat, lat, 16),
        scheduler="FlashFlowMatchEulerDiscreteScheduler",
        scheduler_config=SchedulerConfig(shift=3.0),
        size_cond_fn=None,
        lora_name_map=None, lora_prefix="transformer",
    )


def build_pipeline(
    model: str,
    weights_root: str = "",
    random_init: bool = False,
    lora: str | None = None,
    lora_scale: float = 1.0,
    seed: int = 0,
    sd3_t5: bool = False,
    sd3_t5_max_length: int = 256,
):
    """Build a FlashPipeline for any showcased family (sd15 / sdxl /
    pixart / sd3) — shared by sample.py / serve.py. ``sd3_t5=True``
    serves SD3 with the full triple-encoder stack (reference fidelity)."""
    root = weights_root
    rng = jax.random.PRNGKey(seed)
    if model in ("sd15", "sdxl"):
        parts = _build_sd_unet(model, root, random_init, rng)
    elif model == "pixart":
        parts = _build_pixart(root, random_init, rng)
    elif model == "sd3":
        parts = _build_sd3(
            root, random_init, rng, use_t5=sd3_t5, t5_max_length=sd3_t5_max_length
        )
    else:
        raise ValueError(f"unknown model {model!r}")

    pipe = FlashPipeline(
        parts["denoiser"], parts["denoiser_params"],
        conditioner=parts["conditioner"], conditioner_params=parts["conditioner_params"],
        vae=parts["vae"], vae_params=parts["vae_params"],
        tokenizer_fn=parts["tokenizer_fn"],
        scheduler=parts["scheduler"], scheduler_config=parts["scheduler_config"],
        latent_shape=parts["latent_shape"],
    )
    pipe.size_cond_fn = parts["size_cond_fn"]
    # path → (tree, scaling) with this model's name map: serve.py's /loras
    # hot-swap endpoint loads through this
    pipe.lora_loader = lambda path: load_peft_safetensors(
        path, parts["denoiser_params"], parts["lora_name_map"], prefix=parts["lora_prefix"]
    )
    if lora:
        tree, scaling = pipe.lora_loader(lora)
        pipe.load_lora(tree, scaling * lora_scale)
        print(f"loaded LoRA {lora} (scaling {scaling * lora_scale})")
    return pipe


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="sd15", choices=["sd15", "sdxl", "pixart", "sd3"])
    ap.add_argument("--weights-root", default="")
    ap.add_argument("--lora", default=None, help="PEFT safetensors adapter")
    ap.add_argument("--lora-scale", type=float, default=1.0)
    ap.add_argument("--prompt", action="append", required=True)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--guidance-scale", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="sample.png")
    ap.add_argument("--random-init", action="store_true")
    ap.add_argument(
        "--decode-chunk", type=int, default=0,
        help="serial VAE-decode chunk size (0 = whole batch); bounds decode "
        "memory on 16 GB chips at large batch x 1024px",
    )
    ap.add_argument(
        "--t5", action="store_true",
        help="(sd3) serve the full triple-encoder stack with a REAL T5-XXL "
        "stream (reference conditioning fidelity) instead of the "
        "text_encoder_3=None zero block. +9.4 GB bf16; see --t5-max-length",
    )
    ap.add_argument(
        "--t5-max-length", type=int, default=256,
        help="(sd3 --t5) T5 token length (diffusers default 256)",
    )
    args = ap.parse_args()

    pipe = build_pipeline(
        args.model, args.weights_root, args.random_init,
        lora=args.lora, lora_scale=args.lora_scale, seed=args.seed,
        sd3_t5=args.t5, sd3_t5_max_length=args.t5_max_length,
    )
    if args.decode_chunk:
        pipe.decode_chunk = args.decode_chunk
    images = pipe.generate(
        args.prompt,
        num_inference_steps=args.steps,
        guidance_scale=args.guidance_scale,
        seed=args.seed,
    )
    save_png(args.out, make_grid(np.asarray(images)))
    print("saved", args.out)


if __name__ == "__main__":
    main()
