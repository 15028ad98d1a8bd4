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
from flash_diffusion_tpu.trainer.loggers import make_grid, save_png
from flash_diffusion_tpu.utils.hf import (
    import_clip_text,
    import_unet,
    import_vae,
    unet_lora_name_map,
)


def build_pipeline(
    model: str,
    weights_root: str = "",
    random_init: bool = False,
    lora: str | None = None,
    lora_scale: float = 1.0,
    seed: int = 0,
):
    """Build a FlashPipeline for sd15/sdxl (shared by sample.py / serve.py)."""
    root = weights_root

    if model == "sd15":
        unet_cfg, lat_hw, ctx = sd15_unet_config(), 64, 768
    else:
        unet_cfg, lat_hw, ctx = sdxl_unet_config(), 128, 2048
    unet = UNet2DCondition(unet_cfg, dtype=jnp.bfloat16)
    vae_cfg = sd_vae_config(scaling_factor=0.13025 if model == "sdxl" else 0.18215)
    vae = AutoencoderKL(vae_cfg, dtype=jnp.bfloat16)
    clip = ClipEmbedder(ClipEmbedderConfig(input_key="text", layer="last"))
    conditioner = ConditionerWrapper([clip])

    rng = jax.random.PRNGKey(seed)
    dummy = {
        "sample": jnp.zeros((1, lat_hw, lat_hw, 4)),
        "t": jnp.zeros((1,), jnp.int32),
        "cond": {"cond": {"crossattn": jnp.zeros((1, 77, ctx))}},
    }
    unet_params = maybe_import(
        os.path.join(root, "unet/diffusion_pytorch_model.safetensors"),
        import_unet, unet_cfg, random_init,
        lambda: init_params_shape_only(unet, dummy["sample"], dummy["t"], dummy["cond"]),
    )
    vae_params = maybe_import(
        os.path.join(root, "vae/diffusion_pytorch_model.safetensors"),
        import_vae, vae_cfg, random_init,
        lambda: init_params_shape_only(vae, jnp.zeros((1, 64, 64, 3))),
    )
    clip_params = maybe_import(
        os.path.join(root, "text_encoder/model.safetensors"),
        import_clip_text, clip.encoder_config, random_init,
        lambda: clip.init(rng, {"text_ids": jnp.zeros((1, 77), jnp.int32)}),
    )

    try:
        tok_dir = os.path.join(root, "tokenizer")
        if not os.path.isdir(tok_dir):
            raise FileNotFoundError(tok_dir)  # avoid HF-hub network retries
        from transformers import CLIPTokenizerFast

        tok = CLIPTokenizerFast.from_pretrained(tok_dir)

        def tokenizer_fn(texts):
            out = tok(texts, padding="max_length", max_length=77, truncation=True, return_tensors="np")
            return {"text_ids": out["input_ids"]}
    except Exception:
        print("WARNING: no local tokenizer — using zero token ids", file=sys.stderr)

        def tokenizer_fn(texts):
            return {"text_ids": np.zeros((len(texts), 77), np.int32)}

    pipe = FlashPipeline(
        unet, unet_params,
        conditioner=conditioner, conditioner_params=[clip_params],
        vae=vae, vae_params=vae_params,
        tokenizer_fn=tokenizer_fn,
        latent_shape=(lat_hw, lat_hw, 4),
    )
    # path → (tree, scaling) with this model's name map: serve.py's /loras
    # hot-swap endpoint loads through this
    pipe.lora_loader = lambda path: load_peft_safetensors(
        path, unet_params, unet_lora_name_map(unet_cfg), prefix="unet"
    )
    if lora:
        tree, scaling = pipe.lora_loader(lora)
        pipe.load_lora(tree, scaling * lora_scale)
        print(f"loaded LoRA {lora} (scaling {scaling * lora_scale})")
    return pipe


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="sd15", choices=["sd15", "sdxl"])
    ap.add_argument("--weights-root", default="")
    ap.add_argument("--lora", default=None, help="PEFT safetensors adapter")
    ap.add_argument("--lora-scale", type=float, default=1.0)
    ap.add_argument("--prompt", action="append", required=True)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--guidance-scale", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="sample.png")
    ap.add_argument("--random-init", action="store_true")
    args = ap.parse_args()

    pipe = build_pipeline(
        args.model, args.weights_root, args.random_init,
        lora=args.lora, lora_scale=args.lora_scale, seed=args.seed,
    )
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
