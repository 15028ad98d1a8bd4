"""COCO-style FID / CLIP-score evaluation CLI — the framework's quality
gate (the reference publishes COCO FID/CLIP claims with no in-repo eval
code; reference README.md:57).

    python examples/eval_coco.py --model sd15 --weights-root /weights/sd15 \
        --shards /data/coco/{00000..00012}.tar --lora flash_lora.safetensors \
        --inception /weights/inception_v3_google.pth --max-batches 200

Shard samples need an image (jpg/png) + caption (txt or json["caption"]).
Reports InceptionV3-pool3 FID (when --inception given). Weights file name
decides the block semantics: a ``pt_inception-2015-12-05`` checkpoint (or
``--fid-variant``) selects the canonical pytorch-fid blocks — FID is then
directly comparable to published COCO tables; a torchvision
``inception_v3_google`` checkpoint gives internally-consistent-only values
(see models/inception.py). And/or CLIP-FID (CLIP vision weights under
--weights-root image_encoder/). CLIPScore additionally requires the matched
text tower: put a FULL CLIP checkpoint (both towers + text_projection, e.g.
openai/clip-vit-large-patch14 model.safetensors) at image_encoder/."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from sample import build_pipeline  # noqa: E402

from flash_diffusion_tpu.data import (  # noqa: E402
    DataModuleConfig,
    DataPipeline,
    ImageTransformMapper,
    ImageTransformMapperConfig,
    KeyRenameMapper,
    KeyRenameMapperConfig,
    KeysFromJSONMapper,
    KeysFromJSONMapperConfig,
    MapperWrapper,
    RescaleMapper,
    RescaleMapperConfig,
)
from flash_diffusion_tpu.eval import evaluate  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="sd15", choices=["sd15", "sdxl", "pixart", "sd3"])
    ap.add_argument("--weights-root", default="")
    ap.add_argument("--shards", nargs="+", required=True)
    ap.add_argument("--lora", default=None)
    ap.add_argument("--lora-scale", type=float, default=1.0)
    ap.add_argument(
        "--inception", default=None,
        help="inception_v3 .pth (torchvision or pt_inception-2015-12-05)",
    )
    ap.add_argument(
        "--fid-variant", action="store_true",
        help="force canonical pytorch-fid block semantics (auto-detected "
        "from a pt_inception* filename)",
    )
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--guidance-scale", type=float, default=0.0)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--max-batches", type=int, default=None)
    ap.add_argument("--resolution", type=int, default=0, help="0 = model native")
    ap.add_argument("--random-init", action="store_true")
    args = ap.parse_args()

    pipe = build_pipeline(
        args.model, args.weights_root, args.random_init,
        lora=args.lora, lora_scale=args.lora_scale,
    )
    tokenizer_fn = pipe.tokenizer_fn

    res = args.resolution or (512 if args.model == "sd15" else 1024)
    chain = [
        MapperWrapper(
            [
                KeysFromJSONMapper(
                    KeysFromJSONMapperConfig(
                        key="json", keys_to_extract=["caption"], remove_original=True,
                        strict=False,
                    )
                ),
                KeyRenameMapper(
                    KeyRenameMapperConfig(
                        key_map={"jpg": "image", "png": "image", "caption": "text", "txt": "text"}
                    )
                ),
                ImageTransformMapper(
                    ImageTransformMapperConfig(
                        key="image",
                        transforms=[
                            {"name": "Resize", "size": [res, res]},
                            {"name": "CenterCrop", "size": [res, res]},
                            {"name": "ToTensor"},
                        ],
                    )
                ),
                RescaleMapper(RescaleMapperConfig(key="image")),
            ]
        )
    ]
    data = DataPipeline(
        DataModuleConfig(
            shards_path_or_urls=list(args.shards),
            per_worker_batch_size=args.batch_size,
            num_workers=max(1, (os.cpu_count() or 2) - 1),
            shuffle_buffer_size=1,
            shuffle_shards=False,
        ),
        chain,
    )

    def batches():
        for b in data.batches(epoch=0):
            b = dict(b)
            b.update(tokenizer_fn(list(b.get("text", [])) or [""] * b["image"].shape[0]))
            yield b

    inception_params = None
    fid_variant = False
    if args.inception:
        from flash_diffusion_tpu.models import load_inception_v3

        inception_params = load_inception_v3(args.inception)
        fid_variant = args.fid_variant or "pt_inception" in os.path.basename(args.inception)

    vision_module = vision_params = text_embed_fn = None
    clip_vis = os.path.join(args.weights_root or "", "image_encoder/model.safetensors")
    if os.path.exists(clip_vis):
        from flash_diffusion_tpu.models.vision import CLIPVisionConfig, CLIPVisionModel
        from flash_diffusion_tpu.utils.hf import import_clip_vision, load_torch_state_dict

        cfg = CLIPVisionConfig(hidden_size=1024, intermediate_size=4096, num_layers=24, num_heads=16, projection_dim=768)  # ViT-L/14
        vision_module = CLIPVisionModel(cfg)
        sd = load_torch_state_dict(clip_vis)
        vision_params = import_clip_vision(sd, cfg)
        # CLIPScore needs the matched PROJECTED text tower. A full CLIP
        # checkpoint (openai/clip-vit-large-patch14) carries both towers in
        # one file; when the text side + text_projection are present, build
        # the text embedder so evaluate() reports clip_score too.
        if "text_projection.weight" in sd:
            import jax
            import numpy as np

            from flash_diffusion_tpu.models.text_encoders import (
                CLIPTextModel,
                clip_l_config,
            )
            from flash_diffusion_tpu.utils.hf import import_clip_text

            tcfg = clip_l_config(projection_dim=768)
            text_module = CLIPTextModel(tcfg)
            text_params = import_clip_text(sd, tcfg)
            embed_text = jax.jit(
                lambda ids: text_module.apply(
                    text_params, ids, output_hidden_states=False
                )["text_embeds"]
            )

            def text_embed_fn(batch):
                texts = list(batch.get("text", []))
                ids = tokenizer_fn(texts or [""] * batch["image"].shape[0])["text_ids"]
                return embed_text(np.asarray(ids))

    if inception_params is None and vision_params is None:
        raise SystemExit(
            "no feature extractor: pass --inception weights and/or put CLIP "
            "vision weights under <weights-root>/image_encoder/"
        )

    metrics = evaluate(
        pipe,
        batches(),
        vision_module=vision_module,
        vision_params=vision_params,
        text_embed_fn=text_embed_fn,
        num_inference_steps=args.steps,
        guidance_scale=args.guidance_scale,
        max_batches=args.max_batches,
        inception_params=inception_params,
        inception_fid_variant=fid_variant,
    )
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v) for k, v in metrics.items()}))


if __name__ == "__main__":
    main()
