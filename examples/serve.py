"""HTTP inference server for 4-NFE flash models (production serving entry).

Wraps examples/sample.py's pipeline in the framework's serving layer
(``flash_diffusion_tpu.serving``): dynamic request batching onto fixed
compile shapes + a stdlib HTTP front end. The reference has no serving
code (its README defers to HF pipelines, reference README.md:316-353).

    python examples/serve.py --model sd15 --weights-root /weights/sd15 \
        --lora flash_lora.safetensors --port 8500

    curl -s localhost:8500/healthz
    curl -s -X POST localhost:8500/generate \
        -d '{"prompt": "A raccoon reading a book", "steps": 4}' > out.png
    curl -s localhost:8500/metrics
    # runtime LoRA hot-swap (no restart; no recompile):
    curl -s localhost:8500/loras
    curl -s -X POST localhost:8500/loras \
        -d '{"action": "load", "path": "/adapters/style.safetensors", "name": "style", "scale": 0.8}'
    curl -s -X POST localhost:8500/loras -d '{"action": "unload", "name": "style"}'

Request fields: prompt (str or list), steps, guidance_scale, seed,
negative_prompt (used when guidance_scale enables CFG), format
("png" | "json"), and optional height/width (pixels, multiples of 64 —
per-request resolution; same-size requests batch together, each new size
compiles once then serves at full speed).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from sample import build_pipeline

from flash_diffusion_tpu.serving import InferenceServer, ServingConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="sd15", choices=["sd15", "sdxl", "pixart", "sd3"])
    ap.add_argument("--weights-root", default="")
    ap.add_argument("--lora", default=None)
    ap.add_argument("--lora-scale", type=float, default=1.0)
    ap.add_argument("--random-init", action="store_true")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8500)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--linger-ms", type=float, default=10.0)
    ap.add_argument(
        "--prewarm", action="store_true",
        help="compile+run every batch size before accepting traffic "
        "(no first-request compile cliff; pairs well with --compile-cache)",
    )
    ap.add_argument(
        "--int8", action="store_true",
        help="W8A8 int8 serving mode (MXU int8 = 2x bf16 rate; see quant.py)",
    )
    ap.add_argument(
        "--compile-cache", default=None, metavar="DIR",
        help="persistent XLA compilation cache: restarts skip the ~minutes "
        "SDXL-size compiles (jax persistent cache keyed on HLO+flags)",
    )
    ap.add_argument(
        "--decode-chunk", type=int, default=0, metavar="K",
        help="decode the batch in serial chunks of K images (0 = whole "
        "batch, fastest). Bounds VAE-decode temps: on 16 GB chips the "
        "full SDXL serving stack (text towers resident) needs K=2 at "
        "max-batch 8 / 1024px (K=4 measured RESOURCE_EXHAUSTED, r5).",
    )
    ap.add_argument(
        "--tp", type=int, default=1, metavar="N",
        help="tensor-parallel degree: shard the denoiser's attention/MLP "
        "kernels over N chips of a ('data','model') mesh (Megatron "
        "column/row placement, parallel/tp.py) — for models larger than "
        "one chip's HBM. Requires device_count %% N == 0.",
    )
    ap.add_argument(
        "--t5", action="store_true",
        help="(sd3) full triple-encoder serving with a REAL T5-XXL stream "
        "(reference conditioning fidelity; reference src/flash/models/"
        "flash_sd3/flash_diffusion_model.py:195-233) instead of the "
        "text_encoder_3=None zero block. +9.4 GB bf16 resident — on 16 GB "
        "chips pair with --tp 2 (text towers TP-shard too) or small "
        "--max-batch + --decode-chunk.",
    )
    ap.add_argument(
        "--t5-max-length", type=int, default=256,
        help="(sd3 --t5) T5 token length (diffusers default 256)",
    )
    args = ap.parse_args()

    if args.compile_cache:
        import jax

        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    pipe = build_pipeline(
        args.model, args.weights_root, args.random_init,
        lora=args.lora, lora_scale=args.lora_scale,
        sd3_t5=args.t5, sd3_t5_max_length=args.t5_max_length,
    )
    if args.int8:
        pipe.quantize("int8")
    if args.decode_chunk:
        pipe.decode_chunk = args.decode_chunk
    if args.tp > 1:
        import jax

        from flash_diffusion_tpu.parallel import create_mesh

        n = len(jax.devices())
        if n % args.tp:
            raise SystemExit(f"--tp {args.tp} does not divide {n} devices")
        mesh = create_mesh(axes=("data", "model"), shape=(n // args.tp, args.tp))
        pipe.shard_tp(mesh)
        print(f"tensor-parallel serving: mesh data={n // args.tp} model={args.tp}")
    config = ServingConfig(
        host=args.host,
        port=args.port,
        max_batch=args.max_batch,
        linger_ms=args.linger_ms,
        batch_sizes=(1, min(4, args.max_batch), args.max_batch),
        prewarm=args.prewarm,
    )
    server = InferenceServer(pipe, config)
    print(f"serving {args.model} on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
