"""Single-dispatch whole-model forward / decode A/B harness.

The r3 measurement discipline (BASELINE.md): scan-loop microbenchmarks on
this relay carry a multi-ms per-step floor and mis-rank kernels by 5-20x,
so every optimization is accepted or rejected on the wall time of ONE
jitted whole-model dispatch closed by a scalar device read (best of N).

Usage:
  python tools/ab_forward.py --model sdxl --batch 8          # denoiser fwd
  python tools/ab_forward.py --model sdxl --batch 8 --decode # VAE decode
  FLASH_TPU_ATTN_PACKED=1 python tools/ab_forward.py ...     # variant under test

Prints one JSON line: {"what": ..., "best_s": ..., "env": {relevant flags}}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compile cache (bench.py defaults the same path): repeat A/Bs of
# unchanged graphs skip the relay's ~5-25 min compile helper
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/flash_tpu_jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="sdxl", choices=["sdxl", "sd15", "pixart", "sd3"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--decode", action="store_true", help="bench the VAE decode instead")
    ap.add_argument("--int8", action="store_true", help="W8A8-quantize denoiser Dense weights")
    ap.add_argument("--int8-convs", action="store_true", help="also W8A8-quantize resnet convs")
    ap.add_argument("--int8-vae", action="store_true", help="W8A8-quantize VAE convs (with --decode)")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--decode-chunk", type=int, default=1, help="images per decode call (with --decode)")
    ap.add_argument("--flops", action="store_true", help="report compiled FLOPs + achieved TFLOP/s")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.argv = ["bench.py"]  # bench.main() argparse guard
    from bench import build

    net, up, vae, vp, latents, cond, res = build(args.model, args.batch)
    if args.int8 or args.int8_convs:
        from flash_diffusion_tpu.quant import quantize_dense

        up, n = quantize_dense(up, convs=args.int8_convs)
        print(f"int8-quantized {n} kernels (convs={args.int8_convs})", file=sys.stderr)
    if args.int8_vae:
        from flash_diffusion_tpu.quant import quantize_dense

        vp, n = quantize_dense(vp, convs=True)
        print(f"int8-quantized {n} VAE kernels", file=sys.stderr)

    if args.decode:
        # 0 = whole batch (bench.py semantics)
        c = args.batch if args.decode_chunk <= 0 else min(args.decode_chunk, args.batch)
        while args.batch % c:
            c -= 1

        @jax.jit
        def fwd(vp, z):
            chunks = z.reshape(args.batch // c, c, *z.shape[1:])
            dec = jax.lax.map(
                lambda zc: vae.apply(vp, zc, method="decode_latents"), chunks
            )
            return dec.reshape(args.batch, *dec.shape[2:])

        call_args = (vp, latents.astype(jnp.bfloat16))
        what = f"{args.model} vae decode b{args.batch} chunk{c}"
    else:
        @jax.jit
        def fwd(up, z):
            t = jnp.full((z.shape[0],), 500.0, jnp.float32)
            return net.apply(up, z.astype(jnp.bfloat16), t, cond)

        call_args = (up, latents)
        what = f"{args.model} denoiser fwd b{args.batch}"

    out = fwd(*call_args)
    _ = float(jnp.asarray(out).mean())  # compile + barrier
    best = 9e9
    for _i in range(args.iters):
        t0 = time.perf_counter()
        out = fwd(*call_args)
        _ = float(jnp.asarray(out).mean())
        best = min(best, time.perf_counter() - t0)

    env = {
        k: v
        for k, v in os.environ.items()
        if k.startswith("FLASH_TPU_") and k != "FLASH_TPU_PALLAS_INTERPRET"
    }
    rec = {"what": what, "best_s": round(best, 4), "env": env}
    if args.flops:
        from bench import _compiled_flops

        fl = _compiled_flops(fwd.lower(*call_args).compile())
        if fl:
            rec["tflop"] = round(fl / 1e12, 2)
            rec["achieved_tflops"] = round(fl / best / 1e12, 1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
