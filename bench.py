"""Headline benchmark: SDXL-architecture 1024² 4-NFE sampling, images/sec/chip.

Matches the reference's published inference setting — 4 denoiser evaluations
(LCM trailing schedule, guidance 0 ⇒ no CFG doubling; reference
README.md:342-352) plus the VAE decode — on random-init weights (timing is
weight-value independent). Prints ONE JSON line. ``vs_baseline`` is the
ratio against the reference repo's published number; it publishes none
(BASELINE.md), so 1.0 = self-baseline.

Usage: python bench.py [--batch N] [--steps 4] [--no-decode] [--small]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


def build(batch: int, small: bool):
    from flash_diffusion_tpu.models import (
        AutoencoderKL,
        UNet2DCondition,
        sd_vae_config,
        sdxl_unet_config,
        sd15_unet_config,
    )
    from flash_diffusion_tpu.schedulers import SchedulerConfig, lcm

    dtype = jnp.bfloat16
    if small:
        unet_cfg = sd15_unet_config()
        latent_hw, ctx_dim, vector_dim = 32, 768, None
    else:
        unet_cfg = sdxl_unet_config()
        latent_hw, ctx_dim, vector_dim = 128, 2048, 2816
    unet = UNet2DCondition(unet_cfg, dtype=dtype)
    vae_cfg = sd_vae_config(scaling_factor=0.13025)
    vae = AutoencoderKL(vae_cfg, dtype=dtype)

    rng = jax.random.PRNGKey(0)
    latents = jax.random.normal(rng, (batch, latent_hw, latent_hw, 4), jnp.float32)
    cond = {"cond": {"crossattn": jnp.zeros((batch, 77, ctx_dim), dtype)}}
    if vector_dim:
        cond["cond"]["vector"] = jnp.zeros((batch, vector_dim), dtype)
    t0 = jnp.zeros((batch,), jnp.int32)

    def zeros_like_shapes(tree):
        # serve in bf16: halves HBM for params (flax init dtype is fp32)
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(
                s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
            ),
            tree,
        )

    unet_params = zeros_like_shapes(jax.eval_shape(lambda: unet.init(rng, latents, t0, cond)))
    vae_params = zeros_like_shapes(
        jax.eval_shape(lambda: vae.init(rng, jnp.zeros((1, 64, 64, 3), dtype)))
    )

    sched = lcm.set_timesteps(SchedulerConfig(), 4)
    return unet, unet_params, vae, vae_params, sched, latents, cond


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0, help="0 = auto (largest fitting)")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--no-decode", action="store_true")
    ap.add_argument("--small", action="store_true", help="SD1.5 @256² (CPU smoke)")
    args = ap.parse_args()

    from flash_diffusion_tpu.schedulers import lcm

    candidates = [args.batch] if args.batch else [4, 2, 1]
    last_err = None
    for batch in candidates:
        try:
            unet, up, vae, vp, sched, latents, cond = build(batch, args.small)

            @jax.jit
            def sample(up, vp, z, key):
                def body(carry, i):
                    s, k = carry
                    t = jnp.broadcast_to(sched.timesteps[i], (z.shape[0],))
                    pred = unet.apply(up, s.astype(jnp.bfloat16), t, cond)
                    k, sub = jax.random.split(k)
                    s = lcm.step(sched, pred, i, s, key=sub)
                    return (s, k), None

                (s, _), _ = jax.lax.scan(body, (z, key), jnp.arange(args.steps))
                if args.no_decode:
                    return s
                # decode per-image (lax.map) to cap VAE peak memory — lets
                # the denoiser run at the larger batch
                return jax.lax.map(
                    lambda zi: vae.apply(vp, zi[None], method=vae.decode_latents)[0], s
                )

            key = jax.random.PRNGKey(1)
            out = sample(up, vp, latents, key)
            jax.block_until_ready(out)  # compile + warmup
            # Chain iterations through the latents so each dispatch depends on
            # the previous result — async dispatch + remote execution cannot
            # overlap or elide work, and the final block covers the whole run.
            t0 = time.perf_counter()
            z = latents
            for i in range(args.iters):
                out = sample(up, vp, z, jax.random.fold_in(key, i))
                z = latents + 1e-6 * out.mean() if args.no_decode else (
                    latents + 1e-6 * out[..., :1, :1, :].mean()
                )
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters
            ips = batch / dt
            res_label = "256" if args.small else "1024"
            arch = "sd15" if args.small else "sdxl"
            print(
                json.dumps(
                    {
                        "metric": f"{arch}_{res_label}px_{args.steps}nfe_images_per_sec_per_chip",
                        "value": round(ips, 4),
                        "unit": "images/sec/chip",
                        "vs_baseline": 1.0,
                        "batch": batch,
                        "step_time_s": round(dt, 4),
                        "backend": jax.default_backend(),
                    }
                )
            )
            return
        except Exception as e:  # OOM → try smaller batch
            last_err = e
            continue
    raise SystemExit(f"bench failed at all batch sizes: {last_err}")


if __name__ == "__main__":
    main()
