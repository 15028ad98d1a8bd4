"""Headline benchmark: 4-NFE text-to-image sampling throughput per chip.

Default metric matches the reference's published inference setting on its
flagship — SDXL at 1024², 4 denoiser evaluations (LCM trailing schedule,
guidance 0 ⇒ no CFG doubling; reference README.md:342-352) plus the VAE
decode — on random-init weights (timing is weight-value independent).
``--model {sdxl,sd15,pixart,sd3}`` benches the other families. Prints ONE
JSON line. ``vs_baseline`` is the ratio against the reference repo's
published number; it publishes none (BASELINE.md), so 1.0 = self-baseline.

Timing note: iterations are CHAINED through the latents — under async
dispatch (and the axon relay) blocking on the last result of independent
calls does not serialize earlier ones.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import argparse
import json
import time

import jax
import jax.numpy as jnp


def _zeros_bf16(tree):
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
        tree,
    )


def build(model_name: str, batch: int):
    from flash_diffusion_tpu.models import (
        AutoencoderKL,
        DiT,
        MMDiT,
        UNet2DCondition,
        pixart_config,
        sd3_medium_config,
        sd3_vae_config,
        sd15_unet_config,
        sd_vae_config,
        sdxl_unet_config,
    )

    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    if model_name == "sdxl":
        net = UNet2DCondition(sdxl_unet_config(), dtype=dtype)
        lat_hw, lat_c, res = 128, 4, 1024
        cond = {
            "cond": {
                "crossattn": jnp.zeros((batch, 77, 2048), dtype),
                "vector": jnp.zeros((batch, 2816), dtype),
            }
        }
        vae_cfg = sd_vae_config(scaling_factor=0.13025)
        t0 = jnp.zeros((batch,), jnp.int32)
    elif model_name == "sd15":
        net = UNet2DCondition(sd15_unet_config(), dtype=dtype)
        lat_hw, lat_c, res = 64, 4, 512
        cond = {"cond": {"crossattn": jnp.zeros((batch, 77, 768), dtype)}}
        vae_cfg = sd_vae_config()
        t0 = jnp.zeros((batch,), jnp.int32)
    elif model_name == "pixart":
        net = DiT(pixart_config(sample_size=128), dtype=dtype)
        lat_hw, lat_c, res = 128, 4, 1024
        cond = {
            "cond": {
                "crossattn": jnp.zeros((batch, 120, 4096), dtype),
                "attention_mask": jnp.ones((batch, 120), jnp.int32),
            }
        }
        vae_cfg = sd_vae_config()
        t0 = jnp.zeros((batch,), jnp.int32)
    elif model_name == "sd3":
        net = MMDiT(sd3_medium_config(), dtype=dtype)
        lat_hw, lat_c, res = 128, 16, 1024
        cond = {
            "cond": {
                "crossattn": jnp.zeros((batch, 154, 4096), dtype),
                "vector": jnp.zeros((batch, 2048), dtype),
            }
        }
        vae_cfg = sd3_vae_config()
        t0 = jnp.zeros((batch,), jnp.float32)
    else:
        raise SystemExit(f"unknown --model {model_name}")

    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    latents = jax.random.normal(rng, (batch, lat_hw, lat_hw, lat_c), jnp.float32)
    net_params = _zeros_bf16(jax.eval_shape(lambda: net.init(rng, latents, t0, cond)))
    vae_params = _zeros_bf16(
        jax.eval_shape(lambda: vae.init(rng, jnp.zeros((1, 64, 64, 3), dtype)))
    )
    return net, net_params, vae, vae_params, latents, cond, res


def bench_train(args):
    """Distillation train-step time: Flash-SD (SD1.5 512², K=32 teacher
    rollout, DMD + hinge GAN, LoRA rank 64) — the north-star 'distill step
    time' metric."""
    from flash_diffusion_tpu.distill import (
        ConvDiscriminator,
        DiscriminatorConfig,
        FlashDiffusion,
        FlashDiffusionConfig,
    )
    from flash_diffusion_tpu.lora import init_lora, lora_scaling
    from flash_diffusion_tpu.models import UNet2DCondition, sd15_unet_config
    from flash_diffusion_tpu.trainer import TrainingConfig, TrainingPipeline

    batch = args.batch or 4
    dtype = jnp.bfloat16
    unet = UNet2DCondition(sd15_unet_config(remat=True), dtype=dtype)
    rng = jax.random.PRNGKey(0)
    lat = jax.random.normal(rng, (batch, 64, 64, 4))
    t0 = jnp.zeros((batch,), jnp.int32)
    cond = {"cond": {"crossattn": jnp.zeros((batch, 77, 768), dtype)}}
    teacher = _zeros_bf16(jax.eval_shape(lambda: unet.init(rng, lat, t0, cond)))
    disc = ConvDiscriminator(DiscriminatorConfig(feature_dim=64, num_stages=1))
    disc_params = disc.init(rng, jnp.zeros((batch, 8, 8, 1280)))
    lora = init_lora(teacher, rank=64, rng=rng)

    class FixedCond:
        def __call__(self, params, b, rng=None, ucg_keys=None, set_ucg_rate_zero=False):
            c = dict(cond["cond"])
            if ucg_keys:
                c = {k: jnp.zeros_like(v) for k, v in c.items()}
            return {"cond": c}

        def init(self, rng, b):
            return []

    model = FlashDiffusion(
        FlashDiffusionConfig(
            K=[args.k], num_iterations_per_K=[100000], guidance_scale_min=3.0,
            guidance_scale_max=7.0, timestep_distribution="mixture",
            mixture_num_components=4, use_dmd_loss=True, gan_loss_type="hinge",
        ),
        student_module=unet, teacher_module=unet, conditioner=FixedCond(),
        discriminator=disc, lora_scaling=lora_scaling(64),
    )
    pipe = TrainingPipeline(
        model, TrainingConfig(learning_rates=[1e-5, 1e-5]),
        frozen={"teacher": teacher, "conditioners": []},
        lora_init=lora, disc_init=disc_params,
    )
    state = pipe.init_state()
    step = pipe.step_fn_for_stage(0)
    batch_data = {"image": lat}
    state, aux = step(state, pipe.frozen, batch_data)  # compile + warmup
    _ = float(aux["loss/generator"])  # force full execution (device read)
    t0_ = time.perf_counter()
    for _ in range(args.iters):
        state, aux = step(state, pipe.frozen, batch_data)
    # block_until_ready on donated buffers can return early under remote
    # relays; a scalar device read is an unambiguous execution barrier
    _ = float(aux["loss/generator"])
    dt = (time.perf_counter() - t0_) / args.iters
    print(
        json.dumps(
            {
                "metric": f"sd15_512px_K{args.k}_distill_step_time",
                "value": round(dt, 4),
                "unit": "sec/step",
                "vs_baseline": 1.0,
                "batch": batch,
                "backend": jax.default_backend(),
            }
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="sdxl", choices=["sdxl", "sd15", "pixart", "sd3"])
    ap.add_argument("--batch", type=int, default=0, help="0 = auto (largest fitting)")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--no-decode", action="store_true")
    # measured on v5e: chunk 1 (per-image) beats chunk 4 (2.64s vs 3.24s per
    # batch-8 iteration) — larger decode chunks raise HBM pressure
    ap.add_argument("--decode-chunk", type=int, default=1, help="images per VAE decode call")
    ap.add_argument("--train", action="store_true", help="bench the distill train step")
    ap.add_argument("--k", type=int, default=32, help="teacher rollout steps (--train)")
    args = ap.parse_args()
    if args.train:
        return bench_train(args)

    from flash_diffusion_tpu.schedulers import SchedulerConfig, flow_match, lcm

    is_flow = args.model == "sd3"
    if is_flow:
        sched = flow_match.set_timesteps(SchedulerConfig(shift=3.0), args.steps)
        step_fn = flow_match.flash_step
    else:
        sched = lcm.set_timesteps(SchedulerConfig(), args.steps)
        step_fn = lcm.step

    candidates = [args.batch] if args.batch else [8, 4, 2, 1]
    last_err = None
    for batch in candidates:
        try:
            net, up, vae, vp, latents, cond, res = build(args.model, batch)

            @jax.jit
            def sample(up, vp, z, key):
                def body(carry, i):
                    s, k = carry
                    t = jnp.broadcast_to(sched.timesteps[i], (z.shape[0],)).astype(
                        sched.timesteps.dtype
                    )
                    pred = net.apply(up, s.astype(jnp.bfloat16), t, cond)
                    k, sub = jax.random.split(k)
                    s = step_fn(sched, pred, i, s, key=sub)
                    return (s, k), None

                (s, _), _ = jax.lax.scan(body, (z, key), jnp.arange(args.steps))
                if args.no_decode:
                    return s
                # chunked decode: bounded VAE peak memory, batched MXU work
                c = max(1, min(args.decode_chunk, batch))
                while batch % c:
                    c -= 1
                chunks = s.reshape(batch // c, c, *s.shape[1:])
                dec = jax.lax.map(
                    lambda zc: vae.apply(vp, zc, method=vae.decode_latents), chunks
                )
                return dec.reshape(batch, *dec.shape[2:])

            key = jax.random.PRNGKey(1)
            out = sample(up, vp, latents, key)
            jax.block_until_ready(out)  # compile + warmup
            t0 = time.perf_counter()
            z = latents
            for i in range(args.iters):
                out = sample(up, vp, z, jax.random.fold_in(key, i))
                # chain: next input depends on previous output
                z = latents + 1e-6 * out[..., :1, :1, :].mean()
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters
            print(
                json.dumps(
                    {
                        "metric": f"{args.model}_{res}px_{args.steps}nfe_images_per_sec_per_chip",
                        "value": round(batch / dt, 4),
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
