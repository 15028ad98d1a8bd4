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


def _preflight_backend(args, timeout_s: int = 180) -> None:
    """Fail FAST with an explicit error record when the TPU backend is
    unreachable (the axon relay has died for 1h+ stretches): ``jax.devices()``
    otherwise hangs in init until the caller's timeout and the capture
    records nothing. Probes in a subprocess (a hung in-process init can't be
    cancelled), prints one JSON line with an ``error`` field, exits 1."""
    import subprocess

    try:
        subprocess.run(
            [_sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            check=True,
            capture_output=True,
        )
        return
    except Exception as e:
        print(
            json.dumps(
                {
                    "metric": f"{args.model}_1024px_4nfe_images_per_sec_per_chip"
                    if not args.train
                    else f"{args.model}_distill_step_seconds",
                    "value": 0.0,
                    "unit": "images/sec/chip" if not args.train else "s/step",
                    "vs_baseline": 0.0,
                    "error": f"tpu_backend_unavailable: {type(e).__name__}",
                }
            )
        )
        raise SystemExit(1)


# v5e bf16 matmul peak (TFLOP/s) — for the mfu_vs_peak field
_V5E_BF16_PEAK_TFLOPS = 197.0


def _matmul_probe(n: int = 4096, iters: int = 30) -> float:
    """Pure bf16 matmul roofline probe: achieved TFLOP/s on an n³ matmul.

    Environment drift (libtpu flag changes, clock throttling, relay overhead)
    moves this probe and the model benches together, so ``mfu`` =
    model_tflops / probe_tflops is drift-invariant — it distinguishes "the
    environment got slower" from "the code got slower" inside every driver
    capture (VERDICT r2 weak #1).

    This is the SAME measurement that produced the repo's 172.7 TFLOP/s
    square-matmul roofline (tools/bench_attention.py::bench_matmul, the
    number the round-3 attention table is anchored to — VERDICT r4 #5):
    a batch of independent n³ dots per scan step (enough parallel work to
    saturate the MXU; a single serially-chained dot measures only ~87 —
    latency-bound), serialized across steps by a scalar carry folded into
    one operand, with the full output consumed by a mean so XLA cannot
    slice the dot. The old r2-r4 body additionally ran a full-tile
    multiply per step, which halved its reading to ~89."""
    batch = 8  # a+b HBM = 2·8·n²·2B ≈ 537 MB at n=4096
    a = jax.random.normal(jax.random.PRNGKey(0), (batch, n, n), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (batch, n, n), jnp.bfloat16)

    @jax.jit
    def run(s0, a, b):
        def body(s, _):
            o = jax.lax.dot_general(
                a + s.astype(jnp.bfloat16),  # scalar chain: serializes steps
                b,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            # depend on ALL of o: a bare o[0,0,0] lets XLA slice the dot
            return o.mean() * 1e-20, None

        s, _ = jax.lax.scan(body, s0, None, length=iters)
        return s

    _ = float(run(jnp.float32(0.0), a, b))  # compile + warm; scalar read = barrier
    t0 = time.perf_counter()
    _ = float(run(jnp.float32(0.0), a, b))
    dt = (time.perf_counter() - t0) / iters
    return 2.0 * batch * n**3 / dt / 1e12


def _compiled_flops(lowered_compiled) -> float:
    """Total FLOPs of a compiled computation from XLA's cost analysis
    (0.0 when the backend doesn't expose it, e.g. some relays)."""
    try:
        ca = lowered_compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _attach_probe(rec, args, jitted_fn, dt, *call_args):
    """Add probe_tflops / achieved_tflops / mfu_vs_probe to a bench record."""
    if getattr(args, "no_probe", False):
        return
    try:
        flops = _compiled_flops(jitted_fn.lower(*call_args).compile())
    except Exception:
        flops = 0.0
    probe = _matmul_probe()
    rec["probe_tflops"] = round(probe, 1)
    if flops:
        rec["achieved_tflops"] = round(flops / dt / 1e12, 1)
        rec["mfu_vs_probe"] = round(flops / dt / 1e12 / probe, 3)
        rec["mfu_vs_peak"] = round(flops / dt / 1e12 / _V5E_BF16_PEAK_TFLOPS, 3)


def _zeros_bf16(tree):
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
        tree,
    )


def _import_real_weights(model_name, net, vae, weights_root, net_init, vae_init):
    """Real-weights smoke: when --weights-root holds HF checkpoints for the
    family, import denoiser + VAE weights (bf16-cast) instead of zeros so
    the bench doubles as an on-device numeric sanity run (finite outputs in
    bf16 with real weight distributions)."""
    import os

    from flash_diffusion_tpu.utils.hf import (
        import_sd3_mmdit,
        import_pixart_dit,
        import_unet,
        import_vae,
        load_torch_state_dict,
    )

    subdirs = {
        "sdxl": ("unet", import_unet),
        "sd15": ("unet", import_unet),
        "pixart": ("transformer", import_pixart_dit),
        "sd3": ("transformer", import_sd3_mmdit),
    }
    sub, importer = subdirs[model_name]
    net_params, vae_params = net_init, vae_init
    loaded = []
    for name, subdir, imp, cfg, cast in (
        ("net", sub, importer, net.config, True),
        ("vae", "vae", import_vae, vae.config, True),
    ):
        path = os.path.join(weights_root, subdir, "diffusion_pytorch_model.safetensors")
        if os.path.exists(path):
            params = imp(load_torch_state_dict(path), cfg)
            params = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.bfloat16)
                if jnp.asarray(a).dtype == jnp.float32
                else jnp.asarray(a),
                params,
            )
            if name == "net":
                net_params = params
            else:
                vae_params = params
            loaded.append(name)
    return net_params, vae_params, loaded


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
    """Distillation train-step time (the north-star 'distill step time'
    metric): K-step teacher rollout + DMD + hinge GAN, LoRA rank 64.
    ``--model sd15`` (512², batch 4 default — the reference's CPU-runnable
    flagship config) or ``--model sdxl`` (1024², batch 2 default — possible
    on one chip because the flash-attention backward never materializes the
    [S,S] probability matrix)."""
    from flash_diffusion_tpu.distill import (
        ConvDiscriminator,
        DiscriminatorConfig,
        FlashDiffusion,
        FlashDiffusionConfig,
    )
    from flash_diffusion_tpu.lora import init_lora, lora_scaling
    from flash_diffusion_tpu.models import (
        MMDiT,
        UNet2DCondition,
        sd3_medium_config,
        sd15_unet_config,
        sdxl_unet_config,
    )
    from flash_diffusion_tpu.trainer import TrainingConfig, TrainingPipeline

    from flash_diffusion_tpu.models import DiT, pixart_config

    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    if args.model == "sd3":
        return bench_train_sd3(args)
    if args.model == "pixart":
        batch = args.batch or 1
        unet = DiT(pixart_config(sample_size=128, remat=True), dtype=dtype)
        lat_hw, res = 128, 1024
        cond = {"cond": {"crossattn": jnp.zeros((batch, 120, 4096), dtype)}}
        mid_hw, mid_ch = lat_hw, 4  # disc on 4-ch latent-res features
    elif args.model == "sdxl":
        batch = args.batch or 2
        unet = UNet2DCondition(sdxl_unet_config(remat=True), dtype=dtype)
        lat_hw, res = 128, 1024
        cond = {
            "cond": {
                "crossattn": jnp.zeros((batch, 77, 2048), dtype),
                "vector": jnp.zeros((batch, 2816), dtype),
            }
        }
        mid_hw, mid_ch = lat_hw // 4, 1280  # two downsamples, mid block at 1280ch
    else:
        batch = args.batch or 4
        unet = UNet2DCondition(sd15_unet_config(remat=True), dtype=dtype)
        lat_hw, res = 64, 512
        cond = {"cond": {"crossattn": jnp.zeros((batch, 77, 768), dtype)}}
        mid_hw, mid_ch = lat_hw // 8, 1280
    lat = jax.random.normal(rng, (batch, lat_hw, lat_hw, 4))
    t0 = jnp.zeros((batch,), jnp.int32)
    teacher = _zeros_bf16(jax.eval_shape(lambda: unet.init(rng, lat, t0, cond)))
    stages = 3 if args.model == "pixart" else 1
    disc = ConvDiscriminator(DiscriminatorConfig(feature_dim=64, num_stages=stages))
    disc_params = disc.init(rng, jnp.zeros((batch, mid_hw, mid_hw, mid_ch)))
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
    rec = {
        "metric": f"{args.model}_{res}px_K{args.k}_distill_step_time",
        "value": round(dt, 4),
        "unit": "sec/step",
        "vs_baseline": 1.0,
        "batch": batch,
        "backend": jax.default_backend(),
    }
    _attach_probe(rec, args, step, dt, state, pipe.frozen, batch_data)
    print(json.dumps(rec))


def bench_train_sd3(args):
    """Flash-SD3 (MMDiT 1024², rectified flow) distill train step — the
    flow-matching family's north-star training metric."""
    from flash_diffusion_tpu.distill import (
        ConvDiscriminator,
        DiscriminatorConfig,
        FlashDiffusionSD3,
        FlashDiffusionSD3Config,
    )
    from flash_diffusion_tpu.lora import init_lora, lora_scaling
    from flash_diffusion_tpu.models import MMDiT, sd3_medium_config
    from flash_diffusion_tpu.trainer import TrainingConfig, TrainingPipeline

    batch = args.batch or 1
    dtype = jnp.bfloat16
    mmdit = MMDiT(sd3_medium_config(remat=True), dtype=dtype)
    rng = jax.random.PRNGKey(0)
    lat = jax.random.normal(rng, (batch, 128, 128, 16))
    t0 = jnp.zeros((batch,), jnp.float32)
    cond = {
        "cond": {
            "crossattn": jnp.zeros((batch, 154, 4096), dtype),
            "vector": jnp.zeros((batch, 2048), dtype),
        }
    }
    teacher = _zeros_bf16(jax.eval_shape(lambda: mmdit.init(rng, lat, t0, cond)))
    # post-mid tap: 16-ch latent-res features (examples/train_flash_sd3.py)
    disc = ConvDiscriminator(DiscriminatorConfig(feature_dim=64, num_stages=4))
    disc_params = disc.init(rng, jnp.zeros((batch, 128, 128, 16)))
    lora = init_lora(teacher, rank=64, rng=rng)

    class FixedCond:
        def __call__(self, params, b, rng=None, ucg_keys=None, set_ucg_rate_zero=False):
            c = dict(cond["cond"])
            if ucg_keys:
                c = {k: jnp.zeros_like(v) for k, v in c.items()}
            return {"cond": c}

        def init(self, rng, b):
            return []

    model = FlashDiffusionSD3(
        FlashDiffusionSD3Config(
            K=[args.k], num_iterations_per_K=[100000], guidance_scale_min=3.0,
            guidance_scale_max=7.0, timestep_distribution="mixture",
            mixture_num_components=4, use_dmd_loss=True, gan_loss_type="hinge",
        ),
        student_module=mmdit, teacher_module=mmdit, conditioner=FixedCond(),
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
    state, aux = step(state, pipe.frozen, batch_data)
    _ = float(aux["loss/generator"])
    t0_ = time.perf_counter()
    for _ in range(args.iters):
        state, aux = step(state, pipe.frozen, batch_data)
    _ = float(aux["loss/generator"])
    dt = (time.perf_counter() - t0_) / args.iters
    rec = {
        "metric": f"sd3_1024px_K{args.k}_distill_step_time",
        "value": round(dt, 4),
        "unit": "sec/step",
        "vs_baseline": 1.0,
        "batch": batch,
        "backend": jax.default_backend(),
    }
    _attach_probe(rec, args, step, dt, state, pipe.frozen, batch_data)
    print(json.dumps(rec))


def _examples_pipeline(args):
    """Build the full user-visible pipeline (tokenizer + conditioner stack +
    denoiser + VAE) via the shared examples builder; random-init weights
    unless --weights-root is given (timing is weight-value independent)."""
    _sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "examples"))
    from sample import build_pipeline

    pipe = build_pipeline(
        args.model, args.weights_root or "", random_init=not args.weights_root,
        sd3_t5=getattr(args, "t5", False),
    )
    # bf16 storage for every frozen tree: the bodies compute in bf16 anyway
    # (flax promote_dtype), and fp32 originals of the big text towers
    # (pixart T5-XXL = 19 G fp32) would OOM a 16 G chip at first dispatch
    cast = lambda tree: jax.tree_util.tree_map(
        # dtype read must NOT go through jnp.asarray: that device-puts a full
        # fp32 copy of every host leaf just to inspect it
        lambda a: jnp.asarray(a, jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32
        else a,
        tree,
    )
    # params/base_params start as the SAME tree (pipelines.py); casting them
    # independently materialized the denoiser twice on device (2x5.2G for
    # SDXL) and OOMed the 16G chip before the first e2e dispatch
    shared = pipe.params is pipe.base_params
    pipe.params = cast(pipe.params)
    pipe.base_params = pipe.params if shared else cast(pipe.base_params)
    if args.decode_chunk:
        pipe.decode_chunk = args.decode_chunk
    if pipe.vae_params is not None:
        pipe.vae_params = cast(pipe.vae_params)
    if pipe.conditioner_params is not None:
        pipe.conditioner_params = cast(pipe.conditioner_params)
    return pipe


def bench_e2e(args):
    """End-to-end throughput: tokenize → text encoders → 4-NFE denoise →
    VAE decode (VERDICT r3 #4: the headline bench feeds pre-built zero
    embeddings; a user's images/sec includes the conditioning stack)."""
    pipe = _examples_pipeline(args)
    batch = args.batch or 8
    prompts = [f"a photo of a raccoon reading book number {i}" for i in range(batch)]
    seeds = list(range(batch))
    lshape = pipe.latent_shape
    base = jax.random.normal(jax.random.PRNGKey(1), (batch, *lshape))

    def once(latents):
        return pipe.generate(
            prompts, num_inference_steps=args.steps, guidance_scale=0.0,
            seed=seeds, latents=latents,
        )

    out = once(base)
    _ = float(jnp.asarray(out).mean())  # compile + unambiguous barrier
    t0 = time.perf_counter()
    lat = base
    for _i in range(args.iters):
        out = once(lat)
        # chain: iteration i+1's latents depend on i's images, so the relay
        # cannot pipeline independent dispatches past each other
        lat = base + 1e-6 * out[..., :1, :1, :].mean()
    _ = float(jnp.asarray(out).mean())
    dt = (time.perf_counter() - t0) / args.iters
    res = int(lshape[0] * pipe.vae_scale_factor)
    print(
        json.dumps(
            {
                "metric": f"{args.model}{'_t5' if getattr(args, 't5', False) else ''}_{res}px_{args.steps}nfe_e2e_images_per_sec_per_chip",
                "value": round(batch / dt, 4),
                "unit": "images/sec/chip",
                "vs_baseline": 1.0,
                "batch": batch,
                "step_time_s": round(dt, 4),
                "includes": "tokenize+text_encoders+denoise+decode",
                "decode_chunk": args.decode_chunk or 0,
                "backend": jax.default_backend(),
            }
        )
    )


def bench_serving(args):
    """Serving-stack throughput at occupancy 1.0: the DynamicBatcher fed a
    saturated same-key queue (VERDICT r3 #4 — the serving layer shipped in
    r3 had no number). Includes batching, tokenize, encode, denoise,
    decode, and the host↔device image pull."""
    from flash_diffusion_tpu.serving import DynamicBatcher, ServingConfig

    pipe = _examples_pipeline(args)
    batch = args.batch or 8
    cfg = ServingConfig(max_batch=batch, batch_sizes=(batch,), linger_ms=20.0)
    batcher = DynamicBatcher(pipe, cfg).start()
    try:
        # warm: one full batch through the worker (compiles the graph)
        warm = [
            batcher.submit(f"warm {i}", seed=i, steps=args.steps, guidance=0.0)
            for i in range(batch)
        ]
        for r in warm:
            r.event.wait(timeout=1200)
            assert r.error is None, r.error
        total = batch * args.iters
        t0 = time.perf_counter()
        reqs = [
            batcher.submit(f"req {i}", seed=i, steps=args.steps, guidance=0.0)
            for i in range(total)
        ]
        for r in reqs:
            r.event.wait(timeout=1200)
            assert r.error is None, r.error
            r.image = None  # don't accumulate full-res images in host RAM
        dt = time.perf_counter() - t0
    finally:
        batcher.stop()
    res = int(pipe.latent_shape[0] * pipe.vae_scale_factor)
    occupancy = batcher.images_generated / max(batcher.slots_dispatched, 1)
    print(
        json.dumps(
            {
                "metric": f"{args.model}{'_t5' if getattr(args, 't5', False) else ''}_{res}px_{args.steps}nfe_serving_images_per_sec",
                "value": round(total / dt, 4),
                "unit": "images/sec/chip",
                "vs_baseline": 1.0,
                "batch": batch,
                "occupancy": round(occupancy, 3),
                "includes": "batcher+tokenize+text_encoders+denoise+decode+host_pull",
                "decode_chunk": args.decode_chunk or 0,
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
    ap.add_argument(
        "--int8",
        action="store_true",
        help="W8A8 int8-quantize the denoiser Dense weights (opt-in serving mode)",
    )
    ap.add_argument(
        "--int8-convs",
        action="store_true",
        help="with --int8: also quantize resnet conv kernels",
    )
    ap.add_argument(
        "--no-probe",
        action="store_true",
        help="skip the matmul roofline probe + MFU accounting",
    )
    # r4 on-chip sweep (tools/ab_forward.py, after the attention VMEM fix
    # unblocked batch-8 compile): whole-batch 0.506s vs scanned-per-image
    # 0.731s vs chunk2 1.349s — batch-8 keeps the GN stats reduces
    # sublane-dense where batch-1 runs them at 10-140 GB/s. 0 = whole batch
    # (matches FlashPipeline's decode); use 1 on memory-tight configs.
    ap.add_argument("--decode-chunk", type=int, default=0, help="images per VAE decode call (0 = whole batch)")
    ap.add_argument(
        "--weights-root",
        default=None,
        help="HF checkpoint dir (unet|transformer/ + vae/ safetensors); "
        "imports real weights and asserts finite bf16 outputs",
    )
    ap.add_argument("--train", action="store_true", help="bench the distill train step")
    ap.add_argument("--k", type=int, default=32, help="teacher rollout steps (--train)")
    ap.add_argument(
        "--input-pipeline",
        action="store_true",
        help="bench the host data pipeline (synthetic 1024px jpg shards)",
    )
    ap.add_argument("--num-workers", type=int, default=0, help="(--input-pipeline) 0 = one per CPU core")
    ap.add_argument("--source-size", type=int, default=1024, help="(--input-pipeline) synthetic jpeg source resolution")
    ap.add_argument("--no-draft", action="store_true", help="(--input-pipeline) disable DCT-scaled jpeg decode")
    ap.add_argument("--worker-backend", default="thread", choices=["thread", "process"])
    ap.add_argument(
        "--decoder", default="pil", choices=["pil", "native"],
        help="(--input-pipeline) native = C++ fused decode+resize (GIL-free)",
    )
    ap.add_argument(
        "--e2e",
        action="store_true",
        help="bench tokenize → text encoders → sample → decode (full user path)",
    )
    ap.add_argument(
        "--serving",
        action="store_true",
        help="bench the DynamicBatcher serving stack at occupancy 1.0",
    )
    ap.add_argument(
        "--t5",
        action="store_true",
        help="(--e2e/--serving, sd3) triple-encoder mode with a real "
        "T5-XXL stream (reference conditioning fidelity)",
    )
    args = ap.parse_args()
    if args.input_pipeline:
        return bench_input_pipeline(args)
    # persistent XLA compile cache (keyed on HLO+flags): SDXL-size compiles
    # run ~5-25 min on this relay's compile helper; repeated captures of the
    # same graph (A/Bs, driver runs after a measurement batch) become
    # seconds. Honors an externally-set cache dir.
    _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/flash_tpu_jax_cache")
    jax.config.update(
        "jax_compilation_cache_dir", _os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    _preflight_backend(args)
    if args.train:
        return bench_train(args)
    if args.e2e:
        return bench_e2e(args)
    if args.serving:
        return bench_serving(args)

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
            loaded_weights = []
            if args.weights_root:
                up, vp, loaded_weights = _import_real_weights(
                    args.model, net, vae, args.weights_root, up, vp
                )
            n_quant = 0
            if args.int8:
                from flash_diffusion_tpu.quant import quantize_dense

                up, n_quant = quantize_dense(up, convs=args.int8_convs)

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
                c = batch if args.decode_chunk <= 0 else min(args.decode_chunk, batch)
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
            if loaded_weights:
                import numpy as _np

                assert _np.all(_np.isfinite(_np.asarray(out, _np.float32))), (
                    "non-finite outputs with real weights (bf16 overflow?)"
                )
            t0 = time.perf_counter()
            z = latents
            for i in range(args.iters):
                out = sample(up, vp, z, jax.random.fold_in(key, i))
                # chain: next input depends on previous output
                z = latents + 1e-6 * out[..., :1, :1, :].mean()
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters
            rec = {
                "metric": f"{args.model}_{res}px_{args.steps}nfe_images_per_sec_per_chip",
                "value": round(batch / dt, 4),
                "unit": "images/sec/chip",
                "vs_baseline": 1.0,
                "batch": batch,
                "step_time_s": round(dt, 4),
                "real_weights": loaded_weights,
                "backend": jax.default_backend(),
                **({"int8_kernels": n_quant} if args.int8 else {}),
            }
            if not args.no_probe:
                flops = _compiled_flops(
                    sample.lower(up, vp, latents, key).compile()
                )
                probe = _matmul_probe()
                rec["probe_tflops"] = round(probe, 1)
                if flops:
                    rec["achieved_tflops"] = round(flops / dt / 1e12, 1)
                    rec["mfu_vs_probe"] = round(flops / dt / 1e12 / probe, 3)
                    rec["mfu_vs_peak"] = round(
                        flops / dt / 1e12 / _V5E_BF16_PEAK_TFLOPS, 3
                    )
            print(json.dumps(rec))
            return
        except Exception as e:  # OOM → try smaller batch
            last_err = e
            continue
    raise SystemExit(f"bench failed at all batch sizes: {last_err}")


def bench_input_pipeline(args):
    """Host pipeline throughput: synthetic 1024² jpg tar shards through the
    SDXL-style mapper chain (json-caption extract, rename, resize/crop/
    to-tensor, rescale). The device consumes ≈3 img/s/chip at the SDXL
    headline rate — the host must beat N_chips× that (SURVEY §7 hard
    part #6)."""
    import io
    import json as _json
    import tarfile
    import tempfile

    import numpy as np
    from PIL import Image

    from flash_diffusion_tpu.data import (
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

    import os as _os2

    if args.num_workers <= 0:
        # one worker per core; on a 1-core box extra workers only add GIL
        # contention (measured: 38.5 img/s at 1 worker vs 21.0 at 8)
        args.num_workers = _os2.cpu_count() or 1
    res = 1024
    src = max(args.source_size, res)
    per_shard, n_shards = 64, max(4, args.num_workers)
    root = tempfile.mkdtemp(prefix="bench_shards_")
    rng = np.random.default_rng(0)
    base = (rng.random((src, src, 3)) * 255).astype(np.uint8)
    shards = []
    idx = 0
    for s in range(n_shards):
        path = f"{root}/{s:06d}.tar"
        with tarfile.open(path, "w") as tf:
            for _ in range(per_shard):
                img = Image.fromarray(np.roll(base, idx, axis=0))
                buf = io.BytesIO()
                img.save(buf, format="JPEG", quality=90)
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{idx:06d}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                meta = _json.dumps({"caption": f"sample {idx}"}).encode()
                info = tarfile.TarInfo(f"{idx:06d}.json")
                info.size = len(meta)
                tf.addfile(info, io.BytesIO(meta))
                idx += 1
        shards.append(path)

    if args.decoder == "native":
        from flash_diffusion_tpu.data.native_decode import (
            NativeDecodeMapper,
            NativeDecodeMapperConfig,
            is_available,
        )

        assert is_available(), "native decoder unavailable (g++/libjpeg missing)"
        image_mapper = NativeDecodeMapper(
            NativeDecodeMapperConfig(key="image", height=res, width=res)
        )
        tail = []
    else:
        image_mapper = ImageTransformMapper(
            ImageTransformMapperConfig(
                key="image",
                transforms=[
                    {"name": "Resize", "size": [res, res]},
                    {"name": "CenterCrop", "size": [res, res]},
                    {"name": "ToTensor"},
                ],
            )
        )
        tail = [RescaleMapper(RescaleMapperConfig(key="image"))]
    chain = [
        MapperWrapper(
            [
                KeysFromJSONMapper(
                    KeysFromJSONMapperConfig(
                        key="json", keys_to_extract=["caption"], remove_original=True,
                        strict=False,
                    )
                ),
                KeyRenameMapper(KeyRenameMapperConfig(key_map={"jpg": "image", "caption": "text"})),
                image_mapper,
                *tail,
            ]
        )
    ]
    cfg = DataModuleConfig(
        shards_path_or_urls=shards, per_worker_batch_size=8,
        num_workers=args.num_workers, shuffle_buffer_size=16,
        worker_backend=args.worker_backend,
        decoder="raw_image" if args.decoder == "native" else "pil",
        # DCT-scaled JPEG decode straight to >= res (only kicks in when the
        # synthetic source (--source-size) exceeds the train res)
        decode_draft_size=None if args.no_draft else res,
    )
    # explicit process indices: this bench is host-only, and letting
    # DataPipeline ask jax.process_index() would INITIALIZE the TPU
    # backend (a dead relay then hangs the whole bench)
    pipe = DataPipeline(cfg, chain, process_index=0, process_count=1)
    # warmup one batch (thread spin-up), then time a full epoch
    it = pipe.batches(epoch=0)
    next(it)
    t0 = time.perf_counter()
    n_imgs = sum(b["image"].shape[0] for b in it)
    dt = time.perf_counter() - t0
    rate = n_imgs / dt
    device_rate = 3.0  # SDXL 1024² 4-NFE img/s/chip (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": f"input_pipeline_{res}px_images_per_sec_per_host",
                "source_px": src,
                "value": round(rate, 2),
                "unit": "images/sec/host",
                "vs_baseline": 1.0,
                "num_workers": args.num_workers,
                "worker_backend": args.worker_backend,
                "decoder": args.decoder,
                "chips_fed_at_sdxl_rate": round(rate / device_rate, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
