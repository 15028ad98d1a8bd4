"""Weights-free end-to-end quality proof of the distillation recipe.

VERDICT r2 directive 3: nothing had demonstrated the algorithm *distills*
— only that its loss decreases. This script provides the quantitative
evidence without any external checkpoint (zero-egress environment):

1. trains a small epsilon-prediction DDPM **teacher** from scratch on a
   synthetic image distribution (colored Gaussian blobs at random
   positions — low-dimensional structure a tiny UNet can learn),
2. **distills** it with the full Flash Diffusion recipe — K-step teacher
   rollout + DMD + adversarial GAN loss (reference
   src/flash/models/flash/flash_diffusion_model.py README claim at
   /root/reference/README.md:57: few-step quality, not just loss curves),
3. reports the Fréchet distance (same mu/cov formula as FID,
   eval/metrics.py) in fixed random-CNN features between held-out data
   and (a) teacher 32-step samples, (b) student 4-NFE samples, (c) an
   UNDISTILLED student (zero-init LoRA = raw student base at 4 NFE — the
   ablation baseline the student must beat).

"Distillation works" == FD(student 4-NFE) is far below FD(undistilled
4-NFE) and in the neighborhood of FD(teacher 32-step), at 8x fewer NFEs.

Run: python examples/toy_quality.py [--teacher-steps N] [--distill-steps N]
Emits one JSON line per metric; exercised (smaller) by
tests/test_toy_quality.py.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flash_diffusion_tpu.distill import FlashDiffusion, FlashDiffusionConfig
from flash_diffusion_tpu.distill.discriminator import (
    ConvDiscriminator,
    DiscriminatorConfig,
)
from flash_diffusion_tpu.eval.metrics import frechet_distance
from flash_diffusion_tpu.lora import init_lora, lora_scaling
from flash_diffusion_tpu.models import UNet2DCondition, UNetConfig
from flash_diffusion_tpu.schedulers import SchedulerConfig
from flash_diffusion_tpu.schedulers.base import training_tables

SIZE = 16  # image side
C = 3

# ---------------------------------------------------------------- data


def make_batch(key, n: int) -> jnp.ndarray:
    """Colored Gaussian blobs: center ~ U(margin), color ~ one of 4 hues,
    radius ~ U. Images in [-1, 1], NHWC."""
    k1, k2, k3 = jax.random.split(key, 3)
    yy, xx = jnp.mgrid[0:SIZE, 0:SIZE]
    center = jax.random.uniform(k1, (n, 2), minval=3.0, maxval=SIZE - 3.0)
    radius = jax.random.uniform(k2, (n, 1, 1), minval=1.5, maxval=3.5)
    palette = jnp.asarray(
        [[1.0, 0.2, 0.2], [0.2, 1.0, 0.3], [0.25, 0.4, 1.0], [1.0, 0.9, 0.2]]
    )
    color = palette[jax.random.randint(k3, (n,), 0, 4)]
    d2 = (yy[None] - center[:, 0, None, None]) ** 2 + (
        xx[None] - center[:, 1, None, None]
    ) ** 2
    blob = jnp.exp(-d2 / (2.0 * radius**2))  # [n, H, W]
    img = blob[..., None] * color[:, None, None, :]  # [n, H, W, 3]
    return 2.0 * img - 1.0


# ------------------------------------------------------- feature net / FD


def _feature_params(key, dim=64):
    """Fixed random conv feature extractor (random-projection features are
    a standard discriminative basis for toy Fréchet distances)."""
    ks = jax.random.split(key, 3)
    shapes = [(3, 3, C, 32), (3, 3, 32, 64), (3, 3, 64, dim)]
    return [
        jax.random.normal(k, s) * np.sqrt(2.0 / (s[0] * s[1] * s[2]))
        for k, s in zip(ks, shapes)
    ]


@jax.jit
def _features(params, x):
    h = x
    for i, w in enumerate(params):
        h = jax.lax.conv_general_dilated(
            h, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        if i < len(params) - 1:
            h = jax.nn.gelu(h)
    return h.mean(axis=(1, 2))  # [B, dim]


def fd(params, a: jnp.ndarray, b: jnp.ndarray) -> float:
    fa = np.asarray(_features(params, a), np.float64)
    fb = np.asarray(_features(params, b), np.float64)
    return frechet_distance(
        fa.mean(0), np.cov(fa, rowvar=False), fb.mean(0), np.cov(fb, rowvar=False)
    )


# ------------------------------------------------------------- teacher


def unet_config():
    return UNetConfig(
        in_channels=C, out_channels=C, block_out_channels=[32, 64],
        down_block_types=["DownBlock2D", "AttnDownBlock2D"], layers_per_block=1,
        transformer_layers_per_block=[1, 1], num_heads=[2, 2],
        cross_attention_dim=None, norm_num_groups=8, mid_block_attn=True,
    )


def train_teacher(unet, steps: int, batch: int, lr: float, seed: int = 0):
    """Standard DDPM epsilon-prediction pretraining (the part the
    reference outsources to a pretrained checkpoint)."""
    sched_cfg = SchedulerConfig()
    _, sqrt_acp, sqrt_1macp = training_tables(sched_cfg)
    sqrt_acp = jnp.asarray(sqrt_acp, jnp.float32)
    sqrt_1macp = jnp.asarray(sqrt_1macp, jnp.float32)

    x0 = make_batch(jax.random.PRNGKey(seed + 99), batch)
    params = unet.init(
        jax.random.PRNGKey(seed), x0, jnp.zeros((batch,), jnp.int32), None
    )
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        kd, kt, kn = jax.random.split(key, 3)
        x0 = make_batch(kd, batch)
        t = jax.random.randint(kt, (batch,), 0, sched_cfg.num_train_timesteps)
        eps = jax.random.normal(kn, x0.shape)
        noisy = (
            sqrt_acp[t][:, None, None, None] * x0
            + sqrt_1macp[t][:, None, None, None] * eps
        )

        def loss_fn(p):
            pred = unet.apply(p, noisy, t, None)
            return jnp.mean((pred - eps) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    key = jax.random.PRNGKey(seed + 1)
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, sub)
        if i % max(1, steps // 5) == 0:
            print(f"  teacher step {i}: loss {float(loss):.4f}", file=sys.stderr)
    return params


# ------------------------------------------------------------- distill


def build_flash(unet):
    # GAN input = teacher mid features (64ch @ 8x8 for this toy): one
    # stride-2 stage then the 4x4 VALID head
    disc = ConvDiscriminator(DiscriminatorConfig(feature_dim=32, num_stages=1))
    model = FlashDiffusion(
        FlashDiffusionConfig(
            K=[4], num_iterations_per_K=[10**9],
            guidance_scale_min=1.0, guidance_scale_max=1.0,
            timestep_distribution="uniform", distill_loss_type="l2",
            use_dmd_loss=True, dmd_loss_scale=[1.0],
            adversarial_loss_scale=[0.3],
        ),
        student_module=unet,
        teacher_module=unet,
        discriminator=disc,
        lora_scaling=lora_scaling(8),
    )
    return model, disc


def distill(model, disc, unet, teacher, steps: int, batch: int, lr: float, seed=0):
    x = make_batch(jax.random.PRNGKey(0), batch)
    lora = init_lora(teacher, rank=8, rng=jax.random.PRNGKey(seed + 2))
    _, feats = unet.apply(
        teacher, x[:1], jnp.zeros((1,), jnp.int32), None, return_features=True
    )
    disc_params = disc.init(jax.random.PRNGKey(seed + 3), feats)
    frozen = {"teacher": teacher, "student_base": teacher}
    trainable = {"lora": lora, "disc": disc_params}
    tx = optax.adam(lr)
    opt = tx.init(trainable)

    @jax.jit
    def step(trainable, opt, key):
        kd, kl = jax.random.split(key)
        batch_d = {"image": make_batch(kd, batch)}

        def loss_fn(tr):
            total, aux = model.losses(tr, frozen, batch_d, kl, 0)
            return total, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(trainable, updates), opt, aux

    key = jax.random.PRNGKey(seed + 4)
    for i in range(steps):
        key, sub = jax.random.split(key)
        trainable, opt, aux = step(trainable, opt, sub)
        if i % max(1, steps // 5) == 0:
            print(
                f"  distill step {i}: G {float(aux['loss/generator']):.4f} "
                f"distill {float(aux['loss/distill']):.4f}",
                file=sys.stderr,
            )
    return trainable["lora"]


# ------------------------------------------------------------- evaluate


def evaluate(model, frozen, lora, n_eval: int, seed=0):
    """FD-vs-data for teacher 32-step, student 4-NFE, undistilled 4-NFE."""
    feat = _feature_params(jax.random.PRNGKey(1234))
    kz, kd, ks = jax.random.split(jax.random.PRNGKey(seed + 7), 3)
    data = make_batch(kd, n_eval)
    z = jax.random.normal(kz, (n_eval, SIZE, SIZE, C))
    batch = {"image": data}

    teacher_s = model.sample(
        frozen, None, z, batch, num_steps=32, use_teacher=True,
        teacher_guidance_scale=1.0, decode=False, rng=ks,
    )
    student_s = model.sample(
        frozen, lora, z, batch, num_steps=4, guidance_scale=1.0,
        decode=False, rng=ks,
    )
    # undistilled ablation: zero LoRA == raw base at 4 NFE
    zero_lora = jax.tree_util.tree_map(jnp.zeros_like, lora)
    undistilled_s = model.sample(
        frozen, zero_lora, z, batch, num_steps=4, guidance_scale=1.0,
        decode=False, rng=ks,
    )
    return {
        "fd_teacher_32nfe": fd(feat, data, teacher_s),
        "fd_student_4nfe": fd(feat, data, student_s),
        "fd_undistilled_4nfe": fd(feat, data, undistilled_s),
    }


def run(teacher_steps, distill_steps, batch, n_eval, seed=0, verbose=True):
    unet = UNet2DCondition(unet_config())
    t0 = time.time()
    teacher = train_teacher(unet, teacher_steps, batch, 2e-3, seed)
    model, disc = build_flash(unet)
    lora = distill(model, disc, unet, teacher, distill_steps, batch, 1e-3, seed)
    frozen = {"teacher": teacher, "student_base": teacher}
    out = evaluate(model, frozen, lora, n_eval, seed)
    out["wall_s"] = round(time.time() - t0, 1)
    return out, (model, frozen, lora)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher-steps", type=int, default=3000)
    ap.add_argument("--distill-steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n-eval", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    out, _ = run(args.teacher_steps, args.distill_steps, args.batch, args.n_eval, args.seed)
    for k, v in out.items():
        print(json.dumps({"metric": f"toy_quality/{k}", "value": round(float(v), 4)}))


if __name__ == "__main__":
    main()
