"""Distillation / DMD / adversarial losses (pure functions, jit-safe).

Re-derivations of the reference losses
(reference: src/flash/models/flash/flash_diffusion_model.py:368-667). The GAN
losses are restructured for a *single* jitted train step: instead of the
reference's step-parity double forward (trainer/trainer.py:187-218 runs the
whole model twice, once per optimizer), both generator and discriminator
losses are produced from one shared computation with stop_gradient
discipline: the caller sums ``loss_G(fake, sg(disc))`` and
``loss_D(sg(fake), disc)`` so one backward yields both gradients.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def l2_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-sample mean squared error, then batch mean (reference :368-375)."""
    return jnp.mean(jnp.square(a - b).reshape(a.shape[0], -1), axis=1).mean()


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b).reshape(a.shape[0], -1), axis=1).mean()


def huber_loss(a: jnp.ndarray, b: jnp.ndarray, c: float = 0.001) -> jnp.ndarray:
    """Pseudo-huber, the LCM-paper distill loss (extension beyond reference)."""
    return jnp.mean(jnp.sqrt(jnp.square(a - b) + c * c) - c)


def center_crop(x: jnp.ndarray, size: int = 64) -> jnp.ndarray:
    """Center-crop latents [B,H,W,C] to ``size``² (lpips patch crop,
    reference :383-392)."""
    h, w = x.shape[1], x.shape[2]
    top, left = (h - size) // 2, (w - size) // 2
    return x[:, top : top + size, left : left + size, :]


def dmd_loss(
    student_output: jnp.ndarray,
    real_noise_pred: jnp.ndarray,
    fake_noise_pred: jnp.ndarray,
    pred_x0_from_real: jnp.ndarray,
    alpha_prod_t: jnp.ndarray,
    weighted: bool = True,
) -> jnp.ndarray:
    """Distribution Matching Distillation loss (reference :401-499).

    All *_pred inputs must already be stop_gradient'd (teacher/student
    forwards on the re-noised student output). The caller supplies CFG-mixed
    ``real_noise_pred`` and the student's ``fake_noise_pred``.

    With ``weighted=False`` the alpha/beta coefficient is dropped — the SD3
    variant's simplification (flash_sd3/flash_diffusion_model.py:415-496).
    """
    score_diff = real_noise_pred - fake_noise_pred  # = score_fake - score_real
    if weighted:
        ap = alpha_prod_t.reshape(-1, *([1] * (student_output.ndim - 1)))
        coeff = score_diff * jnp.sqrt((1.0 - ap)) / jnp.sqrt(ap)
    else:
        coeff = score_diff
    weight = 1.0 / (
        jnp.mean(
            jnp.abs(student_output - pred_x0_from_real),
            axis=tuple(range(1, student_output.ndim)),
            keepdims=True,
        )
        + 1e-5
    )
    weight = jax.lax.stop_gradient(weight)
    target = jax.lax.stop_gradient(student_output - weight * coeff)
    return jnp.mean(jnp.square(student_output - target))


def gan_losses(
    disc_fn: Callable[[Dict, jnp.ndarray], jnp.ndarray],
    disc_params,
    fake_features: jnp.ndarray,
    real_features: jnp.ndarray,
    loss_type: str = "hinge",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(loss_G, loss_D) for the five reference GAN variants (:573-662).

    ``disc_fn(params, features) -> [B, 1]`` logits. Gradient routing:
    loss_G sees gradients through ``fake_features`` only (disc params
    stopped); loss_D sees gradients through ``disc_params`` only.
    WGAN weight clipping is the caller's job after the optimizer step.
    """
    sg = jax.lax.stop_gradient
    disc_sg = jax.tree_util.tree_map(sg, disc_params)

    d_fake_g = disc_fn(disc_sg, fake_features)  # grads → generator
    d_fake_d = disc_fn(disc_params, sg(fake_features))  # grads → discriminator
    d_real = disc_fn(disc_params, sg(real_features))

    ones = jnp.ones_like(d_fake_g)
    zeros = jnp.zeros_like(d_fake_g)

    if loss_type == "wgan":
        loss_g = -jnp.mean(d_fake_g)
        loss_d = -jnp.mean(d_real) + jnp.mean(d_fake_d)
    elif loss_type == "lsgan":
        loss_g = jnp.mean(jnp.square(jax.nn.sigmoid(d_fake_g) - ones))
        loss_d = 0.5 * (
            jnp.mean(jnp.square(jax.nn.sigmoid(d_real) - ones))
            + jnp.mean(jnp.square(jax.nn.sigmoid(d_fake_d) - zeros))
        )
    elif loss_type == "hinge":
        loss_g = -jnp.mean(d_fake_g)
        loss_d = jnp.mean(jax.nn.relu(1.0 - d_real)) + jnp.mean(jax.nn.relu(1.0 + d_fake_d))
    elif loss_type == "non-saturating":
        loss_g = -jnp.mean(jnp.log(jax.nn.sigmoid(d_fake_g) + 1e-8))
        loss_d = -jnp.mean(
            jnp.log(jax.nn.sigmoid(d_real) + 1e-8)
            + jnp.log(1.0 - jax.nn.sigmoid(d_fake_d) + 1e-8)
        )
    elif loss_type == "vanilla":
        bce = lambda logits, target: jnp.mean(
            jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
        loss_g = bce(d_fake_g, ones)
        loss_d = bce(d_real, ones) + bce(d_fake_d, zeros)
    else:
        raise ValueError(f"Unknown gan_loss_type {loss_type!r}")
    return loss_g, loss_d


def clip_disc_weights(disc_params, limit: float = 0.01):
    """WGAN weight clipping (reference :574-576), applied post-update."""
    return jax.tree_util.tree_map(lambda p: jnp.clip(p, -limit, limit), disc_params)
