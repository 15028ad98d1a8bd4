"""DPM-Solver++ (2M, multistep) as a pure scan-friendly function.

The SDXL teacher rollout scheduler (reference:
examples/configs/flash_sdxl.yaml:34 ``TEACHER_SCHEDULER:
DPMSolverMultistepScheduler``). Re-derives the diffusers defaults:
``algorithm_type="dpmsolver++"``, ``solver_order=2`` (midpoint),
``final_sigmas_type="zero"``, epsilon-prediction converted to data
prediction.

Multistep state (the previous x̂₀) is threaded explicitly as a carry so the
whole K-step rollout lowers to one ``lax.scan``/``fori_loop``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import (
    Schedule,
    SchedulerConfig,
    batch_broadcast,
    interp_sigma,
    spaced_timesteps,
    training_tables,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DPMSchedule(Schedule):
    """Tables indexed by position; sigma/alpha/lambda have length n+1."""

    alpha_t: jnp.ndarray = None  # [n+1] 1/sqrt(sigma²+1)
    sigma_t: jnp.ndarray = None  # [n+1] sigma * alpha_t
    lambda_t: jnp.ndarray = None  # [n+1] log(alpha/sigma); -inf guarded at terminal


def set_timesteps(config: SchedulerConfig, num_inference_steps: int) -> DPMSchedule:
    acp, _, _ = training_tables(config)
    sigmas_all = np.sqrt((1.0 - acp) / acp)
    timesteps = spaced_timesteps(
        config.num_train_timesteps,
        num_inference_steps,
        config.timestep_spacing,
        config.steps_offset,
    )
    sigmas = interp_sigma(timesteps.astype(np.float64), sigmas_all)
    if config.final_sigmas_type == "zero":
        sigmas = np.append(sigmas, 0.0)
    else:
        sigmas = np.append(sigmas, sigmas_all[0])

    alpha_t = 1.0 / np.sqrt(sigmas**2 + 1.0)
    sigma_t = sigmas * alpha_t
    # lambda = log(alpha/sigma); guard terminal sigma=0 (never read: the last
    # step uses the closed-form sigma_t==0 limit below)
    lam = np.log(alpha_t) - np.log(np.where(sigma_t > 0, sigma_t, 1e-10))

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return DPMSchedule(
        timesteps=jnp.asarray(timesteps, jnp.int32),
        alphas_cumprod=f32(acp),
        sigmas=f32(sigmas),
        init_noise_sigma=jnp.float32(1.0),
        num_inference_steps=num_inference_steps,
        num_train_timesteps=config.num_train_timesteps,
        prediction_type=config.prediction_type,
        alpha_t=f32(alpha_t),
        sigma_t=f32(sigma_t),
        lambda_t=f32(lam),
    )


def scale_model_input(schedule: DPMSchedule, sample: jnp.ndarray, i) -> jnp.ndarray:
    del schedule, i
    return sample


def init_state(sample: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multistep carry: (previous x̂₀, has_history flag).

    The flag matters because rollouts may start at a traced ``start_idx > 0``
    (FlashDiffusion teacher rollout): the first *executed* step must be
    first-order regardless of its position, exactly like diffusers resets
    ``lower_order_nums=0`` on every fresh rollout
    (reference: examples/train_flash_sdxl.py:221-236 uses a freshly-reset
    DPMSolverMultistepScheduler per forward)."""
    return jnp.zeros_like(sample), jnp.zeros((), jnp.bool_)


def convert_model_output(
    schedule: DPMSchedule, model_output: jnp.ndarray, i: jnp.ndarray, sample: jnp.ndarray
) -> jnp.ndarray:
    """Convert model output at position i to a data (x̂₀) prediction."""
    alpha = batch_broadcast(schedule.alpha_t[i], sample)
    sigma = batch_broadcast(schedule.sigma_t[i], sample)
    if schedule.prediction_type == "epsilon":
        return (sample - sigma * model_output) / alpha
    if schedule.prediction_type == "v_prediction":
        return alpha * sample - sigma * model_output
    if schedule.prediction_type == "sample":
        return model_output
    raise ValueError(schedule.prediction_type)


def step(
    schedule: DPMSchedule,
    model_output: jnp.ndarray,
    i: jnp.ndarray,
    sample: jnp.ndarray,
    state: Tuple[jnp.ndarray, jnp.ndarray],
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One DPM-Solver++ 2M step.

    Returns (prev_sample, new_carry). First-order update on the first
    *executed* step (no x̂₀ history in the carry — matches diffusers
    ``lower_order_nums==0`` after a reset, even when the rollout enters at
    a traced start_idx > 0) and at the final step (``lower_order_final``
    with ``final_sigmas_type="zero"``, where the sigma_t→0 limit collapses
    the update to x̂₀ exactly).
    """
    del key
    prev_x0, has_hist = state
    x0 = convert_model_output(schedule, model_output, i, sample)

    # NB: the (σ_next/σ)·x term uses the VP-space sigmas σ_t = σ·α_t
    # (diffusers converts via _sigma_to_alpha_sigma_t before the update),
    # NOT the raw Karras sigmas.
    s_next = batch_broadcast(schedule.sigma_t[i + 1], sample)
    s_cur = batch_broadcast(schedule.sigma_t[i], sample)
    a_next = batch_broadcast(schedule.alpha_t[i + 1], sample)
    lam_next = batch_broadcast(schedule.lambda_t[i + 1], sample)
    lam_cur = batch_broadcast(schedule.lambda_t[i], sample)
    lam_prev = batch_broadcast(schedule.lambda_t[jnp.maximum(i - 1, 0)], sample)

    h = lam_next - lam_cur
    ratio = s_next / s_cur
    phi = jnp.exp(-h) - 1.0

    # first order: x = (σ_next/σ) x - α_next (e^{-h}-1) x̂₀
    first = ratio * sample - a_next * phi * x0

    # second order multistep (midpoint): add -½ α_next (e^{-h}-1) D1
    h_prev = lam_cur - lam_prev
    r0 = jnp.where(h_prev == 0, jnp.ones_like(h), h_prev / h)  # i==0 guard
    d1 = (x0 - prev_x0) / r0
    second = first - 0.5 * a_next * phi * d1

    n = schedule.num_inference_steps
    use_first = jnp.logical_or(jnp.logical_not(has_hist), i == n - 1)
    # terminal sigma == 0: ratio/phi hit 0/-1 limits → first == x̂₀ exactly,
    # but guard NaNs from 0/0 in ratio when sigma_cur==0 (cannot happen: i<n).
    prev = jnp.where(use_first, first, second)
    return prev, (x0, jnp.ones((), jnp.bool_))
