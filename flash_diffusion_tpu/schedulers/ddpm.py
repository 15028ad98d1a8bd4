"""DDPM ancestral sampler as pure functions (re-derivation of diffusers DDPMScheduler).

Used as the teacher *noise* scheduler for the SD1.5/Pixart families
(reference: src/flash/models/flash/flash_diffusion_model.py:53,139 drives
``DDPMScheduler.set_timesteps/add_noise/step``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import (
    step_noise,
    Schedule,
    SchedulerConfig,
    batch_broadcast,
    make_betas,
    predicted_x0,
    spaced_timesteps,
    training_tables,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DDPMSchedule(Schedule):
    """DDPM schedule with per-step posterior coefficient tables (length n)."""

    # tables indexed by position i in `timesteps`
    sqrt_acp_t: jnp.ndarray = None  # [n]
    sqrt_1macp_t: jnp.ndarray = None  # [n]
    x0_coeff: jnp.ndarray = None  # [n] posterior mean coeff on x̂₀
    sample_coeff: jnp.ndarray = None  # [n] posterior mean coeff on x_t
    sigma_noise: jnp.ndarray = None  # [n] sqrt(posterior variance); 0 at final
    clip_sample: bool = dataclasses.field(default=False, metadata=dict(static=True))
    clip_range: float = dataclasses.field(default=1.0, metadata=dict(static=True))


def set_timesteps(config: SchedulerConfig, num_inference_steps: int) -> DDPMSchedule:
    acp, _, _ = training_tables(config)
    timesteps = spaced_timesteps(
        config.num_train_timesteps,
        num_inference_steps,
        config.timestep_spacing,
        config.steps_offset,
    )
    # diffusers DDPM: prev_t = t - T // num_inference_steps
    prev_t = timesteps - config.num_train_timesteps // num_inference_steps
    alpha_prod_t = acp[timesteps]
    alpha_prod_prev = np.where(prev_t >= 0, acp[np.clip(prev_t, 0, None)], 1.0)
    beta_prod_t = 1.0 - alpha_prod_t
    beta_prod_prev = 1.0 - alpha_prod_prev
    current_alpha = alpha_prod_t / alpha_prod_prev
    current_beta = 1.0 - current_alpha

    x0_coeff = np.sqrt(alpha_prod_prev) * current_beta / beta_prod_t
    sample_coeff = np.sqrt(current_alpha) * beta_prod_prev / beta_prod_t
    # fixed_small variance, zeroed at t == 0
    variance = np.clip(beta_prod_prev / beta_prod_t * current_beta, 1e-20, None)
    sigma_noise = np.where(timesteps > 0, np.sqrt(variance), 0.0)

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return DDPMSchedule(
        timesteps=jnp.asarray(timesteps, jnp.int32),
        alphas_cumprod=f32(acp),
        sigmas=f32(np.append(np.sqrt(beta_prod_t / alpha_prod_t), 0.0)),
        init_noise_sigma=jnp.float32(1.0),
        num_inference_steps=num_inference_steps,
        num_train_timesteps=config.num_train_timesteps,
        prediction_type=config.prediction_type,
        sqrt_acp_t=f32(np.sqrt(alpha_prod_t)),
        sqrt_1macp_t=f32(np.sqrt(beta_prod_t)),
        x0_coeff=f32(x0_coeff),
        sample_coeff=f32(sample_coeff),
        sigma_noise=f32(sigma_noise),
        clip_sample=config.clip_sample,
        clip_range=config.clip_sample_range,
    )


def scale_model_input(schedule: DDPMSchedule, sample: jnp.ndarray, i) -> jnp.ndarray:
    del schedule, i
    return sample


def step(
    schedule: DDPMSchedule,
    model_output: jnp.ndarray,
    i: jnp.ndarray,
    sample: jnp.ndarray,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """One ancestral reverse step x_{t_i} -> x_{t_{i+1}}.

    ``i`` is the position in ``schedule.timesteps`` (traced ok). ``key`` seeds
    the posterior noise; pass None for deterministic (variance-free) stepping.
    """
    b = lambda tab: batch_broadcast(tab[i], sample)
    x0 = predicted_x0(model_output, sample, b(schedule.sqrt_acp_t), b(schedule.sqrt_1macp_t), schedule.prediction_type)
    if schedule.clip_sample:
        x0 = jnp.clip(x0, -schedule.clip_range, schedule.clip_range)
    prev = b(schedule.x0_coeff) * x0 + b(schedule.sample_coeff) * sample
    if key is not None:
        noise = step_noise(key, sample)
        prev = prev + b(schedule.sigma_noise) * noise
    return prev
