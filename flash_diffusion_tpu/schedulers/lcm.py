"""LCM sampler — the published Flash Diffusion student scheduler.

Re-derivation of diffusers' LCMScheduler as driven by the reference: the
student samples with ``LCMScheduler(timestep_spacing="trailing")`` and the
training-time sampler passes *custom* timesteps copied from the teacher
schedule (reference: src/flash/models/flash/flash_diffusion_model.py:781-789,
README.md:342-352).

Each step predicts x̂₀, forms the consistency output
``c_out·x̂₀ + c_skip·x_t`` (timestep_scaling=10, sigma_data=0.5), then —
except at the final step — re-noises to the next timestep with *fresh* noise.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .base import (
    step_noise,
    Schedule,
    SchedulerConfig,
    batch_broadcast,
    predicted_x0,
    training_tables,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LCMSchedule(Schedule):
    sqrt_acp_t: jnp.ndarray = None  # [n] at current timestep
    sqrt_1macp_t: jnp.ndarray = None  # [n]
    sqrt_acp_prev: jnp.ndarray = None  # [n] at next timestep (1.0 at final)
    sqrt_1macp_prev: jnp.ndarray = None  # [n] (0.0 at final)
    c_skip: jnp.ndarray = None  # [n]
    c_out: jnp.ndarray = None  # [n]
    is_final: jnp.ndarray = None  # [n] 1.0 at the last position


def boundary_scalings(timesteps, timestep_scaling: float = 10.0, sigma_data: float = 0.5):
    """LCM consistency boundary conditions c_skip/c_out.

    Equivalent to the reference's ``_scalings_for_boundary_conditions``
    (src/flash/models/flash/flash_diffusion_model.py:710-716, which writes
    ``timestep / 0.1`` — i.e. scaling 10).
    """
    scaled = np.asarray(timesteps, np.float64) * timestep_scaling
    c_skip = sigma_data**2 / (scaled**2 + sigma_data**2)
    c_out = scaled / np.sqrt(scaled**2 + sigma_data**2)
    return c_skip, c_out


def set_timesteps(
    config: SchedulerConfig,
    num_inference_steps: Optional[int] = None,
    timesteps: Optional[Sequence[int]] = None,
) -> LCMSchedule:
    """Build the schedule from a step count or explicit (descending) timesteps.

    When ``timesteps`` is None the grid follows diffusers' LCMScheduler: a
    skipping grid over ``original_inference_steps`` LCM origin timesteps
    ``(range(1, orig+1) * (T // orig) - 1)`` — NOT ``timestep_spacing``
    (LCMScheduler ignores that config field; e.g. 4 steps at T=1000,
    orig=50 → [999, 759, 499, 259]). This is the published Flash Diffusion
    inference grid (reference README.md:342-352)."""
    acp, sqrt_acp, sqrt_1macp = training_tables(config)
    if timesteps is None:
        orig = config.original_inference_steps
        k = config.num_train_timesteps // orig
        origin = np.arange(1, orig + 1, dtype=np.int64)[::-1] * k - 1
        idx = np.floor(
            np.linspace(0, len(origin), num=num_inference_steps, endpoint=False)
        ).astype(np.int64)
        timesteps = origin[idx]
    timesteps = np.asarray(timesteps, np.int64)
    n = len(timesteps)
    prev_timesteps = np.append(timesteps[1:], 0)

    c_skip, c_out = boundary_scalings(timesteps, config.timestep_scaling, config.sigma_data)
    is_final = np.zeros(n)
    is_final[-1] = 1.0

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return LCMSchedule(
        timesteps=jnp.asarray(timesteps, jnp.int32),
        alphas_cumprod=f32(acp),
        sigmas=f32(np.append(np.sqrt((1 - acp[timesteps]) / acp[timesteps]), 0.0)),
        init_noise_sigma=jnp.float32(1.0),
        num_inference_steps=n,
        num_train_timesteps=config.num_train_timesteps,
        prediction_type=config.prediction_type,
        sqrt_acp_t=f32(sqrt_acp[timesteps]),
        sqrt_1macp_t=f32(sqrt_1macp[timesteps]),
        sqrt_acp_prev=f32(sqrt_acp[prev_timesteps]),
        sqrt_1macp_prev=f32(sqrt_1macp[prev_timesteps]),
        c_skip=f32(c_skip),
        c_out=f32(c_out),
        is_final=f32(is_final),
    )


def scale_model_input(schedule: LCMSchedule, sample: jnp.ndarray, i) -> jnp.ndarray:
    del schedule, i
    return sample


def step(
    schedule: LCMSchedule,
    model_output: jnp.ndarray,
    i: jnp.ndarray,
    sample: jnp.ndarray,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """One LCM step. Returns the denoised output at the final position."""
    b = lambda tab: batch_broadcast(tab[i], sample)
    x0 = predicted_x0(
        model_output, sample, b(schedule.sqrt_acp_t), b(schedule.sqrt_1macp_t), schedule.prediction_type
    )
    denoised = b(schedule.c_out) * x0 + b(schedule.c_skip) * sample
    if key is None:
        noise = jnp.zeros_like(sample)
    else:
        noise = step_noise(key, sample)
    renoised = b(schedule.sqrt_acp_prev) * denoised + b(schedule.sqrt_1macp_prev) * noise
    final = b(schedule.is_final)
    return final * denoised + (1.0 - final) * renoised
