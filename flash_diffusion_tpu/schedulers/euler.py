"""Euler discrete + Euler ancestral samplers (re-derivation of diffusers).

EulerDiscreteScheduler is the reference's SDXL teacher *sampling* scheduler;
EulerAncestralDiscreteScheduler appears in the SD1.5 example
(reference: examples/configs/flash_sdxl.yaml:36, examples/train_flash_sd.py).
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
    interp_sigma,
    spaced_timesteps,
    training_tables,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EulerSchedule(Schedule):
    """sigmas has length n+1 with terminal 0. Karras sigma parameterization."""

    sigma_up: jnp.ndarray = None  # [n] ancestral-only; zeros for plain Euler
    sigma_down: jnp.ndarray = None  # [n] ancestral-only
    ancestral: bool = dataclasses.field(default=False, metadata=dict(static=True))


def set_timesteps(
    config: SchedulerConfig, num_inference_steps: int, ancestral: bool = False
) -> EulerSchedule:
    acp, _, _ = training_tables(config)
    sigmas_all = np.sqrt((1.0 - acp) / acp)
    timesteps = spaced_timesteps(
        config.num_train_timesteps,
        num_inference_steps,
        config.timestep_spacing,
        config.steps_offset,
    ).astype(np.float64)
    sigmas = interp_sigma(timesteps, sigmas_all)
    sigmas = np.append(sigmas, 0.0)

    if config.timestep_spacing in ("linspace", "trailing"):
        init_noise_sigma = sigmas.max()
    else:
        init_noise_sigma = (sigmas.max() ** 2 + 1.0) ** 0.5

    # ancestral decomposition: sigma_up² + sigma_down² = sigma_next²
    s, s_next = sigmas[:-1], sigmas[1:]
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_up = np.where(
            s_next > 0,
            np.sqrt(np.clip(s_next**2 * (s**2 - s_next**2) / np.where(s > 0, s**2, 1.0), 0, None)),
            0.0,
        )
    sigma_down = np.sqrt(np.clip(s_next**2 - sigma_up**2, 0, None))

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return EulerSchedule(
        timesteps=jnp.asarray(np.round(timesteps), jnp.int32),
        alphas_cumprod=f32(acp),
        sigmas=f32(sigmas),
        init_noise_sigma=jnp.float32(init_noise_sigma),
        num_inference_steps=num_inference_steps,
        num_train_timesteps=config.num_train_timesteps,
        prediction_type=config.prediction_type,
        sigma_up=f32(sigma_up),
        sigma_down=f32(sigma_down),
        ancestral=ancestral,
    )


def scale_model_input(schedule: EulerSchedule, sample: jnp.ndarray, i) -> jnp.ndarray:
    sigma = batch_broadcast(schedule.sigmas[i], sample)
    return sample / jnp.sqrt(sigma**2 + 1.0)


def _pred_x0(schedule, model_output, sample, sigma):
    if schedule.prediction_type == "epsilon":
        return sample - sigma * model_output
    if schedule.prediction_type == "v_prediction":
        return model_output * (-sigma / jnp.sqrt(sigma**2 + 1.0)) + sample / (sigma**2 + 1.0)
    if schedule.prediction_type == "sample":
        return model_output
    raise ValueError(schedule.prediction_type)


def step(
    schedule: EulerSchedule,
    model_output: jnp.ndarray,
    i: jnp.ndarray,
    sample: jnp.ndarray,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """One Euler (or ancestral-Euler) step in sigma space.

    NOTE: ``sample`` is the *unscaled* latent; the model was fed
    ``scale_model_input(sample)``. s_churn=0 (diffusers default).
    """
    sigma = batch_broadcast(schedule.sigmas[i], sample)
    x0 = _pred_x0(schedule, model_output, sample, sigma)
    derivative = (sample - x0) / sigma
    if schedule.ancestral:
        sigma_down = batch_broadcast(schedule.sigma_down[i], sample)
        prev = sample + derivative * (sigma_down - sigma)
        if key is not None:
            sigma_up = batch_broadcast(schedule.sigma_up[i], sample)
            prev = prev + sigma_up * step_noise(key, sample)
        return prev
    sigma_next = batch_broadcast(schedule.sigmas[i + 1], sample)
    return sample + derivative * (sigma_next - sigma)
