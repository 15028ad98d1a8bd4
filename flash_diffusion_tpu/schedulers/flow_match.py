"""Flow-matching Euler schedulers for the SD3 (rectified flow) family.

``FlowMatchSchedule`` re-derives diffusers' FlowMatchEulerDiscreteScheduler
(SD3 teacher; shift=3.0): sigma(t) = t/T warped by
σ ← s·σ / (1 + (s-1)·σ), training noising ``σ·noise + (1-σ)·x`` and Euler
step ``x += (σ_next − σ)·v`` (reference:
src/flash/models/flash_sd3/flash_diffusion_model.py:259-271,947-958).

``flash_step`` is the student's few-step sampler, standing in for the
diffusers-fork's ``FlashFlowMatchEulerDiscreteScheduler``
(reference: examples/train_flash_sd3.py:9-12 — fork-only, code not in-repo):
the LCM-analog for rectified flow — predict x̂₀ = x − σ·v, then re-noise to
the next sigma with fresh noise (denoised output at the final step).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .base import Schedule, SchedulerConfig, batch_broadcast, step_noise


def _shift_sigma(sigma: np.ndarray, shift: float) -> np.ndarray:
    return shift * sigma / (1.0 + (shift - 1.0) * sigma)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FlowMatchSchedule(Schedule):
    """timesteps are float (σ·T); sigmas has length n+1 with terminal 0."""

    sigmas_train: jnp.ndarray = None  # [T] full shifted training sigma table
    timesteps_train: jnp.ndarray = None  # [T] σ·T per training step


def set_timesteps(
    config: SchedulerConfig,
    num_inference_steps: Optional[int] = None,
    timesteps: Optional[Sequence[float]] = None,
) -> FlowMatchSchedule:
    T = config.num_train_timesteps
    # full training table: t = T..1 (descending), σ = t/T, shifted
    t_train = np.linspace(1, T, T, dtype=np.float64)[::-1]
    sig_train = _shift_sigma(t_train / T, config.shift)

    if timesteps is None:
        # diffusers semantics: linspace over σ·T between the (already
        # shifted) σ_max·T and σ_min·T, then apply the shift warp AGAIN to
        # the linspace-derived sigmas (FlowMatchEulerDiscreteScheduler
        # .set_timesteps re-shifts: σ ← s·σ/(1+(s−1)·σ)), and recompute
        # the timestep grid from the re-shifted sigmas.
        ts_lin = np.linspace(sig_train[0] * T, sig_train[-1] * T, num_inference_steps)
        sigmas = _shift_sigma(ts_lin / T, config.shift)
        ts = sigmas * T
    else:
        # explicit grid (e.g. the student sampler reusing the teacher's
        # already-shifted timesteps): taken verbatim, no re-shift.
        ts = np.asarray(timesteps, np.float64)
        sigmas = ts / T
    sigmas = np.append(sigmas, 0.0)

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return FlowMatchSchedule(
        timesteps=f32(ts),
        alphas_cumprod=f32((1.0 - sig_train) ** 2),  # VP-analog, rarely used
        sigmas=f32(sigmas),
        init_noise_sigma=jnp.float32(1.0),
        num_inference_steps=len(ts),
        num_train_timesteps=T,
        prediction_type="flow",
        sigmas_train=f32(sig_train),
        timesteps_train=f32(sig_train * T),
    )


def scale_model_input(schedule: FlowMatchSchedule, sample: jnp.ndarray, i) -> jnp.ndarray:
    del schedule, i
    return sample


def get_sigmas(schedule: FlowMatchSchedule, timesteps: jnp.ndarray) -> jnp.ndarray:
    """σ for (possibly batched) training timesteps — nearest-match lookup.

    Mirrors the reference's ``get_sigmas`` index-matching
    (src/flash/models/flash_sd3/flash_diffusion_model.py:947-958).
    """
    idx = jnp.argmin(
        jnp.abs(schedule.timesteps_train[None, :] - jnp.atleast_1d(timesteps)[:, None]),
        axis=-1,
    )
    return schedule.sigmas_train[idx]


def add_noise(
    schedule: FlowMatchSchedule,
    sample: jnp.ndarray,
    noise: jnp.ndarray,
    sigma: jnp.ndarray,
) -> jnp.ndarray:
    """Rectified-flow interpolation σ·noise + (1−σ)·x."""
    sigma = batch_broadcast(sigma, sample)
    return sigma * noise.astype(sample.dtype) + (1.0 - sigma) * sample


def step(
    schedule: FlowMatchSchedule,
    model_output: jnp.ndarray,
    i: jnp.ndarray,
    sample: jnp.ndarray,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Plain flow-match Euler: x += (σ_{i+1} − σ_i)·v."""
    del key
    sigma = batch_broadcast(schedule.sigmas[i], sample)
    sigma_next = batch_broadcast(schedule.sigmas[i + 1], sample)
    return sample + (sigma_next - sigma) * model_output


def flash_step(
    schedule: FlowMatchSchedule,
    model_output: jnp.ndarray,
    i: jnp.ndarray,
    sample: jnp.ndarray,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Flash few-step sampler: denoise fully, re-noise to σ_{i+1}."""
    sigma = batch_broadcast(schedule.sigmas[i], sample)
    sigma_next = batch_broadcast(schedule.sigmas[i + 1], sample)
    x0 = sample - sigma * model_output
    if key is None:
        noise = jnp.zeros_like(sample)
    else:
        noise = step_noise(key, sample)
    return (1.0 - sigma_next) * x0 + sigma_next * noise
