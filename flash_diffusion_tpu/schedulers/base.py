"""Shared diffusion-schedule machinery, as pure functions over arrays.

TPU-native design: a scheduler is NOT a stateful object. ``set_timesteps``
builds an immutable :class:`Schedule` pytree of precomputed per-step
coefficient tables; ``step`` functions are pure, indexed by the *position*
``i`` in the timestep array (a traced value is fine), so an entire sampler or
teacher rollout lowers to a single ``lax.scan``/``fori_loop`` with static
shapes — no recompilation across steps and no host round-trips.

Numerical semantics re-derive the diffusers schedulers the reference drives
(reference: examples/train_flash_sdxl.py:221-236 resolves scheduler classes
from yaml; src/flash/models/flash/flash_diffusion_model.py:110-126 reads
``alphas_cumprod``/``sigmas`` off the teacher schedule).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_betas(
    num_train_timesteps: int = 1000,
    beta_schedule: str = "linear",
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
) -> np.ndarray:
    """Beta schedule table. Matches diffusers' ``betas_for_alpha_bar`` family."""
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    if beta_schedule == "scaled_linear":
        return (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
            ** 2
        )
    if beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

        ts = np.arange(num_train_timesteps, dtype=np.float64)
        betas = 1.0 - alpha_bar((ts + 1) / num_train_timesteps) / alpha_bar(
            ts / num_train_timesteps
        )
        return np.minimum(betas, 0.999)
    raise ValueError(f"Unknown beta_schedule {beta_schedule!r}")


def spaced_timesteps(
    num_train_timesteps: int,
    num_inference_steps: int,
    spacing: str = "trailing",
    steps_offset: int = 0,
) -> np.ndarray:
    """Inference timestep selection (descending). Matches diffusers semantics.

    ``trailing`` is the published Flash Diffusion setting
    (reference: README.md:342-352).
    """
    T = num_train_timesteps
    n = num_inference_steps
    if spacing == "linspace":
        return np.linspace(0, T - 1, n).round()[::-1].astype(np.int64)
    if spacing == "leading":
        step_ratio = T // n
        ts = (np.arange(0, n) * step_ratio).round()[::-1].astype(np.int64)
        return ts + steps_offset
    if spacing == "trailing":
        step_ratio = T / n
        ts = np.arange(T, 0, -step_ratio).round().astype(np.int64) - 1
        return ts
    raise ValueError(f"Unknown timestep spacing {spacing!r}")


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """Static scheduler hyperparameters (shared across families)."""

    num_train_timesteps: int = 1000
    beta_schedule: str = "scaled_linear"  # SD family default
    beta_start: float = 0.00085
    beta_end: float = 0.012
    prediction_type: str = "epsilon"  # epsilon | v_prediction | sample
    timestep_spacing: str = "trailing"
    steps_offset: int = 0
    clip_sample: bool = False
    clip_sample_range: float = 1.0
    # DPM-Solver specific
    solver_order: int = 2
    final_sigmas_type: str = "zero"  # zero | sigma_min
    lower_order_final: bool = True
    euler_at_final: bool = False
    # LCM specific
    timestep_scaling: float = 10.0
    sigma_data: float = 0.5
    original_inference_steps: int = 50  # LCM origin-grid density (diffusers)
    # FlowMatch specific
    shift: float = 3.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Schedule:
    """Immutable precomputed schedule (a pytree of arrays).

    ``timesteps`` has length ``num_inference_steps``; coefficient tables that
    index "one past the end" (``sigmas``, ``alphas_cumprod_prev``) have length
    ``num_inference_steps + 1``.
    """

    timesteps: jnp.ndarray  # [n] int32, descending
    alphas_cumprod: jnp.ndarray  # [T] full training table
    sigmas: jnp.ndarray  # [n+1] Karras-style sigma per step (+ terminal)
    init_noise_sigma: jnp.ndarray  # scalar
    num_inference_steps: int = dataclasses.field(metadata=dict(static=True))
    num_train_timesteps: int = dataclasses.field(metadata=dict(static=True))
    prediction_type: str = dataclasses.field(metadata=dict(static=True))


def training_tables(config: SchedulerConfig) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(alphas_cumprod, sqrt_acp, sqrt_one_minus_acp) over all T train steps."""
    betas = make_betas(
        config.num_train_timesteps,
        config.beta_schedule,
        config.beta_start,
        config.beta_end,
    )
    alphas_cumprod = np.cumprod(1.0 - betas)
    return alphas_cumprod, np.sqrt(alphas_cumprod), np.sqrt(1.0 - alphas_cumprod)


def add_noise(
    schedule: Schedule, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
) -> jnp.ndarray:
    """Forward noising q(x_t | x_0) for variance-preserving schedules.

    noisy = sqrt(acp[t]) * x0 + sqrt(1 - acp[t]) * noise. Broadcasts per-batch
    timesteps over trailing dims.
    """
    acp = schedule.alphas_cumprod[timesteps]
    extra = (1,) * (sample.ndim - acp.ndim)
    sqrt_acp = jnp.sqrt(acp).reshape(acp.shape + extra)
    sqrt_1macp = jnp.sqrt(1.0 - acp).reshape(acp.shape + extra)
    return sqrt_acp * sample + sqrt_1macp * noise.astype(sample.dtype)


def predicted_x0(
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    sqrt_acp_t: jnp.ndarray,
    sqrt_1macp_t: jnp.ndarray,
    prediction_type: str,
) -> jnp.ndarray:
    """x̂₀ from a model output under the given parameterization."""
    if prediction_type == "epsilon":
        return (sample - sqrt_1macp_t * model_output) / sqrt_acp_t
    if prediction_type == "v_prediction":
        return sqrt_acp_t * sample - sqrt_1macp_t * model_output
    if prediction_type == "sample":
        return model_output
    raise ValueError(f"Unknown prediction_type {prediction_type!r}")


def interp_sigma(timesteps: np.ndarray, sigmas_all: np.ndarray) -> np.ndarray:
    """diffusers-style linear interpolation of sigma at (possibly float) t."""
    T = len(sigmas_all)
    return np.interp(timesteps, np.arange(T), sigmas_all)


def get_index_from_timestep(schedule: Schedule, timestep: jnp.ndarray) -> jnp.ndarray:
    """Position of ``timestep`` in ``schedule.timesteps`` (first match)."""
    return jnp.argmax(schedule.timesteps == timestep)


def batch_broadcast(coeff: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Reshape a scalar/[B] coefficient to broadcast against ``like``."""
    coeff = jnp.asarray(coeff)
    extra = (1,) * (like.ndim - coeff.ndim)
    return coeff.reshape(coeff.shape + extra).astype(like.dtype)


def _is_key_batch(key: jax.Array) -> bool:
    """True when ``key`` is a batch of per-sample PRNG keys (typed [B] or
    raw uint32 [B, 2]) rather than one key."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return key.ndim >= 1
    return key.ndim >= 2


def step_noise(key: jax.Array, sample: jnp.ndarray) -> jnp.ndarray:
    """Per-step scheduler noise, slot-independent under key batching.

    A single key draws one ``sample``-shaped normal (the classic single-chain
    path). A batch of per-sample keys draws each sample's noise separately at
    ``sample.shape[1:]`` — so a sample's noise sequence depends ONLY on its
    own key, never on its batch slot or the (padded) batch size. The serving
    batcher's bit-determinism contract (serving.py) relies on this.
    """
    if _is_key_batch(key):
        return jax.vmap(
            lambda k: jax.random.normal(k, sample.shape[1:], sample.dtype)
        )(key)
    return jax.random.normal(key, sample.shape, sample.dtype)


def split_step_key(key: jax.Array):
    """``jax.random.split`` that also accepts a per-sample key batch."""
    if _is_key_batch(key):
        ks = jax.vmap(jax.random.split)(key)
        return ks[:, 0], ks[:, 1]
    return jax.random.split(key)
