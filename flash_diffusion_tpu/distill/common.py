"""Shared distillation machinery: stage schedule, timestep distribution,
boundary scalings, x̂₀ prediction.

Re-derivations of reference helpers
(src/flash/models/flash/flash_diffusion_model.py:23-35,135-177,710-752).
Stage-dependent probability tables are computed host-side ONCE per stage
(numpy) — the reference rebuilds the mixture pdf every training step
(:146-165); under jit the pdf is a constant folded into the step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_mixture_pdf(
    k: int,
    num_components: int,
    var: float,
    mode_probs: Optional[Sequence[float]] = None,
) -> np.ndarray:
    """Mixture-of-Gaussians pdf over K teacher-step indices.

    Component means sit at ``i · (K // num_components)`` (reference
    :150-154); probabilities are evaluated at integer positions and
    normalized. Matches ``gaussian_mixture`` + ``_get_timesteps`` "mixture".
    """
    if mode_probs is None:
        mode_probs = [1.0 / num_components] * num_components
    locs = [i * (k // num_components) for i in range(num_components)]
    xs = np.arange(k, dtype=np.float64)
    pdf = np.zeros(k, dtype=np.float64)
    for p, loc in zip(mode_probs, locs):
        pdf += p * np.exp(-((xs - loc) ** 2) / var)
    return pdf / pdf.sum()


def timestep_pdf(
    distribution: str,
    k: int,
    num_components: int = 4,
    var: float = 0.5,
    mode_probs: Optional[Sequence[float]] = None,
) -> np.ndarray:
    """Start-index pdf over the K-step teacher schedule (reference :141-165)."""
    if distribution == "uniform":
        return np.full(k, 1.0 / k)
    if distribution == "gaussian":
        xs = np.arange(k, dtype=np.float64)
        pdf = np.exp(-((xs - k / 2) ** 2) / k)
        return pdf / pdf.sum()
    if distribution == "mixture":
        return gaussian_mixture_pdf(k, num_components, var, mode_probs)
    raise ValueError(f"Unknown timestep_distribution {distribution!r}")


def sample_start_index(rng: jax.Array, pdf: np.ndarray) -> jnp.ndarray:
    """One categorical draw shared by the whole batch (reference draws a
    single multinomial start_idx per step, :167)."""
    return jax.random.categorical(rng, jnp.log(jnp.asarray(pdf, jnp.float32) + 1e-20))


def stage_index(iter_step: int, num_iterations_per_k: Sequence[int]) -> int:
    """Which stage a (1-based) iteration belongs to (reference :221-224)."""
    cum = np.cumsum(num_iterations_per_k)
    if iter_step >= cum[-1]:
        # >= so the exactly-final iteration stays in the last stage instead
        # of wrapping to 0 (all iter_step<cum False → argmax 0), which with
        # switch_teacher=True would spuriously swap the teacher on the very
        # last step.
        return len(cum) - 1
    return int(np.argmax(iter_step < cum))


def boundary_scalings(timestep: jnp.ndarray, sigma_data: float = 0.5, timestep_scaling: float = 10.0):
    """LCM boundary conditions c_skip/c_out (reference :710-716 writes
    ``timestep / 0.1`` ≡ scaling 10)."""
    scaled = timestep.astype(jnp.float32) * timestep_scaling
    c_skip = sigma_data**2 / (scaled**2 + sigma_data**2)
    c_out = scaled / jnp.sqrt(scaled**2 + sigma_data**2)
    return c_skip, c_out


def predicted_x0_eps(
    model_output: jnp.ndarray,
    timesteps: jnp.ndarray,
    sample: jnp.ndarray,
    sqrt_acp: jnp.ndarray,
    sqrt_1macp: jnp.ndarray,
    input_sample: jnp.ndarray,
) -> jnp.ndarray:
    """ε-parameterized x̂₀ with the reference's zero-alpha guard
    (:718-752: where alpha == 0 the prediction falls back to the clean
    input sample). Timesteps index the full training tables."""
    a = sqrt_acp[timesteps].reshape(-1, *([1] * (sample.ndim - 1)))
    s = sqrt_1macp[timesteps].reshape(-1, *([1] * (sample.ndim - 1)))
    safe_a = jnp.where(a > 0, a, 1.0)
    x0 = (sample - s * model_output) / safe_a
    return jnp.where(a > 0, x0, input_sample)
