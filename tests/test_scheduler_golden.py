"""Golden scheduler parity vs vendored diffusers-semantics ports.

Drives the repo's pure-function JAX schedulers and the stateful numpy ports
in tests/golden/diffusers_port.py through identical synthetic rollouts and
asserts trajectory agreement. This replaces self-referential regression
fixtures as the correctness anchor for the teacher rollout and the 4-NFE
sampler (reference semantics: examples/train_flash_sdxl.py:221-236,
README.md:342-352)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_diffusion_tpu.schedulers import (
    SchedulerConfig,
    ddpm,
    dpm,
    euler,
    flow_match,
    lcm,
)
from golden.diffusers_port import (
    GoldenDDPM,
    GoldenDPMSolverMultistep,
    GoldenEuler,
    GoldenFlowMatchEuler,
    GoldenLCM,
)

SD_CONFIG = SchedulerConfig()  # scaled_linear 0.00085->0.012, trailing
STEPS = [4, 8, 32]


def _sample():
    return np.linspace(-1.0, 1.0, 64).reshape(1, 4, 4, 4).astype(np.float64)


def _pred(x):
    """Deterministic fake denoiser shared by both implementations."""
    return 0.3 * x + 0.05


@pytest.mark.parametrize("n", STEPS)
@pytest.mark.parametrize("spacing", ["trailing", "leading", "linspace"])
def test_ddpm_trajectory_matches_diffusers(n, spacing):
    cfg = SchedulerConfig(timestep_spacing=spacing)
    sched = ddpm.set_timesteps(cfg, n)
    gold = GoldenDDPM(timestep_spacing=spacing)
    gold.set_timesteps(n)
    np.testing.assert_array_equal(np.array(sched.timesteps), gold.timesteps)

    s_j = jnp.asarray(_sample(), jnp.float32)
    s_g = _sample()
    for i in range(n):
        # deterministic: no posterior noise on either side
        s_j = ddpm.step(sched, _pred(s_j), jnp.int32(i), s_j, key=None)
        s_g = gold.step(_pred(s_g), gold.timesteps[i], s_g, noise=None)
        np.testing.assert_allclose(
            np.array(s_j), s_g, rtol=1e-4, atol=1e-4, err_msg=f"step {i}"
        )


@pytest.mark.parametrize("n", STEPS)
def test_ddpm_variance_matches_diffusers(n):
    sched = ddpm.set_timesteps(SD_CONFIG, n)
    gold = GoldenDDPM()
    gold.set_timesteps(n)
    ours = np.array(sched.sigma_noise)
    for i, t in enumerate(gold.timesteps):
        expect = gold._get_variance(int(t)) ** 0.5 if t > 0 else 0.0
        np.testing.assert_allclose(ours[i], expect, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("n", STEPS)
@pytest.mark.parametrize("ancestral", [False, True])
def test_euler_trajectory_matches_diffusers(n, ancestral):
    sched = euler.set_timesteps(SD_CONFIG, n, ancestral=ancestral)
    gold = GoldenEuler(ancestral=ancestral)
    gold.set_timesteps(n)
    np.testing.assert_allclose(
        np.array(sched.sigmas), gold.sigmas, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        float(sched.init_noise_sigma), gold.init_noise_sigma, rtol=1e-5
    )

    s_j = jnp.asarray(_sample(), jnp.float32) * sched.init_noise_sigma
    s_g = _sample() * gold.init_noise_sigma
    for i in range(n):
        inp_j = euler.scale_model_input(sched, s_j, i)
        inp_g = gold.scale_model_input(s_g)
        np.testing.assert_allclose(np.array(inp_j), inp_g, rtol=1e-4, atol=1e-5)
        s_j = euler.step(sched, _pred(inp_j), jnp.int32(i), s_j, key=None)
        s_g = gold.step(_pred(inp_g), s_g, noise=None)
        # latents scale with sigma (up to ~157): relative tolerance dominates
        np.testing.assert_allclose(
            np.array(s_j), s_g, rtol=2e-4, atol=2e-4, err_msg=f"step {i}"
        )


@pytest.mark.parametrize("n", STEPS)
def test_euler_ancestral_sigma_up_matches_diffusers(n):
    sched = euler.set_timesteps(SD_CONFIG, n, ancestral=True)
    gold = GoldenEuler(ancestral=True)
    gold.set_timesteps(n)
    for i in range(n):
        sf, st = gold.sigmas[i], gold.sigmas[i + 1]
        up = (st**2 * (sf**2 - st**2) / sf**2) ** 0.5 if st > 0 else 0.0
        down = (st**2 - up**2) ** 0.5
        np.testing.assert_allclose(float(sched.sigma_up[i]), up, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            float(sched.sigma_down[i]), down, rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("n", STEPS)
def test_dpm_trajectory_matches_diffusers(n):
    """DPM++2M incl. first-order warmup, midpoint D1, lower_order_final."""
    sched = dpm.set_timesteps(SD_CONFIG, n)
    gold = GoldenDPMSolverMultistep()
    gold.set_timesteps(n)
    np.testing.assert_array_equal(np.array(sched.timesteps), gold.timesteps)
    np.testing.assert_allclose(np.array(sched.sigmas), gold.sigmas, rtol=1e-5, atol=1e-6)

    s_j = jnp.asarray(_sample(), jnp.float32)
    s_g = _sample()
    carry = dpm.init_state(s_j)
    for i in range(n):
        s_j, carry = dpm.step(sched, _pred(s_j), jnp.int32(i), s_j, carry)
        s_g = gold.step(_pred(s_g), s_g)
        np.testing.assert_allclose(
            np.array(s_j), s_g, rtol=1e-4, atol=1e-4, err_msg=f"step {i}"
        )


@pytest.mark.parametrize("n", [4, 8])
def test_lcm_default_grid_and_trajectory_match_diffusers(n):
    sched = lcm.set_timesteps(SD_CONFIG, n)
    gold = GoldenLCM()
    gold.set_timesteps(n)
    np.testing.assert_array_equal(np.array(sched.timesteps), gold.timesteps)
    if n == 4:
        # the published 4-NFE grid (reference README.md:342-352)
        np.testing.assert_array_equal(gold.timesteps, [999, 759, 499, 259])

    s_j = jnp.asarray(_sample(), jnp.float32)
    s_g = _sample()
    for i in range(n):
        s_j = lcm.step(sched, _pred(s_j), jnp.int32(i), s_j, key=None)
        s_g = gold.step(_pred(s_g), gold.timesteps[i], s_g, noise=None)
        np.testing.assert_allclose(
            np.array(s_j), s_g, rtol=1e-4, atol=1e-4, err_msg=f"step {i}"
        )


@pytest.mark.parametrize("n", [4, 8])
def test_lcm_custom_timesteps_match_diffusers(n):
    """Training-time path: student sampler reuses the teacher grid
    (reference src/flash/models/flash/flash_diffusion_model.py:781-789)."""
    teacher_ts = np.arange(1000, 0, -(1000 / n)).round().astype(np.int64) - 1
    sched = lcm.set_timesteps(SD_CONFIG, timesteps=teacher_ts)
    gold = GoldenLCM()
    gold.set_timesteps(timesteps=teacher_ts)
    s_j = jnp.asarray(_sample(), jnp.float32)
    s_g = _sample()
    for i in range(n):
        s_j = lcm.step(sched, _pred(s_j), jnp.int32(i), s_j, key=None)
        s_g = gold.step(_pred(s_g), gold.timesteps[i], s_g, noise=None)
        np.testing.assert_allclose(np.array(s_j), s_g, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n", STEPS)
def test_flow_match_sigma_grid_and_trajectory_match_diffusers(n):
    """SD3: the shift warp is applied AGAIN to the linspace-derived sigmas
    (sigma_mid ≈ 0.75 at shift=3, not 0.50)."""
    cfg = SchedulerConfig(shift=3.0)
    sched = flow_match.set_timesteps(cfg, n)
    gold = GoldenFlowMatchEuler(shift=3.0)
    gold.set_timesteps(n)
    np.testing.assert_allclose(np.array(sched.sigmas), gold.sigmas, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.array(sched.timesteps), gold.timesteps, rtol=1e-5, atol=1e-3
    )
    if n == 8:
        # re-shifted interior: raw linspace σ would be ≈0.43 here
        assert 0.65 < float(sched.sigmas[4]) < 0.75

    s_j = jnp.asarray(_sample(), jnp.float32)
    s_g = _sample()
    for i in range(n):
        s_j = flow_match.step(sched, _pred(s_j), jnp.int32(i), s_j)
        s_g = gold.step(_pred(s_g), s_g)
        np.testing.assert_allclose(
            np.array(s_j), s_g, rtol=1e-4, atol=1e-5, err_msg=f"step {i}"
        )


def test_flow_match_add_noise_matches_scale_noise():
    cfg = SchedulerConfig(shift=3.0)
    sched = flow_match.set_timesteps(cfg, 8)
    gold = GoldenFlowMatchEuler(shift=3.0)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 4, 4)
    noise = rng.randn(2, 4, 4, 4)
    sigma = np.array([0.3, 0.8])
    ours = flow_match.add_noise(
        sched, jnp.asarray(x, jnp.float32), jnp.asarray(noise, jnp.float32), jnp.asarray(sigma, jnp.float32)
    )
    theirs = gold.scale_noise(x, sigma[:, None, None, None], noise)
    np.testing.assert_allclose(np.array(ours), theirs, rtol=1e-5, atol=1e-6)
