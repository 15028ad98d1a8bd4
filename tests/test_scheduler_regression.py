"""Scheduler trajectory regression fixtures.

Frozen probe values from a deterministic synthetic rollout (8 steps,
pred = 0.3·scaled_input + 0.05, PRNGKey(0) noise). Guards every scheduler's
numerics across refactors — the closed-form tests check the math, this
checks that NOTHING drifts. Regenerate only for intentional semantic
changes (see git history of this file). Correctness (not just stability) is
anchored separately by tests/test_scheduler_golden.py against the vendored
diffusers-semantics ports.
"""

import jax
import jax.numpy as jnp
import numpy as np

from flash_diffusion_tpu.schedulers import REGISTRY, SchedulerConfig, dpm

EXPECTED = {
    "DDPMScheduler": [-14.548227, -3.17092, -1.41051, -4.830768, 3.747177],
    "DPMSolverMultistepScheduler": [-5.853078, -3.592523, -1.331967, 0.928588, 3.189144],
    "EulerDiscreteScheduler": [-6.418722, -3.941316, -1.463911, 1.013495, 3.490901],
    "EulerAncestralDiscreteScheduler": [-14.539723, -3.165925, -1.409025, -4.832793, 3.741641],
    "LCMScheduler": [-9.432272, -1.406976, -1.633408, -4.045339, 1.891783],
    "FlowMatchEulerDiscreteScheduler": [-0.778221, -0.475356, -0.172491, 0.130374, 0.433238],
    "FlashFlowMatchEulerDiscreteScheduler": [-0.713118, -0.020394, -0.810193, -0.946371, -0.087894],
}


def test_all_scheduler_trajectories_frozen():
    for name, mod in REGISTRY.items():
        cfg = SchedulerConfig(shift=3.0) if "FlowMatch" in name else SchedulerConfig()
        sched = mod.set_timesteps(cfg, 8)
        sample = jnp.asarray(np.linspace(-1, 1, 64).reshape(1, 4, 4, 4), jnp.float32)
        carry = dpm.init_state(sample)
        key = jax.random.PRNGKey(0)
        s = sample * sched.init_noise_sigma
        for i in range(8):
            inp = mod.scale_model_input(sched, s, i)
            pred = 0.3 * inp + 0.05
            key, sub = jax.random.split(key)
            if name == "DPMSolverMultistepScheduler":
                s, carry = dpm.step(sched, pred, i, s, carry)
            else:
                s = mod.step(sched, pred, i, s, key=sub)
        probes = np.array(s).ravel()[::13]
        np.testing.assert_allclose(
            probes, EXPECTED[name], rtol=1e-4, atol=1e-5, err_msg=name
        )
