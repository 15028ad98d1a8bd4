"""Scheduler trajectory regression fixtures.

Frozen probe values from a deterministic synthetic rollout (8 steps,
pred = 0.3·scaled_input + 0.05, PRNGKey(0) noise). Guards every scheduler's
numerics across refactors — the closed-form tests check the math, this
checks that NOTHING drifts. Regenerate only for intentional semantic
changes (see git history of this file).
"""

import jax
import jax.numpy as jnp
import numpy as np

from flash_diffusion_tpu.schedulers import REGISTRY, SchedulerConfig, dpm

EXPECTED = {
    "DDPMScheduler": [-14.548204, -3.170945, -1.410534, -4.830739, 3.747171],
    "DPMSolverMultistepScheduler": [-0.81115, -0.540041, -0.268933, 0.002175, 0.273284],
    "EulerDiscreteScheduler": [-6.418721, -3.941317, -1.463911, 1.013495, 3.490901],
    "EulerAncestralDiscreteScheduler": [-14.539705, -3.165949, -1.409049, -4.832766, 3.741636],
    "LCMScheduler": [-9.395864, -1.479241, -1.641893, -4.012811, 1.912493],
    "FlowMatchEulerDiscreteScheduler": [-0.779967, -0.476237, -0.172508, 0.131222, 0.434952],
    "FlashFlowMatchEulerDiscreteScheduler": [-1.017605, -0.049789, -0.51196, -0.58619, 0.0927],
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
