"""FlashFlowMatch sampler semantics, pinned as properties + goldens.

The reference imports FlashFlowMatchEulerDiscreteScheduler from a PRIVATE
diffusers fork (reference: examples/train_flash_sd3.py:9-12) whose code is
not in-repo, so trajectory parity is unverifiable by construction. This
file pins the repo's documented re-derivation (PARITY.md) so edits can't
silently drift:

- grid invariants of ``set_timesteps`` (shifted linspace, re-shift warp,
  terminal zero, verbatim explicit timesteps — the trailing-analog grid);
- the Möbius sigma-shift warp (fixed points, inverse under 1/s);
- LCM-analog boundary behavior of ``flash_step`` (final step returns the
  denoised x̂₀ regardless of the noise key; exact velocity recovers x₀ at
  every σ);
- a frozen 4-step (the published NFE budget) trajectory golden with the
  SD3 shift, deterministic and keyed.
"""

import jax
import jax.numpy as jnp
import numpy as np

from flash_diffusion_tpu.schedulers import SchedulerConfig, flow_match
from flash_diffusion_tpu.schedulers.flow_match import _shift_sigma


def test_set_timesteps_grid_invariants():
    cfg = SchedulerConfig(shift=3.0)
    for n in (1, 2, 4, 8, 28):
        sched = flow_match.set_timesteps(cfg, n)
        sig = np.asarray(sched.sigmas, np.float64)
        ts = np.asarray(sched.timesteps, np.float64)
        assert sig.shape == (n + 1,) and ts.shape == (n,)
        # strictly descending with terminal zero (the Euler step direction)
        assert np.all(np.diff(sig) < 0) and sig[-1] == 0.0
        # grid starts at the re-shifted sigma_max: shift applied to the full
        # training table, then AGAIN to the linspace-derived sigmas
        T = cfg.num_train_timesteps
        smax = _shift_sigma(np.float64(1.0), cfg.shift)
        np.testing.assert_allclose(sig[0], _shift_sigma(smax, cfg.shift), rtol=1e-6)
        # timesteps are sigma*T of the re-shifted grid
        np.testing.assert_allclose(ts, sig[:-1] * T, rtol=1e-6)


def test_explicit_timesteps_taken_verbatim_no_reshift():
    """The student sampler reuses the teacher's ALREADY-shifted timesteps;
    an explicit grid must not be warped again."""
    cfg = SchedulerConfig(shift=3.0)
    teacher = flow_match.set_timesteps(cfg, 4)
    ts = np.asarray(teacher.timesteps, np.float64)
    student = flow_match.set_timesteps(cfg, timesteps=ts)
    np.testing.assert_allclose(np.asarray(student.timesteps), ts, rtol=1e-7)
    np.testing.assert_allclose(
        np.asarray(student.sigmas[:-1]), ts / cfg.num_train_timesteps, rtol=1e-7
    )
    assert float(student.sigmas[-1]) == 0.0


def test_sigma_shift_warp_properties():
    sig = np.linspace(0.0, 1.0, 101)
    for s in (1.0, 3.0, 6.0):
        w = _shift_sigma(sig, s)
        # fixed points at 0 and 1; monotone; identity at s=1
        assert w[0] == 0.0 and abs(w[-1] - 1.0) < 1e-12
        assert np.all(np.diff(w) > 0)
        if s == 1.0:
            np.testing.assert_allclose(w, sig, atol=1e-12)
        # Möbius inverse: warping by 1/s undoes the warp
        np.testing.assert_allclose(_shift_sigma(w, 1.0 / s), sig, atol=1e-12)


def test_flash_step_final_boundary_is_denoised_output():
    """σ_next = 0 at the last index ⇒ flash_step returns x̂₀ = x − σ·v
    exactly, with or without a noise key (the LCM-analog boundary)."""
    cfg = SchedulerConfig(shift=3.0)
    sched = flow_match.set_timesteps(cfg, 4)
    x = jnp.asarray(np.linspace(-1, 1, 32).reshape(1, 2, 4, 4), jnp.float32)
    v = 0.7 * x - 0.2
    i = jnp.int32(3)  # last of 4
    x0 = x - sched.sigmas[3] * v
    out_nokey = flow_match.flash_step(sched, v, i, x)
    out_keyed = flow_match.flash_step(sched, v, i, x, key=jax.random.PRNGKey(9))
    np.testing.assert_allclose(np.asarray(out_nokey), np.asarray(x0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_keyed), np.asarray(x0), rtol=1e-6)


def test_flash_step_exact_velocity_recovers_x0_at_every_sigma():
    """On the rectified-flow line x_σ = (1−σ)x₀ + σn the true velocity is
    v = n − x₀; x̂₀ = x_σ − σ·v must equal x₀ at every grid σ, so the
    keyless flash step lands exactly on (1−σ_next)·x₀."""
    cfg = SchedulerConfig(shift=3.0)
    sched = flow_match.set_timesteps(cfg, 4)
    k0, k1 = jax.random.split(jax.random.PRNGKey(3))
    x0 = jax.random.normal(k0, (2, 4, 4, 4), jnp.float32)
    n = jax.random.normal(k1, x0.shape, jnp.float32)
    for i in range(4):
        sig = sched.sigmas[i]
        x_sig = (1.0 - sig) * x0 + sig * n
        out = flow_match.flash_step(sched, n - x0, jnp.int32(i), x_sig)
        want = (1.0 - sched.sigmas[i + 1]) * x0
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-6)


# Frozen 4-step probe values (PRNGKey(0) chain; pred = 0.3·x + 0.05).
# Regenerate ONLY for an intentional semantic change to flash_step or
# set_timesteps — then document the change in PARITY.md.
GOLDEN_4STEP_DETERMINISTIC = [-0.069563, -0.059725, -0.049888, -0.04005, -0.030212]
GOLDEN_4STEP_KEYED = [-1.196452, -0.202436, -0.319545, -0.673491, -0.097229]


def _rollout(keyed: bool):
    cfg = SchedulerConfig(shift=3.0)
    sched = flow_match.set_timesteps(cfg, 4)
    s = jnp.asarray(np.linspace(-1, 1, 64).reshape(1, 4, 4, 4), jnp.float32)
    s = s * sched.init_noise_sigma
    key = jax.random.PRNGKey(0)
    for i in range(4):
        pred = 0.3 * flow_match.scale_model_input(sched, s, i) + 0.05
        key, sub = jax.random.split(key)
        s = flow_match.flash_step(sched, pred, jnp.int32(i), s, key=sub if keyed else None)
    return np.asarray(s).ravel()[::13]


def test_flash_flow_4step_trajectory_golden():
    np.testing.assert_allclose(
        _rollout(False), GOLDEN_4STEP_DETERMINISTIC, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(_rollout(True), GOLDEN_4STEP_KEYED, rtol=1e-4, atol=1e-5)
