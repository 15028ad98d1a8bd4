"""Scheduler numerics: closed-form identities, invariants, and jit/scan use.

The reference validates schedulers implicitly through diffusers; here (no
diffusers in the image) we verify against the defining math of each sampler:
DDPM posterior coefficients, Euler sigma-space ODE steps, DPM-Solver++ 2M
update formulas, LCM consistency re-noising, and flow-match interpolation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_diffusion_tpu.schedulers import (
    REGISTRY,
    SchedulerConfig,
    add_noise,
    ddpm,
    dpm,
    euler,
    flow_match,
    lcm,
    spaced_timesteps,
    training_tables,
)

SD_CONFIG = SchedulerConfig()  # scaled_linear 0.00085..0.012, trailing


def test_spaced_timesteps_trailing_matches_diffusers_formula():
    # 1000 train steps, 4 inference steps, trailing: [999, 749, 499, 249]
    ts = spaced_timesteps(1000, 4, "trailing")
    assert ts.tolist() == [999, 749, 499, 249]
    ts = spaced_timesteps(1000, 50, "leading", steps_offset=1)
    assert ts[0] == 981 and ts[-1] == 1
    ts = spaced_timesteps(1000, 4, "linspace")
    assert ts.tolist() == [999, 666, 333, 0]


def test_training_tables_sd15_endpoints():
    acp, sqrt_acp, sqrt_1macp = training_tables(SD_CONFIG)
    # alpha_0 = 1 - 0.00085
    assert np.isclose(acp[0], 1 - 0.00085)
    # SD1.5 known terminal alphas_cumprod ~ 0.0047 (not zero-terminal-SNR)
    assert 0.003 < acp[-1] < 0.006
    assert np.allclose(sqrt_acp**2 + sqrt_1macp**2, 1.0, atol=1e-6)


def test_add_noise_matches_closed_form():
    sched = ddpm.set_timesteps(SD_CONFIG, 4)
    x = jnp.ones((2, 4, 8, 8))
    noise = jnp.full_like(x, 0.5)
    t = jnp.array([999, 0])
    noisy = add_noise(sched, x, noise, t)
    acp = np.cumprod(1 - np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2)
    for b, ti in enumerate([999, 0]):
        expect = np.sqrt(acp[ti]) * 1.0 + np.sqrt(1 - acp[ti]) * 0.5
        assert np.allclose(noisy[b], expect, atol=1e-5)


def test_ddpm_step_posterior_mean_closed_form():
    n = 10
    sched = ddpm.set_timesteps(SD_CONFIG, n)
    key = jax.random.PRNGKey(0)
    sample = jax.random.normal(key, (1, 4, 8, 8))
    eps = jax.random.normal(jax.random.PRNGKey(1), sample.shape)
    i = 3
    out = ddpm.step(sched, eps, jnp.int32(i), sample, key=None)

    acp, _, _ = training_tables(SD_CONFIG)
    t = int(sched.timesteps[i])
    prev_t = t - 1000 // n
    a_t, a_prev = acp[t], acp[prev_t] if prev_t >= 0 else 1.0
    b_t, b_prev = 1 - a_t, 1 - a_prev
    cur_a = a_t / a_prev
    x0 = (np.array(sample) - np.sqrt(b_t) * np.array(eps)) / np.sqrt(a_t)
    expect = (np.sqrt(a_prev) * (1 - cur_a) / b_t) * x0 + (
        np.sqrt(cur_a) * b_prev / b_t
    ) * np.array(sample)
    assert np.allclose(np.array(out), expect, atol=1e-4)


def test_ddpm_full_denoise_recovers_x0_statistics():
    """Rollout from pure noise with the true eps should contract toward x0."""
    n = 20
    sched = ddpm.set_timesteps(SD_CONFIG, n)
    x0 = jnp.zeros((1, 4, 8, 8))
    noise = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    sample = add_noise(sched, x0, noise, sched.timesteps[0][None])

    def body(i, carry):
        sample, key = carry
        key, sub = jax.random.split(key)
        # oracle epsilon: exact noise component of the current sample
        acp = sched.alphas_cumprod[sched.timesteps[i]]
        eps = (sample - jnp.sqrt(acp) * x0) / jnp.sqrt(1 - acp)
        return ddpm.step(sched, eps, i, sample, key=sub), key

    sample, _ = jax.lax.fori_loop(0, n, body, (sample, jax.random.PRNGKey(1)))
    assert float(jnp.abs(sample).mean()) < 0.05


def test_euler_step_ode_formula():
    sched = euler.set_timesteps(SD_CONFIG, 8)
    assert float(sched.init_noise_sigma) == pytest.approx(float(sched.sigmas[0]), rel=1e-5)
    sample = jnp.ones((1, 4, 4, 4)) * 2.0
    eps = jnp.ones_like(sample) * 0.3
    out = euler.step(sched, eps, jnp.int32(2), sample)
    s, s_next = float(sched.sigmas[2]), float(sched.sigmas[3])
    # derivative for epsilon pred == eps
    assert np.allclose(np.array(out), 2.0 + 0.3 * (s_next - s), atol=1e-5)
    scaled = euler.scale_model_input(sched, sample, jnp.int32(2))
    assert np.allclose(np.array(scaled), 2.0 / np.sqrt(s**2 + 1), atol=1e-5)


def test_euler_ancestral_sigma_decomposition():
    sched = euler.set_timesteps(SD_CONFIG, 8, ancestral=True)
    up, down, s_next = (
        np.array(sched.sigma_up),
        np.array(sched.sigma_down),
        np.array(sched.sigmas[1:]),
    )
    assert np.allclose(up**2 + down**2, s_next**2, atol=1e-4)


def test_dpm_first_and_final_steps():
    n = 4
    sched = dpm.set_timesteps(SD_CONFIG, n)
    sample = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8))
    eps = jax.random.normal(jax.random.PRNGKey(1), sample.shape)

    # first step == first order closed form
    out, (x0, _) = dpm.step(sched, eps, jnp.int32(0), sample, dpm.init_state(sample))
    a0, s0 = float(sched.alpha_t[0]), float(sched.sigma_t[0])
    x0_expect = (np.array(sample) - s0 * np.array(eps)) / a0
    assert np.allclose(np.array(x0), x0_expect, atol=1e-4)
    lam = np.array(sched.lambda_t)
    sig = np.array(sched.sigma_t)  # VP sigmas (diffusers converts before the update)
    h = lam[1] - lam[0]
    expect = (sig[1] / sig[0]) * np.array(sample) - float(sched.alpha_t[1]) * (
        np.exp(-h) - 1
    ) * x0_expect
    assert np.allclose(np.array(out), expect, atol=1e-3)

    # final step (terminal sigma 0) returns x̂₀ exactly (first-order limit)
    out_f, _ = dpm.step(
        sched, eps, jnp.int32(n - 1), sample, (x0, jnp.ones((), jnp.bool_))
    )
    af, sf = float(sched.alpha_t[n - 1]), float(sched.sigma_t[n - 1])
    x0_f = (np.array(sample) - sf * np.array(eps)) / af
    assert np.allclose(np.array(out_f), x0_f, atol=1e-3)


def test_dpm_second_order_midpoint_formula():
    n = 8
    sched = dpm.set_timesteps(SD_CONFIG, n)
    sample = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8, 8))
    eps = jax.random.normal(jax.random.PRNGKey(3), sample.shape)
    prev_x0 = jax.random.normal(jax.random.PRNGKey(4), sample.shape)
    i = 3
    out, (new_x0, _) = dpm.step(
        sched, eps, jnp.int32(i), sample, (prev_x0, jnp.ones((), jnp.bool_))
    )
    lam, sig, alpha = (np.array(sched.lambda_t), np.array(sched.sigma_t), np.array(sched.alpha_t))
    a_i, s_i = float(sched.alpha_t[i]), float(sched.sigma_t[i])
    m0 = (np.array(sample) - s_i * np.array(eps)) / a_i
    h = lam[i + 1] - lam[i]
    h0 = lam[i] - lam[i - 1]
    r0 = h0 / h
    d1 = (m0 - np.array(prev_x0)) / r0
    expect = (
        (sig[i + 1] / sig[i]) * np.array(sample)
        - alpha[i + 1] * (np.exp(-h) - 1) * m0
        - 0.5 * alpha[i + 1] * (np.exp(-h) - 1) * d1
    )
    assert np.allclose(np.array(out), expect, atol=1e-3)
    assert np.allclose(np.array(new_x0), m0, atol=1e-4)


def test_dpm_fresh_carry_is_first_order_at_any_start_idx():
    """A rollout entering at start_idx>0 with a fresh carry must take a
    first-order step (diffusers resets lower_order_nums=0 every rollout);
    the zero-initialized prev_x0 must never leak into a D1 correction."""
    n = 8
    sched = dpm.set_timesteps(SD_CONFIG, n)
    sample = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 8, 8))
    eps = jax.random.normal(jax.random.PRNGKey(6), sample.shape)
    i = 3
    out, (new_x0, has_hist) = dpm.step(sched, eps, jnp.int32(i), sample, dpm.init_state(sample))
    lam, sig, alpha = (np.array(sched.lambda_t), np.array(sched.sigma_t), np.array(sched.alpha_t))
    a_i, s_i = float(sched.alpha_t[i]), float(sched.sigma_t[i])
    x0 = (np.array(sample) - s_i * np.array(eps)) / a_i
    h = lam[i + 1] - lam[i]
    first = (sig[i + 1] / sig[i]) * np.array(sample) - alpha[i + 1] * (np.exp(-h) - 1) * x0
    assert np.allclose(np.array(out), first, atol=1e-3)
    assert bool(has_hist)
    # ...and the SECOND executed step uses second order against real history
    out2, _ = dpm.step(sched, eps, jnp.int32(i + 1), sample, (new_x0, has_hist))
    first2_a, first2_s = float(sched.alpha_t[i + 1]), float(sched.sigma_t[i + 1])
    x0_2 = (np.array(sample) - first2_s * np.array(eps)) / first2_a
    h2 = lam[i + 2] - lam[i + 1]
    first2 = (sig[i + 2] / sig[i + 1]) * np.array(sample) - alpha[i + 2] * (np.exp(-h2) - 1) * x0_2
    assert not np.allclose(np.array(out2), first2, atol=1e-3)


def test_lcm_boundary_scalings_match_reference_formula():
    # reference writes timestep/0.1 — i.e. x10 scaling, sigma_data=0.5
    c_skip, c_out = lcm.boundary_scalings(np.array([0, 250, 999]))
    t = np.array([0, 250, 999]) / 0.1
    assert np.allclose(c_skip, 0.25 / (t**2 + 0.25))
    assert np.allclose(c_out, t / np.sqrt(t**2 + 0.25))
    assert c_skip[0] == 1.0 and c_out[0] == 0.0  # exact consistency boundary


def test_lcm_step_renoise_and_final():
    cfg = SD_CONFIG
    sched = lcm.set_timesteps(cfg, timesteps=[999, 749, 499, 249])
    sample = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
    eps = jax.random.normal(jax.random.PRNGKey(1), sample.shape)
    key = jax.random.PRNGKey(2)

    out = lcm.step(sched, eps, jnp.int32(0), sample, key=key)
    acp, sqrt_acp, sqrt_1macp = training_tables(cfg)
    x0 = (np.array(sample) - sqrt_1macp[999] * np.array(eps)) / sqrt_acp[999]
    c_skip, c_out = lcm.boundary_scalings(np.array([999]))
    denoised = c_out[0] * x0 + c_skip[0] * np.array(sample)
    noise = np.array(jax.random.normal(key, sample.shape))
    expect = sqrt_acp[749] * denoised + sqrt_1macp[749] * noise
    assert np.allclose(np.array(out), expect, atol=1e-4)

    # final position: returns denoised (no renoise even with a key)
    out_f = lcm.step(sched, eps, jnp.int32(3), sample, key=key)
    x0f = (np.array(sample) - sqrt_1macp[249] * np.array(eps)) / sqrt_acp[249]
    c_skip_f, c_out_f = lcm.boundary_scalings(np.array([249]))
    assert np.allclose(np.array(out_f), c_out_f[0] * x0f + c_skip_f[0] * np.array(sample), atol=1e-4)


def test_flow_match_sigma_shift_and_step():
    cfg = SchedulerConfig(shift=3.0)
    sched = flow_match.set_timesteps(cfg, 4)
    # shifted sigma at t=T: 3*1/(1+2*1)=1.0
    assert float(sched.sigmas[0]) == pytest.approx(1.0, abs=1e-6)
    sample = jnp.ones((1, 4, 4, 4))
    v = jnp.full_like(sample, 2.0)
    out = flow_match.step(sched, v, jnp.int32(0), sample)
    ds = float(sched.sigmas[1] - sched.sigmas[0])
    assert np.allclose(np.array(out), 1.0 + 2.0 * ds, atol=1e-5)

    # add_noise interpolation + exact inversion by flash_step at final pos
    x = jnp.full((1, 4, 4, 4), 3.0)
    noise = jnp.full_like(x, -1.0)
    sig = jnp.float32(0.25)
    noisy = flow_match.add_noise(sched, x, noise, sig)
    assert np.allclose(np.array(noisy), 0.25 * -1.0 + 0.75 * 3.0, atol=1e-6)
    # true velocity is noise - x; x̂₀ = noisy - σ·v recovers x
    v_true = noise - x
    x0 = np.array(noisy) - 0.25 * np.array(v_true)
    assert np.allclose(x0, 3.0, atol=1e-6)


def test_flow_match_get_sigmas_lookup():
    cfg = SchedulerConfig(shift=3.0)
    sched = flow_match.set_timesteps(cfg, 8)
    ts = sched.timesteps_train[jnp.array([0, 500, 999])]
    sig = flow_match.get_sigmas(sched, ts)
    assert np.allclose(np.array(sig), np.array(sched.sigmas_train)[[0, 500, 999]], atol=1e-6)


def test_registry_complete_and_jit_scan_compatible():
    """Every registry entry runs inside one jitted lax.scan sampler."""
    for name, mod in REGISTRY.items():
        if "FlowMatch" in name:
            sched = mod.set_timesteps(SchedulerConfig(shift=3.0), 4)
        else:
            sched = mod.set_timesteps(SD_CONFIG, 4)
        sample = jnp.ones((1, 4, 8, 8))
        is_dpm = name == "DPMSolverMultistepScheduler"

        @jax.jit
        def run(sample, sched=sched, mod=mod, is_dpm=is_dpm):
            def body(carry, i):
                s, aux = carry
                inp = mod.scale_model_input(sched, s, i)
                out = inp * 0.1  # fake model
                if is_dpm:
                    s, aux = dpm.step(sched, out, i, s, aux)
                else:
                    s = mod.step(sched, out, i, s, key=None)
                return (s, aux), None

            init = (sample, dpm.init_state(sample))
            (s, _), _ = jax.lax.scan(body, init, jnp.arange(4))
            return s

        out = run(sample)
        assert out.shape == sample.shape
        assert np.all(np.isfinite(np.array(out))), name


def test_step_noise_per_sample_keys_are_slot_independent():
    """A [B,2] per-sample key batch must give each sample noise that depends
    only on its own key — never on its slot or the batch size (the serving
    batcher's bit-determinism contract, serving.py)."""
    from flash_diffusion_tpu.schedulers.base import split_step_key, step_noise

    keys = jnp.stack([jax.random.PRNGKey(s) for s in (7, 8, 9, 0)])
    sample4 = jnp.zeros((4, 8, 8, 4))
    n4 = np.asarray(step_noise(keys, sample4))
    # same key solo (batch 1) reproduces its batched slot exactly, any slot
    for j, s in enumerate((7, 8, 9)):
        k1 = jnp.stack([jax.random.PRNGKey(s)])
        n1 = np.asarray(step_noise(k1, jnp.zeros((1, 8, 8, 4))))
        assert np.array_equal(n1[0], n4[j]), j
    # single-key path unchanged: one batch-shaped draw
    k = jax.random.PRNGKey(3)
    assert np.array_equal(
        np.asarray(step_noise(k, sample4)),
        np.asarray(jax.random.normal(k, sample4.shape, sample4.dtype)),
    )
    # split threads per-sample chains
    ka, kb = split_step_key(keys)
    assert ka.shape == keys.shape and kb.shape == keys.shape
    ka1, kb1 = split_step_key(jnp.stack([jax.random.PRNGKey(8)]))
    assert np.array_equal(np.asarray(ka1[0]), np.asarray(ka[1]))
    assert np.array_equal(np.asarray(kb1[0]), np.asarray(kb[1]))
