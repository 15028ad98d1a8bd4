"""Test-only numpy ports of the diffusers schedulers the reference drives.

The reference's numerics come from HuggingFace diffusers scheduler classes
(reference: examples/train_flash_sdxl.py:221-236 resolves
DDPMScheduler / EulerDiscreteScheduler / EulerAncestralDiscreteScheduler /
DPMSolverMultistepScheduler / LCMScheduler / FlowMatchEulerDiscreteScheduler
from yaml with ``timestep_spacing="trailing"``). diffusers is not
installable in this environment (zero egress), so these are minimal
re-implementations of each scheduler's ``set_timesteps`` + ``step`` following
the *stateful, object-style control flow of the diffusers originals*
(Apache-2.0, https://github.com/huggingface/diffusers) — deliberately a
different code path from the repo's vectorized table-based JAX schedulers,
so a wrong re-derivation there cannot be self-confirmed here.

Ports are faithful to diffusers >= 0.27 defaults for the configurations the
reference uses. Test-only; never imported by the package.
"""

from __future__ import annotations

import numpy as np


def make_betas(num_train_timesteps, beta_schedule, beta_start, beta_end):
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    if beta_schedule == "scaled_linear":
        return (
            np.linspace(
                beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64
            )
            ** 2
        )
    raise ValueError(beta_schedule)


class GoldenDDPM:
    """diffusers.DDPMScheduler (variance_type="fixed_small")."""

    def __init__(
        self,
        num_train_timesteps=1000,
        beta_start=0.00085,
        beta_end=0.012,
        beta_schedule="scaled_linear",
        prediction_type="epsilon",
        timestep_spacing="trailing",
        steps_offset=0,
        clip_sample=False,
        clip_sample_range=1.0,
    ):
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        self.timestep_spacing = timestep_spacing
        self.steps_offset = steps_offset
        self.clip_sample = clip_sample
        self.clip_sample_range = clip_sample_range
        betas = make_betas(num_train_timesteps, beta_schedule, beta_start, beta_end)
        self.alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(self.alphas)
        self.one = 1.0
        self.init_noise_sigma = 1.0
        self.num_inference_steps = None

    def set_timesteps(self, num_inference_steps):
        self.num_inference_steps = num_inference_steps
        T = self.num_train_timesteps
        if self.timestep_spacing == "linspace":
            timesteps = (
                np.linspace(0, T - 1, num_inference_steps)
                .round()[::-1]
                .copy()
                .astype(np.int64)
            )
        elif self.timestep_spacing == "leading":
            step_ratio = T // num_inference_steps
            timesteps = (
                (np.arange(0, num_inference_steps) * step_ratio)
                .round()[::-1]
                .copy()
                .astype(np.int64)
            )
            timesteps += self.steps_offset
        elif self.timestep_spacing == "trailing":
            step_ratio = T / num_inference_steps
            timesteps = np.arange(T, 0, -step_ratio).round().copy().astype(np.int64)
            timesteps -= 1
        else:
            raise ValueError(self.timestep_spacing)
        self.timesteps = timesteps

    def _get_variance(self, t):
        prev_t = t - self.num_train_timesteps // self.num_inference_steps
        alpha_prod_t = self.alphas_cumprod[t]
        alpha_prod_t_prev = self.alphas_cumprod[prev_t] if prev_t >= 0 else self.one
        current_beta_t = 1 - alpha_prod_t / alpha_prod_t_prev
        variance = (1 - alpha_prod_t_prev) / (1 - alpha_prod_t) * current_beta_t
        return max(variance, 1e-20)

    def step(self, model_output, timestep, sample, noise=None):
        t = int(timestep)
        prev_t = t - self.num_train_timesteps // self.num_inference_steps
        alpha_prod_t = self.alphas_cumprod[t]
        alpha_prod_t_prev = self.alphas_cumprod[prev_t] if prev_t >= 0 else self.one
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        current_alpha_t = alpha_prod_t / alpha_prod_t_prev
        current_beta_t = 1 - current_alpha_t

        if self.prediction_type == "epsilon":
            pred_original_sample = (
                sample - beta_prod_t**0.5 * model_output
            ) / alpha_prod_t**0.5
        elif self.prediction_type == "v_prediction":
            pred_original_sample = (
                alpha_prod_t**0.5 * sample - beta_prod_t**0.5 * model_output
            )
        elif self.prediction_type == "sample":
            pred_original_sample = model_output
        else:
            raise ValueError(self.prediction_type)
        if self.clip_sample:
            pred_original_sample = np.clip(
                pred_original_sample, -self.clip_sample_range, self.clip_sample_range
            )

        pred_original_sample_coeff = (
            alpha_prod_t_prev**0.5 * current_beta_t
        ) / beta_prod_t
        current_sample_coeff = current_alpha_t**0.5 * beta_prod_t_prev / beta_prod_t
        pred_prev_sample = (
            pred_original_sample_coeff * pred_original_sample
            + current_sample_coeff * sample
        )
        if t > 0 and noise is not None:
            pred_prev_sample = pred_prev_sample + self._get_variance(t) ** 0.5 * noise
        return pred_prev_sample


class GoldenEuler:
    """diffusers.EulerDiscreteScheduler / EulerAncestralDiscreteScheduler
    (interpolation_type="linear", s_churn=0)."""

    def __init__(
        self,
        num_train_timesteps=1000,
        beta_start=0.00085,
        beta_end=0.012,
        beta_schedule="scaled_linear",
        prediction_type="epsilon",
        timestep_spacing="trailing",
        steps_offset=0,
        ancestral=False,
    ):
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        self.timestep_spacing = timestep_spacing
        self.steps_offset = steps_offset
        self.ancestral = ancestral
        betas = make_betas(num_train_timesteps, beta_schedule, beta_start, beta_end)
        self.alphas_cumprod = np.cumprod(1.0 - betas)
        self.sigmas_all = ((1 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5
        self.step_index = None

    def set_timesteps(self, num_inference_steps):
        T = self.num_train_timesteps
        if self.timestep_spacing == "linspace":
            timesteps = np.linspace(0, T - 1, num_inference_steps, dtype=np.float32)[
                ::-1
            ].copy()
        elif self.timestep_spacing == "leading":
            step_ratio = T // num_inference_steps
            timesteps = (
                (np.arange(0, num_inference_steps) * step_ratio)
                .round()[::-1]
                .copy()
                .astype(np.float32)
            )
            timesteps += self.steps_offset
        elif self.timestep_spacing == "trailing":
            step_ratio = T / num_inference_steps
            timesteps = (
                np.arange(T, 0, -step_ratio).round().copy().astype(np.float32)
            )
            timesteps -= 1
        else:
            raise ValueError(self.timestep_spacing)
        sigmas = np.interp(timesteps, np.arange(0, len(self.sigmas_all)), self.sigmas_all)
        self.sigmas = np.concatenate([sigmas, [0.0]])
        self.timesteps = timesteps
        self.step_index = 0
        if self.timestep_spacing in ("linspace", "trailing"):
            self.init_noise_sigma = self.sigmas.max()
        else:
            self.init_noise_sigma = (self.sigmas.max() ** 2 + 1) ** 0.5

    def scale_model_input(self, sample):
        sigma = self.sigmas[self.step_index]
        return sample / ((sigma**2 + 1) ** 0.5)

    def step(self, model_output, sample, noise=None):
        sigma = self.sigmas[self.step_index]
        if self.prediction_type == "epsilon":
            pred_original_sample = sample - sigma * model_output
        elif self.prediction_type == "v_prediction":
            pred_original_sample = model_output * (
                -sigma / (sigma**2 + 1) ** 0.5
            ) + (sample / (sigma**2 + 1))
        else:
            raise ValueError(self.prediction_type)

        if self.ancestral:
            sigma_from = self.sigmas[self.step_index]
            sigma_to = self.sigmas[self.step_index + 1]
            sigma_up = (
                sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2
            ) ** 0.5
            sigma_down = (sigma_to**2 - sigma_up**2) ** 0.5
            derivative = (sample - pred_original_sample) / sigma
            dt = sigma_down - sigma
            prev_sample = sample + derivative * dt
            if noise is not None:
                prev_sample = prev_sample + noise * sigma_up
        else:
            derivative = (sample - pred_original_sample) / sigma
            dt = self.sigmas[self.step_index + 1] - sigma
            prev_sample = sample + derivative * dt
        self.step_index += 1
        return prev_sample


class GoldenDPMSolverMultistep:
    """diffusers.DPMSolverMultistepScheduler
    (algorithm_type="dpmsolver++", solver_order=2, solver_type="midpoint",
    final_sigmas_type="zero", lower_order_final=True)."""

    def __init__(
        self,
        num_train_timesteps=1000,
        beta_start=0.00085,
        beta_end=0.012,
        beta_schedule="scaled_linear",
        prediction_type="epsilon",
        timestep_spacing="trailing",
        steps_offset=0,
        solver_order=2,
        final_sigmas_type="zero",
        lower_order_final=True,
        euler_at_final=False,
    ):
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        self.timestep_spacing = timestep_spacing
        self.steps_offset = steps_offset
        self.solver_order = solver_order
        self.final_sigmas_type = final_sigmas_type
        self.lower_order_final = lower_order_final
        self.euler_at_final = euler_at_final
        betas = make_betas(num_train_timesteps, beta_schedule, beta_start, beta_end)
        self.alphas_cumprod = np.cumprod(1.0 - betas)
        self.sigmas_all = ((1 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5
        self.init_noise_sigma = 1.0

    def set_timesteps(self, num_inference_steps):
        T = self.num_train_timesteps
        if self.timestep_spacing == "linspace":
            timesteps = (
                np.linspace(0, T - 1, num_inference_steps + 1)
                .round()[::-1][:-1]
                .copy()
                .astype(np.int64)
            )
        elif self.timestep_spacing == "leading":
            step_ratio = T // (num_inference_steps + 1)
            timesteps = (
                (np.arange(0, num_inference_steps + 1) * step_ratio)
                .round()[::-1][:-1]
                .copy()
                .astype(np.int64)
            )
            timesteps += self.steps_offset
        elif self.timestep_spacing == "trailing":
            step_ratio = T / num_inference_steps
            timesteps = np.arange(T, 0, -step_ratio).round().copy().astype(np.int64)
            timesteps -= 1
        else:
            raise ValueError(self.timestep_spacing)
        sigmas = np.interp(timesteps, np.arange(0, len(self.sigmas_all)), self.sigmas_all)
        if self.final_sigmas_type == "sigma_min":
            sigma_last = self.sigmas_all[0]
        elif self.final_sigmas_type == "zero":
            sigma_last = 0
        else:
            raise ValueError(self.final_sigmas_type)
        self.sigmas = np.concatenate([sigmas, [sigma_last]])
        self.timesteps = timesteps
        self.num_inference_steps = num_inference_steps
        self.model_outputs = [None] * self.solver_order
        self.lower_order_nums = 0
        self.step_index = 0

    @staticmethod
    def _sigma_to_alpha_sigma_t(sigma):
        alpha_t = 1 / ((sigma**2 + 1) ** 0.5)
        sigma_t = sigma * alpha_t
        return alpha_t, sigma_t

    def convert_model_output(self, model_output, sample):
        sigma = self.sigmas[self.step_index]
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma)
        if self.prediction_type == "epsilon":
            return (sample - sigma_t * model_output) / alpha_t
        if self.prediction_type == "v_prediction":
            return alpha_t * sample - sigma_t * model_output
        if self.prediction_type == "sample":
            return model_output
        raise ValueError(self.prediction_type)

    def dpm_solver_first_order_update(self, model_output, sample):
        sigma_t, sigma_s = self.sigmas[self.step_index + 1], self.sigmas[self.step_index]
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma_t)
        alpha_s, sigma_s = self._sigma_to_alpha_sigma_t(sigma_s)
        lambda_t = np.log(alpha_t) - np.log(max(sigma_t, 1e-10))
        lambda_s = np.log(alpha_s) - np.log(max(sigma_s, 1e-10))
        h = lambda_t - lambda_s
        return (sigma_t / sigma_s) * sample - (alpha_t * (np.exp(-h) - 1.0)) * model_output

    def multistep_dpm_solver_second_order_update(self, sample):
        sigma_t = self.sigmas[self.step_index + 1]
        sigma_s0 = self.sigmas[self.step_index]
        sigma_s1 = self.sigmas[self.step_index - 1]
        m0, m1 = self.model_outputs[-1], self.model_outputs[-2]
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma_t)
        alpha_s0, sigma_s0 = self._sigma_to_alpha_sigma_t(sigma_s0)
        alpha_s1, sigma_s1 = self._sigma_to_alpha_sigma_t(sigma_s1)
        lambda_t = np.log(alpha_t) - np.log(max(sigma_t, 1e-10))
        lambda_s0 = np.log(alpha_s0) - np.log(max(sigma_s0, 1e-10))
        lambda_s1 = np.log(alpha_s1) - np.log(max(sigma_s1, 1e-10))
        h, h_0 = lambda_t - lambda_s0, lambda_s0 - lambda_s1
        r0 = h_0 / h
        D0, D1 = m0, (1.0 / r0) * (m0 - m1)
        # solver_type == "midpoint"
        return (
            (sigma_t / sigma_s0) * sample
            - (alpha_t * (np.exp(-h) - 1.0)) * D0
            - 0.5 * (alpha_t * (np.exp(-h) - 1.0)) * D1
        )

    def step(self, model_output, sample):
        final_step = self.step_index == len(self.timesteps) - 1
        lower_order_final = final_step and (
            self.euler_at_final
            or (self.lower_order_final and len(self.timesteps) < 15)
            or self.final_sigmas_type == "zero"
        )
        model_output = self.convert_model_output(model_output, sample)
        for i in range(self.solver_order - 1):
            self.model_outputs[i] = self.model_outputs[i + 1]
        self.model_outputs[-1] = model_output

        if (
            self.solver_order == 1
            or self.lower_order_nums < 1
            or lower_order_final
        ):
            prev_sample = self.dpm_solver_first_order_update(model_output, sample)
        else:
            prev_sample = self.multistep_dpm_solver_second_order_update(sample)
        if self.lower_order_nums < self.solver_order:
            self.lower_order_nums += 1
        self.step_index += 1
        return prev_sample


class GoldenLCM:
    """diffusers.LCMScheduler — the published Flash Diffusion student
    sampler (reference README.md:342-352)."""

    def __init__(
        self,
        num_train_timesteps=1000,
        beta_start=0.00085,
        beta_end=0.012,
        beta_schedule="scaled_linear",
        prediction_type="epsilon",
        original_inference_steps=50,
        timestep_scaling=10.0,
        sigma_data=0.5,
    ):
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        self.original_inference_steps = original_inference_steps
        self.timestep_scaling = timestep_scaling
        self.sigma_data = sigma_data
        betas = make_betas(num_train_timesteps, beta_schedule, beta_start, beta_end)
        self.alphas_cumprod = np.cumprod(1.0 - betas)
        self.final_alpha_cumprod = 1.0
        self.init_noise_sigma = 1.0

    def set_timesteps(self, num_inference_steps=None, timesteps=None, strength=1.0):
        if timesteps is not None:
            self.timesteps = np.asarray(timesteps, np.int64)
            self.num_inference_steps = len(self.timesteps)
        else:
            original_steps = self.original_inference_steps
            k = self.num_train_timesteps // original_steps
            lcm_origin_timesteps = (
                np.asarray(list(range(1, int(original_steps * strength) + 1))) * k - 1
            )
            lcm_origin_timesteps = lcm_origin_timesteps[::-1].copy()
            inference_indices = np.linspace(
                0, len(lcm_origin_timesteps), num=num_inference_steps, endpoint=False
            )
            inference_indices = np.floor(inference_indices).astype(np.int64)
            self.timesteps = lcm_origin_timesteps[inference_indices]
            self.num_inference_steps = num_inference_steps
        self.step_index = 0

    def get_scalings_for_boundary_condition_discrete(self, timestep):
        scaled_timestep = timestep * self.timestep_scaling
        c_skip = self.sigma_data**2 / (scaled_timestep**2 + self.sigma_data**2)
        c_out = scaled_timestep / (scaled_timestep**2 + self.sigma_data**2) ** 0.5
        return c_skip, c_out

    def step(self, model_output, timestep, sample, noise=None):
        t = int(timestep)
        prev_step_index = self.step_index + 1
        if prev_step_index < len(self.timesteps):
            prev_timestep = int(self.timesteps[prev_step_index])
        else:
            prev_timestep = t
        alpha_prod_t = self.alphas_cumprod[t]
        alpha_prod_t_prev = (
            self.alphas_cumprod[prev_timestep]
            if prev_timestep >= 0
            else self.final_alpha_cumprod
        )
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev

        c_skip, c_out = self.get_scalings_for_boundary_condition_discrete(t)
        if self.prediction_type == "epsilon":
            predicted_original_sample = (
                sample - beta_prod_t**0.5 * model_output
            ) / alpha_prod_t**0.5
        elif self.prediction_type == "v_prediction":
            predicted_original_sample = (
                alpha_prod_t**0.5 * sample - beta_prod_t**0.5 * model_output
            )
        else:
            raise ValueError(self.prediction_type)
        denoised = c_out * predicted_original_sample + c_skip * sample

        if self.step_index != self.num_inference_steps - 1:
            if noise is None:
                noise = np.zeros_like(sample)
            prev_sample = (
                alpha_prod_t_prev**0.5 * denoised + beta_prod_t_prev**0.5 * noise
            )
        else:
            prev_sample = denoised
        self.step_index += 1
        return prev_sample


class GoldenFlowMatchEuler:
    """diffusers.FlowMatchEulerDiscreteScheduler (SD3; shift=3.0,
    use_dynamic_shifting=False)."""

    def __init__(self, num_train_timesteps=1000, shift=3.0):
        self.num_train_timesteps = num_train_timesteps
        self.shift = shift
        timesteps = np.linspace(
            1, num_train_timesteps, num_train_timesteps, dtype=np.float64
        )[::-1].copy()
        sigmas = timesteps / num_train_timesteps
        sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
        self.timesteps_train = sigmas * num_train_timesteps
        self.sigmas_train = sigmas
        self.sigma_min = float(sigmas[-1])
        self.sigma_max = float(sigmas[0])
        self.init_noise_sigma = 1.0

    def _sigma_to_t(self, sigma):
        return sigma * self.num_train_timesteps

    def set_timesteps(self, num_inference_steps):
        timesteps = np.linspace(
            self._sigma_to_t(self.sigma_max),
            self._sigma_to_t(self.sigma_min),
            num_inference_steps,
        )
        sigmas = timesteps / self.num_train_timesteps
        sigmas = self.shift * sigmas / (1 + (self.shift - 1) * sigmas)
        self.timesteps = sigmas * self.num_train_timesteps
        self.sigmas = np.concatenate([sigmas, [0.0]])
        self.step_index = 0

    def step(self, model_output, sample):
        sigma = self.sigmas[self.step_index]
        sigma_next = self.sigmas[self.step_index + 1]
        prev_sample = sample + (sigma_next - sigma) * model_output
        self.step_index += 1
        return prev_sample

    def scale_noise(self, sample, sigma, noise):
        return sigma * noise + (1.0 - sigma) * sample
