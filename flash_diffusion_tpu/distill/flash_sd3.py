"""FlashDiffusionSD3 — rectified-flow distillation (SD3 MMDiT family).

Re-derivation of the reference SD3 variant
(reference: src/flash/models/flash_sd3/flash_diffusion_model.py:44-958),
sharing the single-jitted-step skeleton of :class:`FlashDiffusion` with the
flow-matching deltas:

- noising is the σ-interpolation ``σ·noise + (1−σ)·z`` (:259-271) with σ
  from the shifted flow schedule;
- the student's one-step prediction is ``x̂₀ = noisy − v̂·σ`` — no LCM
  boundary scalings (:319-325);
- DMD drops the ᾱ/β̄ weighting and (faithfully) uses the raw CFG velocity
  prediction in the weight normalizer (:415-496);
- GAN noising timesteps index the *tail* of the full 1000-step flow schedule
  (timesteps[-10], [-250], [-500], [-750]; :517-528);
- teacher rollout steps with flow-match Euler; student samples with the
  Flash flow-match sampler.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from pydantic.dataclasses import dataclass

from ..schedulers import REGISTRY, SchedulerConfig, flow_match
from .common import sample_start_index
from .flash import FlashDiffusion, FlashDiffusionConfig, _dup, _tree_cat
from .losses import center_crop, dmd_loss, gan_losses, huber_loss, l1_loss, l2_loss


@dataclass
class FlashDiffusionSD3Config(FlashDiffusionConfig):
    """Reference config surface minus adapter/use_empty_prompt
    (src/flash/models/flash_sd3/flash_diffusion_config.py:10-99); gan tail
    indices into the full flow schedule replace fixed DDPM timesteps."""

    gan_tail_indices: Any = (10, 250, 500, 750)
    use_adversarial_loss: bool = True


class FlashDiffusionSD3(FlashDiffusion):
    def __init__(
        self,
        config: FlashDiffusionSD3Config,
        student_module,
        teacher_module=None,
        scheduler_config: Optional[SchedulerConfig] = None,
        vae=None,
        conditioner=None,
        discriminator=None,
        lpips=None,
        lora_scaling: float = 1.0,
    ):
        scheduler_config = scheduler_config or SchedulerConfig(shift=3.0)
        super().__init__(
            config,
            student_module,
            teacher_module,
            scheduler_config=scheduler_config,
            teacher_scheduler="FlowMatchEulerDiscreteScheduler",
            sampling_scheduler="FlashFlowMatchEulerDiscreteScheduler",
            teacher_sampling_scheduler="FlowMatchEulerDiscreteScheduler",
            vae=vae,
            conditioner=conditioner,
            adapter=None,
            discriminator=discriminator,
            lpips=lpips,
            lora_scaling=lora_scaling,
        )
        self.use_adversarial_loss = discriminator is not None and config.use_adversarial_loss
        # full-resolution flow schedule (the reference's scheduler *copy*)
        self.full_schedule = flow_match.set_timesteps(
            self.sched_config, self.sched_config.num_train_timesteps
        )
        # GAN tail timesteps + their sigmas (static)
        tail = np.asarray(self.config.gan_tail_indices, np.int64)
        ts_full = np.asarray(self.full_schedule.timesteps)
        sig_full = np.asarray(self.full_schedule.sigmas)
        self.gan_ts = jnp.asarray(ts_full[-tail], jnp.float32)
        self.gan_sigmas = jnp.asarray(sig_full[-tail - 1], jnp.float32)

    # -- flow-matching primitives ---------------------------------------
    def _sigma_at(self, stage: int, idx) -> jnp.ndarray:
        return self.stage_schedules[stage].sigmas[idx]

    def _teacher_rollout(self, frozen, noisy, start_idx, cond, uncond, adapter_res, guidance, stage, rng):
        sched = self.stage_schedules[stage]
        k = self.config.K[stage]
        cond2 = _tree_cat(cond, uncond) if cond is not None else None
        b = noisy.shape[0]

        def body(i, carry):
            sample, _, key = carry
            t = sched.timesteps[i]
            t2 = jnp.broadcast_to(t, (2 * b,))
            both = jnp.concatenate([sample, sample], axis=0)
            pred2 = self.teacher_module.apply(frozen["teacher"], both, t2, cond2)
            pc, pu = jnp.split(pred2, 2, axis=0)
            pred = guidance * pc + (1.0 - guidance) * pu
            sample = flow_match.step(sched, pred, i, sample)
            return sample, sample, key

        out, _, _ = jax.lax.fori_loop(start_idx, k, body, (noisy, noisy, rng))
        return jax.lax.stop_gradient(out)

    def losses(self, trainable, frozen, batch, rng, stage: int):
        cfg = self.config
        sched = self.stage_schedules[stage]
        k_vae, k_ucg, k_noise, k_start, k_guid, k_roll, k_dmd, k_gan = jax.random.split(rng, 8)

        z = batch.get("__z")  # staged VAE encode (see FlashDiffusion.losses)
        if z is None:
            z = self._encode(frozen, batch, k_vae)
        pre = batch.get("__conds")  # staged conditioning (see FlashDiffusion.losses)
        if pre is not None:
            cond, student_cond, uncond = pre
        else:
            cond, student_cond, uncond = self._conditionings(frozen, batch, k_ucg)

        b = z.shape[0]
        start_idx = sample_start_index(k_start, self.stage_pdfs[stage])
        start_t = sched.timesteps[start_idx]
        t_b = jnp.broadcast_to(start_t, (b,))
        sigma = self._sigma_at(stage, start_idx)

        noise = jax.random.normal(k_noise, z.shape, z.dtype)
        noisy_interp = flow_match.add_noise(sched, z, noise, jnp.broadcast_to(sigma, (b,)))
        is_start = (start_idx == 0).astype(z.dtype)
        noisy_init = is_start * (noise * sched.init_noise_sigma) + (1.0 - is_start) * noisy_interp

        from ..lora import lora_is_dense_only

        sidepath = (
            getattr(cfg, "lora_mode", "sidepath") == "sidepath"
            and lora_is_dense_only(trainable["lora"])
        )
        if sidepath or cfg.remat_student_merge:
            student_params = None  # no merged tree (side path / remat merge)
            student_pred = self._student_forward(
                frozen, trainable["lora"], noisy_init, t_b, student_cond
            )
        else:
            student_params = self.student_params(frozen, trainable["lora"])
            student_pred = self.student_module.apply(
                student_params, noisy_init, t_b, student_cond
            )
        student_output = noisy_init - student_pred * sigma

        g = (
            jax.random.uniform(k_guid)
            * (cfg.guidance_scale_max[stage] - cfg.guidance_scale_min[stage])
            + cfg.guidance_scale_min[stage]
        )
        teacher_output = self._teacher_rollout(
            frozen, jax.lax.stop_gradient(noisy_init), start_idx, cond, uncond, None, g, stage, k_roll
        )

        distill = self._distill_loss(frozen, student_output, teacher_output)
        loss_g_total = distill * cfg.distill_loss_scale[stage]
        aux = {"loss/distill": distill, "start_timestep": start_t, "guidance": g}

        if cfg.use_dmd_loss:
            dmd = self._dmd_rf(
                frozen, trainable["lora"], student_params, student_output, cond,
                student_cond, uncond, stage, k_dmd,
            )
            loss_g_total = loss_g_total + dmd * cfg.dmd_loss_scale[stage]
            aux["loss/dmd"] = dmd

        loss_d = jnp.float32(0.0)
        if self.use_adversarial_loss:
            loss_g_adv, loss_d = self._gan_rf(
                frozen, trainable["disc"], z, student_output, teacher_output, cond, k_gan
            )
            loss_g_total = loss_g_total + cfg.adversarial_loss_scale[stage] * loss_g_adv
            aux["loss/gan_g"] = loss_g_adv
            aux["loss/gan_d"] = loss_d

        aux["loss/generator"] = loss_g_total
        return loss_g_total + loss_d, aux

    def _dmd_rf(self, frozen, lora, student_params, student_output, cond, student_cond, uncond, stage, rng):
        cfg = self.config
        b = student_output.shape[0]
        k_n, k_t, k_g = jax.random.split(rng, 3)
        idx = jax.random.randint(k_t, (b,), 0, self.sched_config.num_train_timesteps)
        t = self.full_schedule.timesteps[idx]
        sigma = self.full_schedule.sigmas[idx]
        noise = jax.random.normal(k_n, student_output.shape, student_output.dtype)
        noisy = flow_match.add_noise(self.full_schedule, student_output, noise, sigma)

        sg = jax.lax.stop_gradient
        cond2 = _tree_cat(cond, uncond) if cond is not None else None
        t2 = jnp.concatenate([t, t])
        pred2 = sg(
            self.teacher_module.apply(frozen["teacher"], sg(jnp.concatenate([noisy, noisy])), t2, cond2)
        )
        real_c, real_u = jnp.split(pred2, 2, axis=0)
        if student_params is None:
            fake = sg(self._student_forward(frozen, sg(lora), sg(noisy), t, student_cond))
        else:
            fake = sg(self.student_module.apply(student_params, sg(noisy), t, student_cond))
        g = (
            jax.random.uniform(k_g)
            * (cfg.guidance_scale_max[stage] - cfg.guidance_scale_min[stage])
            + cfg.guidance_scale_min[stage]
        )
        real = g * real_c + (1.0 - g) * real_u
        # Reference quirk preserved: the weight normalizer uses the raw CFG
        # velocity prediction as "pred_x0" (:487-489).
        return dmd_loss(student_output, real, fake, real, None, weighted=False)

    def _gan_rf(self, frozen, disc_params, z, student_output, teacher_output, cond, rng):
        cfg = self.config
        b = student_output.shape[0]
        k_t, k_n = jax.random.split(rng)
        idx = jax.random.randint(k_t, (b,), 0, len(cfg.gan_tail_indices))
        ts = self.gan_ts[idx]
        sigma = self.gan_sigmas[idx]
        noise = jax.random.normal(k_n, student_output.shape, student_output.dtype)
        real = teacher_output if cfg.use_teacher_as_real else z
        noisy_fake = flow_match.add_noise(self.full_schedule, student_output, noise, sigma)
        noisy_real = flow_match.add_noise(self.full_schedule, real, noise, sigma)

        both = jnp.concatenate([noisy_fake, noisy_real], axis=0)
        cond2 = _dup(cond) if cond is not None else None
        t2 = jnp.concatenate([ts, ts])
        _, feats = self.teacher_module.apply(
            frozen["teacher"], both, t2, cond2, return_features="post_mid"
        )
        f_fake, f_real = jnp.split(feats, 2, axis=0)
        disc_fn = lambda p, x: self.discriminator.apply(p, x)
        return gan_losses(disc_fn, disc_params, f_fake, f_real, cfg.gan_loss_type)

    def _distill_loss(self, frozen, student_output, teacher_output):
        cfg = self.config
        if cfg.distill_loss_type == "lpips":
            s = center_crop(student_output, cfg.lpips_crop)
            t = center_crop(teacher_output, cfg.lpips_crop)

            def lp(s_, t_):  # checkpointed — see FlashDiffusion._distill_loss
                dec_s = jnp.clip(self.vae.apply(frozen["vae"], s_, method=self.vae.decode_latents), -1, 1)
                dec_t = jnp.clip(self.vae.apply(frozen["vae"], t_, method=self.vae.decode_latents), -1, 1)
                return jnp.mean(self.lpips.apply(frozen["lpips"], dec_s, dec_t))

            return jax.checkpoint(lp)(s, t)
        return {"l2": l2_loss, "l1": l1_loss, "huber": huber_loss}[cfg.distill_loss_type](
            student_output, teacher_output
        )

    def sample(self, frozen, lora, z, batch, num_steps=4, guidance_scale=1.0,
               uncond_batch=None, decode=True, use_teacher=False,
               teacher_guidance_scale=5.0, rng=None, adapter_conditioning_scale=1.0):
        """Few-step flash sampling for rectified flow (reference
        flash_sd3 sample, :715-945). Teacher path: plain flow Euler."""
        cfg = self.config
        sched = flow_match.set_timesteps(self.sched_config, num_steps)
        mod = REGISTRY["FlashFlowMatchEulerDiscreteScheduler"]
        if use_teacher:
            params, module, g_scale = frozen["teacher"], self.teacher_module, teacher_guidance_scale
            step_fn = flow_match.step
            stochastic = False
        else:
            params = self.student_params(frozen, lora) if lora is not None else frozen["teacher"]
            module, g_scale = self.student_module, guidance_scale
            step_fn = mod.step
            stochastic = True

        cparams = frozen.get("conditioners")
        cond = (
            self.conditioner(cparams, batch, set_ucg_rate_zero=True)
            if self.conditioner is not None else None
        )
        do_cfg = g_scale != 1.0
        uncond = None
        if do_cfg and self.conditioner is not None:
            if uncond_batch is not None:
                uncond = self.conditioner(cparams, uncond_batch, set_ucg_rate_zero=True)
            else:
                uncond = self.conditioner(cparams, batch, ucg_keys=cfg.ucg_keys)
        cond2 = _tree_cat(cond, uncond) if do_cfg and cond is not None else cond

        b = z.shape[0]
        sample = z * sched.init_noise_sigma
        rng = rng if rng is not None else jax.random.PRNGKey(0)

        def body(carry, i):
            s, key = carry
            t = sched.timesteps[i]
            if do_cfg:
                both = jnp.concatenate([s, s], axis=0)
                t2 = jnp.broadcast_to(t, (2 * b,))
                pred2 = module.apply(params, both, t2, cond2)
                pc, pu = jnp.split(pred2, 2, axis=0)
                pred = g_scale * pc + (1.0 - g_scale) * pu
            else:
                pred = module.apply(params, s, jnp.broadcast_to(t, (b,)), cond2)
            key, sub = jax.random.split(key)
            s = step_fn(sched, pred, i, s, key=sub if stochastic else None)
            return (s, key), None

        (sample, _), _ = jax.lax.scan(body, (sample, rng), jnp.arange(num_steps))
        if decode and self.vae is not None:
            return self.vae.apply(frozen["vae"], sample, method=self.vae.decode_latents)
        return sample
