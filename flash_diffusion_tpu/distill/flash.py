"""FlashDiffusion — the core distillation algorithm (ε-prediction family:
SD1.5 / SDXL / Pixart / T2I-adapter).

Re-derivation of the reference model
(reference: src/flash/models/flash/flash_diffusion_model.py:38-1019),
restructured as ONE pure loss function compiled into a single jitted train
step per stage:

- the teacher K-step CFG rollout runs as a ``lax.fori_loop`` from the traced
  ``start_idx`` (no recompilation across random starts; reference loops in
  Python, :288-324), with cond/uncond folded into one 2B-batched forward per
  step instead of two (:297-313);
- generator and discriminator losses share that rollout and are produced in
  one backward pass via stop_gradient partitioning (the reference's
  ``training_step`` runs the whole model twice, once per optimizer —
  trainer/trainer.py:187-218 — the single most expensive pattern to remove
  on TPU, SURVEY.md §3.1);
- the student is the frozen teacher base + LoRA factors merged on the fly
  (grads flow only into the factors);
- stage-dependent quantities (K, pdf, loss scales, guidance range) are
  Python-static per stage: one compile per stage, four stages total.

Batch convention (NHWC/ids): ``image`` [B,H,W,3]; per-conditioner token ids
under ``{input_key}_ids``; adapter input under ``config.adapter_input_key``.
"""

from __future__ import annotations

from dataclasses import field
from typing import Any, Dict, List, Literal, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from pydantic.dataclasses import dataclass

from ..config import BaseConfig
from ..lora import lora_collection, lora_is_dense_only, merge_lora
from ..schedulers import REGISTRY, SchedulerConfig
from ..schedulers import add_noise as vp_add_noise
from ..schedulers import base as sched_base
from .common import (
    boundary_scalings,
    predicted_x0_eps,
    sample_start_index,
    stage_index,
    timestep_pdf,
)
from .losses import center_crop, dmd_loss, gan_losses, huber_loss, l1_loss, l2_loss


@dataclass
class FlashDiffusionConfig(BaseConfig):
    """Mirror of the reference config surface
    (src/flash/models/flash/flash_diffusion_config.py:10-106), plus the
    TPU-step extras (gan_timesteps made explicit, update mode)."""

    input_key: str = "image"
    K: List[int] = field(default_factory=lambda: [32, 32, 32, 32])
    num_iterations_per_K: List[int] = field(default_factory=lambda: [5000] * 4)
    guidance_scale_min: Union[float, List[float]] = 3.0
    guidance_scale_max: Union[float, List[float]] = 7.0
    distill_loss_type: Literal["l2", "l1", "lpips", "huber"] = "l2"
    ucg_keys: List[str] = field(default_factory=lambda: ["text"])
    timestep_distribution: Literal["gaussian", "uniform", "mixture"] = "mixture"
    mixture_num_components: Union[int, List[int]] = 4
    mixture_var: Union[float, List[float]] = 0.5
    adapter_conditioning_scale: float = 1.0
    adapter_input_key: Optional[str] = None
    use_dmd_loss: bool = False
    dmd_loss_scale: Union[float, List[float]] = 1.0
    distill_loss_scale: Union[float, List[float]] = 1.0
    adversarial_loss_scale: Union[float, List[float]] = 1.0
    gan_loss_type: Literal["hinge", "vanilla", "non-saturating", "wgan", "lsgan"] = "hinge"
    mode_probs: Optional[List[List[float]]] = None
    use_teacher_as_real: bool = False
    use_empty_prompt: bool = False
    # "sidepath": apply LoRA factors inside LoraDense layers via the
    # "lora" variable collection — no merged params copy in HBM (the
    # TPU-first default; auto-falls-back to merge for conv LoRA pairs).
    # "merge": reference-style weight merge (one shared merged tree).
    lora_mode: Literal["sidepath", "merge"] = "sidepath"
    # rematerialize the LoRA-merge + student forward as one checkpointed
    # segment (trades ~1 extra student forward in the backward for not
    # holding the params-sized merged tree across the rollout/DMD/GAN
    # segments). Off by default: with block-level remat already on in the
    # bodies, XLA's scheduler usually does better without the extra barrier.
    remat_student_merge: bool = False
    # fixed GAN noising timesteps (reference hardcodes these, :524)
    gan_timesteps: List[int] = field(default_factory=lambda: [10, 250, 500, 750])
    # "simultaneous": G and D both update every step (shared rollout, TPU
    # restructure); "alternating": reference parity semantics.
    gan_update_mode: Literal["simultaneous", "alternating"] = "simultaneous"
    sigma_data: float = 0.5
    timestep_scaling: float = 10.0
    lpips_crop: int = 64
    # On a stage boundary where K changes, replace the teacher with the
    # current merged student (the reference reads a never-assigned
    # ``switch_teacher`` attribute — AttributeError if K varies,
    # flash_diffusion_model.py:228-233 / SURVEY.md §2.3; here it's a real,
    # working flag handled by the trainer between stages).
    switch_teacher: bool = False

    def __post_init__(self):
        super().__post_init__()
        n = len(self.K)
        bc = lambda v: [v] * n if isinstance(v, (int, float)) else list(v)
        self.guidance_scale_min = bc(self.guidance_scale_min)
        self.guidance_scale_max = bc(self.guidance_scale_max)
        self.mixture_num_components = bc(self.mixture_num_components)
        self.mixture_var = bc(self.mixture_var)
        self.distill_loss_scale = bc(self.distill_loss_scale)
        self.dmd_loss_scale = bc(self.dmd_loss_scale)
        self.adversarial_loss_scale = bc(self.adversarial_loss_scale)
        if self.mode_probs is None:
            self.mode_probs = [[1.0 / m] * m for m in self.mixture_num_components]
        assert len(self.num_iterations_per_K) == n
        assert len(self.mode_probs) == n
        for i in range(n):
            assert len(self.mode_probs[i]) == self.mixture_num_components[i]


def _tree_cat(a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.concatenate([x, y], axis=0), a, b)


def _dup(tree):
    return jax.tree_util.tree_map(lambda x: jnp.concatenate([x, x], axis=0), tree)


def _adapter_kw(adapter_res):
    """Pass adapter_residuals only when present — DiT/MMDiT bodies take no
    such parameter (the reference's transformer wrappers likewise swallow
    the kwarg, tranformers.py:49-57 **kwargs)."""
    return {"adapter_residuals": adapter_res} if adapter_res is not None else {}


class FlashDiffusion:
    """Holds static wiring; all compute methods are pure in (params, batch, rng).

    Params pytree convention::

        frozen    = {"teacher": …, "vae": …, "conditioners": […], "adapter": …,
                     "lpips": …, "student_base": … (optional; defaults to teacher)}
        trainable = {"lora": …, "disc": …}
    """

    def __init__(
        self,
        config: FlashDiffusionConfig,
        student_module,  # flax module: (sample, t, cond, adapter_residuals, return_features)
        teacher_module=None,
        scheduler_config: Optional[SchedulerConfig] = None,
        teacher_scheduler: str = "DDPMScheduler",
        sampling_scheduler: str = "LCMScheduler",
        teacher_sampling_scheduler: str = "EulerDiscreteScheduler",
        vae=None,  # AutoencoderKL module
        conditioner=None,  # ConditionerWrapper
        adapter=None,  # flax module producing per-level residual list
        discriminator=None,  # flax module
        lpips=None,  # LPIPS module
        lora_scaling: float = 1.0,  # lora.lora_scaling(rank, alpha)
    ):
        self.lora_scaling = lora_scaling
        self.config = config
        self.student_module = student_module
        self.teacher_module = teacher_module or student_module
        self.vae = vae
        self.conditioner = conditioner
        self.adapter = adapter
        self.discriminator = discriminator
        self.lpips = lpips
        self.use_adversarial_loss = discriminator is not None

        self.sched_config = scheduler_config or SchedulerConfig()
        self.teacher_sched_mod = REGISTRY[teacher_scheduler]
        self.sampling_sched_mod = REGISTRY[sampling_scheduler]
        self.teacher_sampling_sched_mod = REGISTRY[teacher_sampling_scheduler]
        self.sampling_scheduler_name = sampling_scheduler
        self.teacher_scheduler_name = teacher_scheduler

        # full-T training tables (reference registers sqrt_alpha_cumprod /
        # sigmas buffers, :110-126)
        acp, sqrt_acp, sqrt_1macp = sched_base.training_tables(self.sched_config)
        self.alphas_cumprod = jnp.asarray(acp, jnp.float32)
        self.sqrt_acp = jnp.asarray(sqrt_acp, jnp.float32)
        self.sqrt_1macp = jnp.asarray(sqrt_1macp, jnp.float32)

        # per-stage schedules + start-index pdfs (host-side, once)
        self.stage_schedules = [
            self.teacher_sched_mod.set_timesteps(self.sched_config, k) for k in config.K
        ]
        self.stage_pdfs = [
            timestep_pdf(
                config.timestep_distribution,
                config.K[s],
                config.mixture_num_components[s],
                config.mixture_var[s],
                config.mode_probs[s],
            )
            for s in range(len(config.K))
        ]
        self._sched_has_carry = hasattr(self.teacher_sched_mod, "init_state")
        self._sched_stochastic = teacher_scheduler == "DDPMScheduler"

    # ------------------------------------------------------------------
    def stage_for_iteration(self, iter_step: int) -> int:
        return stage_index(iter_step, self.config.num_iterations_per_K)

    def student_params(self, frozen, lora):
        base = frozen.get("student_base") or frozen["teacher"]
        return merge_lora(base, lora, self.lora_scaling)

    def _student_forward(self, frozen, lora, x, t, cond, adapter_res=None):
        """Student forward without a pre-merged tree.

        Preferred path (``lora_mode="sidepath"``): thread the factor pairs
        through the ``"lora"`` variable collection so each ``LoraDense``
        computes ``x·W + (x·A)·B`` in place — no params-sized merged copy
        in HBM at all (SDXL bf16: ~3.5 GB saved per step) and autodiff
        yields dA/dB directly. Falls back to weight merging when the lora
        tree carries conv (4-D) pairs, optionally rematerialized
        (``remat_student_merge``)."""
        kw = {"adapter_residuals": adapter_res} if adapter_res is not None else {}
        base = frozen.get("student_base") or frozen["teacher"]
        if (
            getattr(self.config, "lora_mode", "sidepath") == "sidepath"
            and lora_is_dense_only(lora)
        ):
            variables = {**base, "lora": lora_collection(lora, self.lora_scaling)}
            return self.student_module.apply(variables, x, t, cond, **kw)

        def f(lora_, x_, t_, cond_, adapter_):
            p = self.student_params(frozen, lora_)
            kw_ = {"adapter_residuals": adapter_} if adapter_ is not None else {}
            return self.student_module.apply(p, x_, t_, cond_, **kw_)

        if getattr(self.config, "remat_student_merge", False):
            f = jax.checkpoint(f)
        return f(lora, x, t, cond, adapter_res)

    def _conditionings(self, frozen, batch, rng):
        """(cond, student_cond, uncond) — reference forward :188-205."""
        if self.conditioner is None:
            return None, None, None
        cparams = frozen["conditioners"]
        cond = self.conditioner(cparams, batch, set_ucg_rate_zero=True)
        student_cond = self.conditioner(cparams, batch, rng=rng)
        if self.config.use_empty_prompt and any(
            f"{k}_empty_ids" in batch for k in self.config.ucg_keys
        ):
            ub = dict(batch)
            for k in self.config.ucg_keys:
                if f"{k}_empty_ids" in batch:
                    ub[f"{k}_ids"] = batch[f"{k}_empty_ids"]
            uncond = self.conditioner(cparams, ub, set_ucg_rate_zero=True)
        else:
            uncond = self.conditioner(cparams, batch, ucg_keys=self.config.ucg_keys)
        return cond, student_cond, uncond

    def _adapter_residuals(self, frozen, batch):
        if self.adapter is None or self.config.adapter_input_key is None:
            return None
        res = self.adapter.apply(frozen["adapter"], batch[self.config.adapter_input_key])
        return [r * self.config.adapter_conditioning_scale for r in res]

    def _encode(self, frozen, batch, rng):
        if self.vae is None:
            return jnp.asarray(batch[self.config.input_key])
        z = self.vae.apply(frozen["vae"], batch[self.config.input_key], rng, method=self.vae.encode)
        return jax.lax.stop_gradient(z)

    def _teacher_rollout(self, frozen, noisy, start_idx, cond, uncond, adapter_res, guidance, stage, rng):
        """Stop-grad K-step CFG rollout (reference :288-324), 2B-batched."""
        sched = self.stage_schedules[stage]
        mod = self.teacher_sched_mod
        k = self.config.K[stage]
        cond2 = _tree_cat(cond, uncond) if cond is not None else None
        adapter2 = [jnp.concatenate([r, r]) for r in adapter_res] if adapter_res else None
        b = noisy.shape[0]

        def body(i, carry):
            sample, dpm_state, key = carry
            t = sched.timesteps[i]
            t2 = jnp.broadcast_to(t, (2 * b,))
            inp = mod.scale_model_input(sched, sample, i)
            both = jnp.concatenate([inp, inp], axis=0)
            pred2 = self.teacher_module.apply(
                frozen["teacher"], both, t2, cond2, **_adapter_kw(adapter2)
            )
            pred_c, pred_u = jnp.split(pred2, 2, axis=0)
            pred = guidance * pred_c + (1.0 - guidance) * pred_u
            key, sub = jax.random.split(key)
            step_key = sub if self._sched_stochastic else None
            if self._sched_has_carry:
                sample, dpm_state = mod.step(sched, pred, i, sample, dpm_state)
            else:
                sample = mod.step(sched, pred, i, sample, key=step_key)
            return sample, dpm_state, key

        dpm0 = mod.init_state(noisy) if self._sched_has_carry else jnp.zeros_like(noisy)
        init = (noisy, dpm0, rng)
        out, _, _ = jax.lax.fori_loop(start_idx, k, body, init)
        return jax.lax.stop_gradient(out)

    def _distill_loss(self, frozen, student_output, teacher_output):
        cfg = self.config
        if cfg.distill_loss_type == "l2":
            return l2_loss(student_output, teacher_output)
        if cfg.distill_loss_type == "l1":
            return l1_loss(student_output, teacher_output)
        if cfg.distill_loss_type == "huber":
            return huber_loss(student_output, teacher_output)
        if cfg.distill_loss_type == "lpips":
            s = center_crop(student_output, cfg.lpips_crop)
            t = center_crop(teacher_output, cfg.lpips_crop)

            # checkpointed: the VAE-decoder + VGG residuals (~GBs at 64²
            # latent crops) would otherwise be held across the whole step
            # graph; saving only the cropped latents and recomputing the
            # two decodes + LPIPS towers in the backward costs a negligible
            # fraction of the K-step rollout's FLOPs.
            def lp(s_, t_):
                dec_s = jnp.clip(
                    self.vae.apply(frozen["vae"], s_, method=self.vae.decode_latents), -1, 1
                )
                dec_t = jnp.clip(
                    self.vae.apply(frozen["vae"], t_, method=self.vae.decode_latents), -1, 1
                )
                return jnp.mean(self.lpips.apply(frozen["lpips"], dec_s, dec_t))

            return jax.checkpoint(lp)(s, t)
        raise ValueError(cfg.distill_loss_type)

    def _dmd(self, frozen, lora, student_params, student_output, cond, student_cond, uncond, adapter_res, stage, rng):
        """DMD loss (reference :401-499): re-noise the student output at a
        random t, query teacher (CFG) + student (no grad), score difference."""
        cfg = self.config
        b = student_output.shape[0]
        k_noise, k_t, k_g = jax.random.split(rng, 3)
        t = jax.random.randint(k_t, (b,), 0, self.sched_config.num_train_timesteps)
        noise = jax.random.normal(k_noise, student_output.shape, student_output.dtype)
        sched = self.stage_schedules[stage]
        noisy = vp_add_noise(sched, student_output, noise, t)

        sg = jax.lax.stop_gradient
        cond2 = _tree_cat(cond, uncond) if cond is not None else None
        adapter2 = [jnp.concatenate([r, r]) for r in adapter_res] if adapter_res else None
        t2 = jnp.concatenate([t, t])
        pred2 = sg(
            self.teacher_module.apply(
                frozen["teacher"], sg(jnp.concatenate([noisy, noisy])), t2, cond2,
                **_adapter_kw(adapter2),
            )
        )
        real_c, real_u = jnp.split(pred2, 2, axis=0)
        if student_params is None:
            fake = sg(
                self._student_forward(
                    frozen, sg(lora), sg(noisy), t, student_cond, adapter_res
                )
            )
        else:
            fake = sg(
                self.student_module.apply(
                    student_params, sg(noisy), t, student_cond,
                    **_adapter_kw(adapter_res),
                )
            )
        g = (
            jax.random.uniform(k_g)
            * (cfg.guidance_scale_max[stage] - cfg.guidance_scale_min[stage])
            + cfg.guidance_scale_min[stage]
        )
        real = g * real_c + (1.0 - g) * real_u
        pred_x0 = predicted_x0_eps(real, t, noisy, self.sqrt_acp, self.sqrt_1macp, student_output)
        return dmd_loss(
            student_output, real, fake, pred_x0, self.alphas_cumprod[t], weighted=True
        )

    def _gan(self, frozen, disc_params, z, student_output, teacher_output, cond, adapter_res, rng):
        """GAN branch (reference :501-667): noise fake/real at the fixed
        timesteps, tap teacher mid-features on the 2B batch, run the conv
        discriminator; both losses from one computation."""
        cfg = self.config
        b = student_output.shape[0]
        k_t, k_n = jax.random.split(rng)
        sel = jnp.asarray(cfg.gan_timesteps, jnp.int32)
        idx = jax.random.randint(k_t, (b,), 0, len(cfg.gan_timesteps))
        ts = sel[idx]
        noise = jax.random.normal(k_n, student_output.shape, student_output.dtype)
        real = teacher_output if cfg.use_teacher_as_real else z
        sched = self.stage_schedules[0]
        noisy_fake = vp_add_noise(sched, student_output, noise, ts)
        noisy_real = vp_add_noise(sched, real, noise, ts)

        both = jnp.concatenate([noisy_fake, noisy_real], axis=0)
        cond2 = _dup(cond) if cond is not None else None
        adapter2 = [jnp.concatenate([r, r]) for r in adapter_res] if adapter_res else None
        t2 = jnp.concatenate([ts, ts])
        _, feats = self.teacher_module.apply(
            frozen["teacher"], both, t2, cond2, return_features=True,
            **_adapter_kw(adapter2),
        )
        f_fake, f_real = jnp.split(feats, 2, axis=0)

        disc_fn = lambda p, x: self.discriminator.apply(p, x)
        return gan_losses(disc_fn, disc_params, f_fake, f_real, cfg.gan_loss_type)

    # ------------------------------------------------------------------
    def losses(
        self,
        trainable: Dict[str, Any],
        frozen: Dict[str, Any],
        batch: Dict[str, Any],
        rng: jax.Array,
        stage: int,
    ):
        """Pure loss computation. Returns (total, aux) where ``total`` is
        loss_G + loss_D with stop_gradient partitioning (one backward pass
        updates both LoRA and discriminator)."""
        cfg = self.config
        sched = self.stage_schedules[stage]
        keys = jax.random.split(rng, 8)
        k_vae, k_ucg, k_noise, k_start, k_guid, k_roll, k_dmd, k_gan = keys

        # "__z" = staged VAE encode (stop-grad, frozen weights — same
        # rationale as "__conds" below: keep the encoder out of this graph)
        z = batch.get("__z")
        if z is None:
            z = self._encode(frozen, batch, k_vae)
        # "__conds" = staged conditioning: the trainer pre-computes the three
        # conditioner passes in a separately-jitted fn so the text-encoder
        # towers (2×CLIP / CLIP+T5-XXL) are not part of this (already large)
        # train-step graph — smaller compiles, and the towers run once even
        # for the alternating-phase step pair.
        pre = batch.get("__conds")
        if pre is not None:
            cond, student_cond, uncond = pre
        else:
            cond, student_cond, uncond = self._conditionings(frozen, batch, k_ucg)
        adapter_res = self._adapter_residuals(frozen, batch)

        b = z.shape[0]
        start_idx = sample_start_index(k_start, self.stage_pdfs[stage])
        start_t = sched.timesteps[start_idx]
        t_b = jnp.broadcast_to(start_t, (b,))

        noise = jax.random.normal(k_noise, z.shape, z.dtype)
        noisy_from_z = vp_add_noise(sched, z, noise, t_b)
        pure = noise * sched.init_noise_sigma
        is_start = (start_idx == 0).astype(z.dtype)
        noisy_init = is_start * pure + (1.0 - is_start) * noisy_from_z

        noisy_in = self.teacher_sched_mod.scale_model_input(sched, noisy_init, start_idx)
        sidepath = (
            getattr(cfg, "lora_mode", "sidepath") == "sidepath"
            and lora_is_dense_only(trainable["lora"])
        )
        if sidepath or cfg.remat_student_merge:
            student_params = None  # no merged tree (side path / remat merge)
            student_pred = self._student_forward(
                frozen, trainable["lora"], noisy_in, t_b, student_cond, adapter_res
            )
        else:
            # one merge shared by this forward AND the DMD student forward —
            # a single params-sized temp that XLA CSEs across both uses
            student_params = self.student_params(frozen, trainable["lora"])
            student_pred = self.student_module.apply(
                student_params, noisy_in, t_b, student_cond,
                **_adapter_kw(adapter_res),
            )
        c_skip, c_out = boundary_scalings(t_b, cfg.sigma_data, cfg.timestep_scaling)
        c_skip = c_skip.reshape(-1, 1, 1, 1)
        c_out = c_out.reshape(-1, 1, 1, 1)
        student_x0 = predicted_x0_eps(
            student_pred, t_b, noisy_init, self.sqrt_acp, self.sqrt_1macp, z
        )
        student_output = c_skip * noisy_init + c_out * student_x0

        g = (
            jax.random.uniform(k_guid)
            * (cfg.guidance_scale_max[stage] - cfg.guidance_scale_min[stage])
            + cfg.guidance_scale_min[stage]
        )
        teacher_output = self._teacher_rollout(
            frozen, jax.lax.stop_gradient(noisy_init), start_idx, cond, uncond,
            adapter_res, g, stage, k_roll,
        )

        distill = self._distill_loss(frozen, student_output, teacher_output)
        loss_g_total = distill * cfg.distill_loss_scale[stage]
        aux = {
            "loss/distill": distill,
            "start_timestep": start_t,
            "guidance": g,
        }

        if cfg.use_dmd_loss:
            dmd = self._dmd(
                frozen, trainable["lora"], student_params, student_output, cond,
                student_cond, uncond, adapter_res, stage, k_dmd,
            )
            loss_g_total = loss_g_total + dmd * cfg.dmd_loss_scale[stage]
            aux["loss/dmd"] = dmd

        loss_d = jnp.float32(0.0)
        if self.use_adversarial_loss:
            loss_g_adv, loss_d = self._gan(
                frozen, trainable["disc"], z, student_output, teacher_output, cond,
                adapter_res, k_gan,
            )
            loss_g_total = loss_g_total + cfg.adversarial_loss_scale[stage] * loss_g_adv
            aux["loss/gan_g"] = loss_g_adv
            aux["loss/gan_d"] = loss_d

        aux["loss/generator"] = loss_g_total
        total = loss_g_total + loss_d
        return total, aux

    # ------------------------------------------------------------------
    def sample(
        self,
        frozen: Dict[str, Any],
        lora: Optional[Dict[str, Any]],
        z: jnp.ndarray,
        batch: Dict[str, Any],
        num_steps: int = 4,
        guidance_scale: float = 1.0,
        uncond_batch: Optional[Dict[str, Any]] = None,
        decode: bool = True,
        use_teacher: bool = False,
        teacher_guidance_scale: float = 5.0,
        rng: Optional[jax.Array] = None,
        adapter_conditioning_scale: float = 1.0,
    ) -> jnp.ndarray:
        """Few-step sampling (reference ``sample``, :754-915), as one scan.

        The student scheduler gets the *teacher's* trailing timesteps
        (reference :781-789). ``guidance_scale == 1.0`` skips the uncond
        forward entirely (the published 4-NFE setting)."""
        cfg = self.config
        teacher_sched = (self.teacher_sampling_sched_mod if use_teacher else self.teacher_sched_mod)
        t_sched = teacher_sched.set_timesteps(self.sched_config, num_steps)
        if use_teacher:
            sched, mod = t_sched, self.teacher_sampling_sched_mod
            g_scale = teacher_guidance_scale
            params = frozen["teacher"]
            module = self.teacher_module
        else:
            base_sched = self.teacher_sched_mod.set_timesteps(self.sched_config, num_steps)
            try:
                sched = self.sampling_sched_mod.set_timesteps(
                    self.sched_config, timesteps=np.asarray(base_sched.timesteps)
                )
            except TypeError:
                sched = self.sampling_sched_mod.set_timesteps(self.sched_config, num_steps)
            mod = self.sampling_sched_mod
            g_scale = guidance_scale
            params = self.student_params(frozen, lora) if lora is not None else frozen["teacher"]
            module = self.student_module

        cparams = frozen.get("conditioners")
        cond = (
            self.conditioner(cparams, batch, set_ucg_rate_zero=True)
            if self.conditioner is not None
            else None
        )
        do_cfg = g_scale != 1.0
        uncond = None
        if do_cfg and self.conditioner is not None:
            if uncond_batch is not None:
                uncond = self.conditioner(cparams, uncond_batch, set_ucg_rate_zero=True)
            else:
                uncond = self.conditioner(cparams, batch, ucg_keys=cfg.ucg_keys)

        adapter_res = None
        if self.adapter is not None and cfg.adapter_input_key in batch:
            adapter_res = [
                r * adapter_conditioning_scale
                for r in self.adapter.apply(frozen["adapter"], batch[cfg.adapter_input_key])
            ]

        b = z.shape[0]
        sample = z * sched.init_noise_sigma
        has_carry = hasattr(mod, "init_state")
        stochastic = use_teacher is False and self.sampling_scheduler_name in (
            "LCMScheduler",
            "FlashFlowMatchEulerDiscreteScheduler",
            "DDPMScheduler",
            "EulerAncestralDiscreteScheduler",
        )
        rng = rng if rng is not None else jax.random.PRNGKey(0)

        cond2 = _tree_cat(cond, uncond) if do_cfg and cond is not None else cond
        adapter2 = (
            [jnp.concatenate([r, r]) for r in adapter_res]
            if (do_cfg and adapter_res)
            else adapter_res
        )

        def body(carry, i):
            s, dpm_state, key = carry
            t = sched.timesteps[i]
            inp = mod.scale_model_input(sched, s, i)
            if do_cfg:
                both = jnp.concatenate([inp, inp], axis=0)
                t2 = jnp.broadcast_to(t, (2 * b,))
                pred2 = module.apply(params, both, t2, cond2, **_adapter_kw(adapter2))
                pc, pu = jnp.split(pred2, 2, axis=0)
                pred = g_scale * pc + (1.0 - g_scale) * pu
            else:
                t1 = jnp.broadcast_to(t, (b,))
                pred = module.apply(params, inp, t1, cond2, **_adapter_kw(adapter2))
            key, sub = jax.random.split(key)
            step_key = sub if stochastic else None
            if has_carry:
                s, dpm_state = mod.step(sched, pred, i, s, dpm_state)
            else:
                s = mod.step(sched, pred, i, s, key=step_key)
            return (s, dpm_state, key), None

        n = sched.num_inference_steps
        dpm0 = mod.init_state(sample) if has_carry else jnp.zeros_like(sample)
        (sample, _, _), _ = jax.lax.scan(body, (sample, dpm0, rng), jnp.arange(n))

        if decode and self.vae is not None:
            return self.vae.apply(frozen["vae"], sample, method=self.vae.decode_latents)
        return sample

    def log_samples(
        self,
        frozen,
        lora,
        batch,
        input_shape,
        num_steps=(1, 2, 4),
        guidance_scale: float = 1.0,
        max_samples: int = 8,
        log_teacher_samples: bool = False,
        teacher_guidance_scale: float = 5.0,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Periodic sample grids (reference ``log_samples``, :917-1019)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if isinstance(num_steps, int):
            num_steps = [num_steps]
        n = min(max_samples, next(iter(batch.values())).shape[0])
        small = {k: v[:n] for k, v in batch.items()}
        logs = {}
        for steps in num_steps:
            rng, kz, ks = jax.random.split(rng, 3)
            z = jax.random.normal(kz, (n, *input_shape))
            logs[f"samples_{steps}_steps/student"] = self.sample(
                frozen, lora, z, small, num_steps=steps, guidance_scale=guidance_scale, rng=ks
            )
            if log_teacher_samples:
                logs[f"samples_{steps}_steps/teacher"] = self.sample(
                    frozen, None, z, small, num_steps=steps, use_teacher=True,
                    teacher_guidance_scale=teacher_guidance_scale, rng=ks,
                )
        return logs
