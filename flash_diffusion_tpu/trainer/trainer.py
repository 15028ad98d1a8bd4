"""Generic training pipeline: one jitted step, two optimizers, mesh DP.

TPU-native re-design of the reference's LightningModule trainer
(reference: src/flash/trainer/trainer.py:16-251):

- ``configure_optimizers``'s regex param partition + freeze (:76-139) becomes
  the LoRA/discriminator param-tree split — frozen params never enter the
  optimizer;
- the manual-GAN double forward (:187-218, one full model forward per
  optimizer) becomes ONE jitted step producing both gradients from a shared
  rollout (stop_gradient partitioning in distill.losses); reference parity
  alternation is preserved under ``gan_update_mode="alternating"`` by gating
  update application on step parity;
- DDP/NCCL (SURVEY.md §2.2) becomes a data-axis mesh: batches sharded on
  entry, gradients psum'd by XLA inside the jitted step.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..distill.losses import clip_disc_weights
from ..parallel import create_mesh, replicate, shard_batch, shard_params_fsdp
from .training_config import TrainingConfig

logger = logging.getLogger(__name__)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    lora: Any
    disc: Any
    opt_g: Any
    opt_d: Any
    step: jnp.ndarray
    rng: jax.Array


class TrainingPipeline:
    """Drives a FlashDiffusion(-SD3) model. Pure step functions; the Python
    loop only feeds batches, rotates stages, logs, and checkpoints."""

    def __init__(
        self,
        model,
        config: TrainingConfig,
        frozen: Dict[str, Any],
        lora_init: Dict[str, Any],
        disc_init: Optional[Dict[str, Any]] = None,
        mesh=None,
        frozen_sharding: str = "replicated",  # replicated | fsdp
    ):
        self.model = model
        self.config = config
        self.mesh = mesh if mesh is not None else create_mesh()
        if frozen_sharding == "fsdp":
            # shard big frozen weights (teacher/vae/text encoders) over the
            # data axis; XLA gathers on use — memory scales with devices
            self.frozen = shard_params_fsdp(frozen, self.mesh)
        else:
            self.frozen = replicate(frozen, self.mesh)
        self.tx_g = config.build_optimizer(0)
        self.tx_d = config.build_optimizer(1) if len(config.optimizers_name) > 1 else None
        self._lora_init = lora_init
        self._disc_init = disc_init if disc_init is not None else {}
        self._step_fns: Dict[int, Callable] = {}
        self.alternating = getattr(model.config, "gan_update_mode", "simultaneous") == "alternating"
        self.is_wgan = getattr(model.config, "gan_loss_type", "") == "wgan"

    def init_state(self, rng: Optional[jax.Array] = None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.config.seed)
        state = TrainState(
            lora=self._lora_init,
            disc=self._disc_init,
            opt_g=self.tx_g.init(self._lora_init),
            opt_d=self.tx_d.init(self._disc_init) if self.tx_d else (),
            step=jnp.int32(0),
            rng=rng,
        )
        return replicate(state, self.mesh)

    # ------------------------------------------------------------------
    def _build_step(self, stage: int) -> Callable:
        model = self.model
        tx_g, tx_d = self.tx_g, self.tx_d
        alternating = self.alternating
        is_wgan = self.is_wgan
        wgan_clip = self.config.wgan_clip

        def step_fn(state: TrainState, frozen, batch):
            rng, sub = jax.random.split(state.rng)

            def loss_fn(trainable):
                return model.losses(trainable, frozen, batch, sub, stage)

            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                {"lora": state.lora, "disc": state.disc}
            )

            if alternating:
                g_on = (state.step % 2 == 0).astype(jnp.float32)
                d_on = 1.0 - g_on
            else:
                g_on = d_on = jnp.float32(1.0)

            up_g, opt_g = tx_g.update(grads["lora"], state.opt_g, state.lora)
            lora = jax.tree_util.tree_map(
                lambda p, u: p + g_on.astype(p.dtype) * u, state.lora, up_g
            )
            if alternating:
                opt_g = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(g_on > 0, new, old) if hasattr(new, "shape") else new,
                    opt_g, state.opt_g,
                )

            disc, opt_d = state.disc, state.opt_d
            if tx_d is not None and jax.tree_util.tree_leaves(state.disc):
                up_d, opt_d = tx_d.update(grads["disc"], state.opt_d, state.disc)
                disc = jax.tree_util.tree_map(
                    lambda p, u: p + d_on.astype(p.dtype) * u, state.disc, up_d
                )
                if alternating:
                    opt_d = jax.tree_util.tree_map(
                        lambda new, old: jnp.where(d_on > 0, new, old) if hasattr(new, "shape") else new,
                        opt_d, state.opt_d,
                    )
                if is_wgan:
                    disc = clip_disc_weights(disc, wgan_clip)

            new_state = TrainState(
                lora=lora, disc=disc, opt_g=opt_g, opt_d=opt_d,
                step=state.step + 1, rng=rng,
            )
            return new_state, aux

        return jax.jit(step_fn, donate_argnums=(0,))

    def step_fn_for_stage(self, stage: int) -> Callable:
        if stage not in self._step_fns:
            self._step_fns[stage] = self._build_step(stage)
        return self._step_fns[stage]

    # ------------------------------------------------------------------
    def fit(
        self,
        data: Iterator[Dict[str, Any]],
        state: Optional[TrainState] = None,
        callbacks=(),
        max_steps: Optional[int] = None,
    ) -> TrainState:
        """Training loop: stage rotation (one compile per stage), per-step
        metrics, avg batch-time every 10 batches (reference
        trainer/trainer.py:62-74), callbacks for sampling/checkpointing."""
        cfg = self.config
        state = state if state is not None else self.init_state()
        max_steps = max_steps or cfg.max_steps or sum(self.model.config.num_iterations_per_K)
        t_window = time.perf_counter()
        step0 = int(state.step)
        prev_stage = self.model.stage_for_iteration(max(int(state.step), 1))
        for i, batch in enumerate(data):
            step = int(state.step)
            if step >= max_steps:
                break
            stage = self.model.stage_for_iteration(step + 1)
            if (
                stage != prev_stage
                and getattr(self.model.config, "switch_teacher", False)
                and self.model.config.K[stage] != self.model.config.K[prev_stage]
            ):
                # teacher ← merged student at the stage boundary
                merged = self.model.student_params(self.frozen, state.lora)
                self.frozen = dict(self.frozen)
                self.frozen["teacher"] = merged
                self.frozen.pop("student_base", None)
                logger.info("stage %d: switched teacher to merged student", stage)
            prev_stage = stage
            # strip non-numeric leaves (raw text, __key__, …) — the jitted
            # step consumes token ids / arrays only
            batch = {
                k: v
                for k, v in batch.items()
                if isinstance(v, (np.ndarray, jnp.ndarray))
                or (hasattr(v, "dtype") and hasattr(v, "shape"))
            }
            batch = shard_batch(batch, self.mesh)
            state, aux = self.step_fn_for_stage(stage)(state, self.frozen, batch)

            if (step + 1) % 10 == 0 and jax.process_index() == 0:
                jax.block_until_ready(state.step)
                dt = (time.perf_counter() - t_window) / max(step + 1 - step0, 1)
                logger.info("step %d stage %d avg_batch_time %.3fs", step + 1, stage, dt)
            if (step + 1) % cfg.log_every_n_steps == 0 and jax.process_index() == 0:
                metrics = {k: float(v) for k, v in aux.items() if jnp.ndim(v) == 0}
                logger.info("step %d %s", step + 1, metrics)
            for cb in callbacks:
                cb(self, state, aux, step + 1)
        return state
