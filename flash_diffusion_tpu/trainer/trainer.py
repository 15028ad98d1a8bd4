"""Generic training pipeline: one jitted step, two optimizers, mesh DP.

TPU-native re-design of the reference's LightningModule trainer
(reference: src/flash/trainer/trainer.py:16-251):

- ``configure_optimizers``'s regex param partition + freeze (:76-139) becomes
  the LoRA/discriminator param-tree split — frozen params never enter the
  optimizer;
- the manual-GAN double forward (:187-218, one full model forward per
  optimizer) becomes ONE jitted step producing both gradients from a shared
  rollout (stop_gradient partitioning in distill.losses); reference parity
  alternation (``gan_update_mode="alternating"``) compiles TWO step variants
  — a generator step that differentiates only the LoRA tree and a
  discriminator step that differentiates only the disc tree — so each parity
  pays exactly one backward instead of masking out half of two;
- DDP/NCCL (SURVEY.md §2.2) becomes a data-axis mesh: batches sharded on
  entry, gradients psum'd by XLA inside the jitted step;
- an EMA student (the north-star sampling/export target; the reference's
  ``update_ema`` helper is dead code, src/flash/models/utils.py:362-377) is
  a TrainState leaf updated inside the jitted step when
  ``TrainingConfig.ema_decay`` is set;
- ``validation_step`` (reference trainer/trainer.py:220-225) becomes
  ``evaluate()``: loss aux on held-out batches, driven from ``fit`` at
  ``val_every_n_steps`` cadence.
"""

from __future__ import annotations

import contextlib
import dataclasses
import logging
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..distill.losses import clip_disc_weights
from ..parallel import create_mesh, replicate, shard_batch, shard_params_fsdp
from ..utils.ema import init_ema, update_ema
from .training_config import TrainingConfig

logger = logging.getLogger(__name__)


def export_lora(state: "TrainState") -> Any:
    """LoRA tree to publish: the EMA student when tracked, else the live
    student (the north star names the EMA student as the export target)."""
    return state.ema if jax.tree_util.tree_leaves(state.ema) else state.lora


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    lora: Any
    disc: Any
    opt_g: Any
    opt_d: Any
    step: jnp.ndarray
    rng: jax.Array
    ema: Any = ()  # EMA of the LoRA tree; () when ema_decay is unset


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
        frozen_dtype=None,  # e.g. jnp.bfloat16: storage dtype for frozen trees
        text_encoder_offload: int = 0,  # batches per encode burst; 0 = resident
    ):
        self.model = model
        self.config = config
        self.mesh = mesh if mesh is not None else create_mesh()
        if frozen_dtype is not None:
            # The model bodies compute in bf16 (flax promote_dtype casts
            # kernels at use), so fp32 storage of the FROZEN trees (teacher/
            # vae/text encoders) only doubles their HBM reads in the K-step
            # rollout and their resident footprint — cast float leaves to the
            # storage dtype up front. Numerics are unchanged: the same bf16
            # cast already happened per-op. Trainable/optimizer/EMA state
            # stays fp32.
            frozen = jax.tree_util.tree_map(
                lambda x: x.astype(frozen_dtype)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                frozen,
            )
        self._frozen_dtype = frozen_dtype
        self._frozen_sharding = frozen_sharding
        # Text-encoder offload (the TPU-native answer to the reference's
        # accelerate cpu_offload, flash_sd3/flash_diffusion_model.py:219-220):
        # text towers (CLIP-L+G + T5-XXL ≈ 11 G bf16 for SD3) live on HOST;
        # every `text_encoder_offload` batches fit() transfers them to HBM
        # once, encodes that whole burst of batches in the staged cond jit,
        # and frees them again. Peak HBM = max(encode-phase, train-phase)
        # instead of their sum, and the 11 G PCIe transfer amortizes over
        # the burst. Conditioning outputs are ~MBs/batch and stay resident.
        self._text_offload = int(text_encoder_offload)
        self._host_conditioners = None
        if self._text_offload and "conditioners" in frozen:
            frozen = dict(frozen)
            self._host_conditioners = jax.tree_util.tree_map(
                lambda x: np.asarray(jax.device_get(x)), frozen.pop("conditioners")
            )
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
        self._step_fns: Dict[Tuple[int, Optional[str]], Callable] = {}
        self._eval_fns: Dict[int, Callable] = {}
        # Staged conditioning: jit the 3 conditioner passes separately so the
        # text-encoder towers live in their own (cachable) compile, not the
        # train-step graph — the SDXL/SD3 step graph with in-graph encoders
        # is large enough to OOM the XLA compiler, and the towers' outputs
        # are reused by both alternating phases.
        if getattr(model, "conditioner", None) is not None:
            self._cond_fn = jax.jit(
                lambda frozen, batch, rng: model._conditionings(frozen, batch, rng)
            )
        else:
            self._cond_fn = None
        # Same staging for the (stop-grad, frozen) VAE encode.
        if getattr(model, "vae", None) is not None:
            self._encode_fn = jax.jit(
                lambda frozen, batch, rng: model._encode(frozen, batch, rng)
            )
        else:
            self._encode_fn = None
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
            ema=init_ema(self._lora_init) if self.config.ema_decay else (),
        )
        return replicate(state, self.mesh)

    # ------------------------------------------------------------------
    def _build_step(self, stage: int, phase: Optional[str]) -> Callable:
        """phase: None = simultaneous (both updates from the shared-rollout
        grads), "g"/"d" = alternating parity variants differentiating only
        the active tree (the inactive backward never enters the graph)."""
        model = self.model
        tx_g, tx_d = self.tx_g, self.tx_d
        is_wgan = self.is_wgan
        wgan_clip = self.config.wgan_clip
        ema_decay = self.config.ema_decay
        accum = self.config.gradient_accumulation_steps

        def step_fn(state: TrainState, frozen, batch):
            rng, sub = jax.random.split(state.rng)

            if phase == "g":
                def loss_fn(lora):
                    return model.losses(
                        {"lora": lora, "disc": state.disc}, frozen, batch, sub, stage
                    )

                (_, aux), g_grads = jax.value_and_grad(loss_fn, has_aux=True)(state.lora)
                d_grads = None
            elif phase == "d":
                def loss_fn(disc):
                    return model.losses(
                        {"lora": state.lora, "disc": disc}, frozen, batch, sub, stage
                    )

                (_, aux), d_grads = jax.value_and_grad(loss_fn, has_aux=True)(state.disc)
                g_grads = None
            else:
                def loss_fn(trainable):
                    return model.losses(trainable, frozen, batch, sub, stage)

                (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    {"lora": state.lora, "disc": state.disc}
                )
                g_grads, d_grads = grads["lora"], grads["disc"]

            lora, opt_g = state.lora, state.opt_g
            if g_grads is not None:
                up_g, opt_g = tx_g.update(g_grads, state.opt_g, state.lora)
                lora = jax.tree_util.tree_map(
                    lambda p, u: p + u.astype(p.dtype), state.lora, up_g
                )

            disc, opt_d = state.disc, state.opt_d
            if (
                d_grads is not None
                and tx_d is not None
                and jax.tree_util.tree_leaves(state.disc)
            ):
                up_d, opt_d = tx_d.update(d_grads, state.opt_d, state.disc)
                disc = jax.tree_util.tree_map(
                    lambda p, u: p + u.astype(p.dtype), state.disc, up_d
                )
                if is_wgan:
                    disc = clip_disc_weights(disc, wgan_clip)

            ema = state.ema
            # "d"-phase steps leave the lora tree untouched — decaying the EMA
            # there would halve its time constant vs the simultaneous mode.
            # Same logic under gradient accumulation: only decay on boundary
            # micro-steps, read from the MultiSteps counter itself
            # (mini_step wraps to 0 right after an application) — a global
            # step-parity test would never fire in alternating mode, where
            # MultiSteps counts only this optimizer's own calls.
            if ema_decay and phase != "d" and jax.tree_util.tree_leaves(state.ema):
                new_ema = update_ema(state.ema, lora, ema_decay)
                if accum > 1:
                    boundary = getattr(opt_g, "mini_step", 0) == 0
                    new_ema = jax.tree_util.tree_map(
                        lambda e, n: jnp.where(boundary, n, e), state.ema, new_ema
                    )
                ema = new_ema

            new_state = TrainState(
                lora=lora, disc=disc, opt_g=opt_g, opt_d=opt_d,
                step=state.step + 1, rng=rng, ema=ema,
            )
            return new_state, aux

        return jax.jit(step_fn, donate_argnums=(0,))

    def _merged_teacher(self, lora):
        """Merge the student LoRA into the teacher tree (switch_teacher)
        while preserving the frozen-tree memory regime: the merge runs under
        jit with a cast back to ``frozen_dtype`` (no eager fp32 promotion of
        a bf16 teacher — that would double its HBM and force every cached
        step fn to recompile on the dtype change), and the result is
        re-placed with the configured frozen sharding (fsdp or replicated)."""
        dtype = self._frozen_dtype

        def merge(frozen, lora):
            merged = self.model.student_params(frozen, lora)
            if dtype is not None:
                merged = jax.tree_util.tree_map(
                    lambda x: x.astype(dtype)
                    if jnp.issubdtype(x.dtype, jnp.floating)
                    else x,
                    merged,
                )
            return merged

        merged = jax.jit(merge)(self.frozen, lora)
        if self._frozen_sharding == "fsdp":
            return shard_params_fsdp(merged, self.mesh)
        return replicate(merged, self.mesh)

    def step_fn_for_stage(self, stage: int, phase: Optional[str] = None) -> Callable:
        key = (stage, phase)
        if key not in self._step_fns:
            self._step_fns[key] = self._build_step(stage, phase)
        return self._step_fns[key]

    # ------------------------------------------------------------------
    def _build_eval(self, stage: int) -> Callable:
        model = self.model

        def eval_fn(state: TrainState, frozen, batch):
            _, aux = model.losses(
                {"lora": state.lora, "disc": state.disc},
                frozen,
                batch,
                jax.random.PRNGKey(0),  # fixed rng → comparable across evals
                stage,
            )
            return aux

        return jax.jit(eval_fn)

    @staticmethod
    def _numeric_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
        """Strip non-numeric leaves (raw text, __key__, …) — jitted fns
        consume token ids / arrays only."""
        return {
            k: v
            for k, v in batch.items()
            if isinstance(v, (np.ndarray, jnp.ndarray))
            or (hasattr(v, "dtype") and hasattr(v, "shape"))
        }

    def _placed_conditioners(self):
        """Transfer the host-resident text towers to the mesh (burst
        start); caller drops the returned tree to free the HBM."""
        tree = {"conditioners": self._host_conditioners}
        if self._frozen_sharding == "fsdp":
            return shard_params_fsdp(tree, self.mesh)
        return replicate(tree, self.mesh)

    @contextlib.contextmanager
    def sampling_frozen(self):
        """Frozen tree with text towers present, for sample/eval paths.

        With ``text_encoder_offload`` on, ``self.frozen`` has NO
        "conditioners" entry (they live on host between encode bursts), so
        callbacks that call ``model.sample``/``log_samples`` directly must
        use this context instead of ``pipeline.frozen`` — it places the
        towers for the duration of the block and frees them on exit."""
        if self._text_offload and self._host_conditioners is not None:
            dev = self._placed_conditioners()
            try:
                yield {**self.frozen, **dev}
            finally:
                del dev
        else:
            yield self.frozen

    def _cond_bursts(self, data, step0: int):
        """Yield batches with conditioning precomputed in encode bursts:
        towers on HBM only while a burst is encoding (see __init__)."""
        import itertools

        it = iter(data)
        step = step0
        while True:
            chunk = list(itertools.islice(it, self._text_offload))
            if not chunk:
                return
            dev = self._placed_conditioners()
            frozen_enc = {**self.frozen, **dev}
            out = []
            for b in chunk:
                rng = jax.random.fold_in(
                    jax.random.PRNGKey(self.config.seed ^ 0x5EED), step
                )
                nb = shard_batch(self._numeric_batch(b), self.mesh)
                conds = self._cond_fn(frozen_enc, nb, rng)
                out.append((b, conds))
                step += 1
            jax.block_until_ready([c for _, c in out])
            del dev, frozen_enc  # frees the towers' HBM
            # The host batch is yielded (not the sharded `nb`), so fit()
            # re-transfers the images once more — deliberate: retaining
            # every nb for the burst would hold burst_size × image-batch
            # HBM (this mode exists to SAVE HBM), while the extra PCIe
            # copy is ~ms against multi-second distill steps.
            for b, conds in out:
                b = dict(b)
                b["__conds_pre"] = conds
                yield b

    def evaluate(
        self,
        data: Iterator[Dict[str, Any]],
        state: TrainState,
        stage: int = 0,
        max_batches: int = 8,
    ) -> Dict[str, float]:
        """Validation pass (reference TrainingPipeline.validation_step,
        trainer/trainer.py:220-225): average loss aux over held-out batches,
        no parameter updates, fixed eval rng."""
        if stage not in self._eval_fns:
            self._eval_fns[stage] = self._build_eval(stage)
        sums: Dict[str, float] = {}
        n = 0
        frozen_enc = self.frozen
        dev = None
        if self._text_offload and self._host_conditioners is not None:
            dev = self._placed_conditioners()  # one burst for the eval pass
            frozen_enc = {**self.frozen, **dev}
        for i, batch in enumerate(data):
            if i >= max_batches:
                break
            batch = shard_batch(self._numeric_batch(batch), self.mesh)
            if self._cond_fn is not None:
                batch["__conds"] = self._cond_fn(
                    frozen_enc, batch, jax.random.PRNGKey(0)
                )
            if self._encode_fn is not None:
                batch["__z"] = self._encode_fn(
                    self.frozen, batch, jax.random.PRNGKey(1)
                )
            aux = self._eval_fns[stage](state, self.frozen, batch)
            for k, v in aux.items():
                if jnp.ndim(v) == 0:
                    sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        return {f"val/{k}": v / max(n, 1) for k, v in sums.items()}

    # ------------------------------------------------------------------
    def fit(
        self,
        data: Iterator[Dict[str, Any]],
        state: Optional[TrainState] = None,
        callbacks=(),
        max_steps: Optional[int] = None,
        eval_data: Optional[Callable[[], Iterator[Dict[str, Any]]]] = None,
    ) -> TrainState:
        """Training loop: stage rotation (one compile per stage), per-step
        metrics, avg batch-time every 10 batches (reference
        trainer/trainer.py:62-74), callbacks for sampling/checkpointing,
        periodic validation when ``eval_data`` (a factory returning a fresh
        iterator) and ``val_every_n_steps`` are set."""
        cfg = self.config
        state = state if state is not None else self.init_state()
        max_steps = max_steps or cfg.max_steps or sum(self.model.config.num_iterations_per_K)
        t_window = time.perf_counter()
        step0 = int(state.step)
        if self._text_offload and self._cond_fn is not None:
            data = self._cond_bursts(data, step0)
        prev_stage = self.model.stage_for_iteration(max(step0, 1))
        for i, batch in enumerate(data):
            # host-side step counter: step_fn increments state.step by
            # exactly 1, so step0 + i is exact and avoids the per-step
            # device sync an int(state.step) pull would force (it blocks
            # async dispatch — the device would drain between steps)
            step = step0 + i
            if step >= max_steps:
                break
            stage = self.model.stage_for_iteration(step + 1)
            if (
                stage != prev_stage
                and getattr(self.model.config, "switch_teacher", False)
                and self.model.config.K[stage] != self.model.config.K[prev_stage]
            ):
                # teacher ← merged student at the stage boundary
                merged = self._merged_teacher(state.lora)
                self.frozen = dict(self.frozen)
                self.frozen["teacher"] = merged
                self.frozen.pop("student_base", None)
                logger.info("stage %d: switched teacher to merged student", stage)
            prev_stage = stage
            pre_conds = batch.pop("__conds_pre", None) if isinstance(batch, dict) else None
            batch = shard_batch(self._numeric_batch(batch), self.mesh)
            stage_rng = jax.random.fold_in(jax.random.PRNGKey(cfg.seed ^ 0x5EED), step)
            if pre_conds is not None:
                batch["__conds"] = pre_conds
            elif self._cond_fn is not None:
                batch["__conds"] = self._cond_fn(self.frozen, batch, stage_rng)
            if self._encode_fn is not None:
                batch["__z"] = self._encode_fn(
                    self.frozen, batch, jax.random.fold_in(stage_rng, 1)
                )
            phase = ("g" if step % 2 == 0 else "d") if self.alternating else None
            if os.environ.get("FLASH_TPU_COMPILE_ONLY"):
                # diagnostic: AOT-compile the step and report its memory
                # needs without executing (HBM OOMs at execution are async
                # and detail-free through remote runtimes)
                compiled = (
                    self.step_fn_for_stage(stage, phase)
                    .lower(state, self.frozen, batch)
                    .compile()
                )
                ma = compiled.memory_analysis()
                print("step memory_analysis:", ma, flush=True)
                return state
            state, aux = self.step_fn_for_stage(stage, phase)(state, self.frozen, batch)

            if (step + 1) % 10 == 0 and jax.process_index() == 0:
                jax.block_until_ready(state.step)
                dt = (time.perf_counter() - t_window) / max(step + 1 - step0, 1)
                logger.info("step %d stage %d avg_batch_time %.3fs", step + 1, stage, dt)
            if (step + 1) % cfg.log_every_n_steps == 0 and jax.process_index() == 0:
                metrics = {k: float(v) for k, v in aux.items() if jnp.ndim(v) == 0}
                logger.info("step %d %s", step + 1, metrics)
            if (
                eval_data is not None
                and cfg.val_every_n_steps
                and (step + 1) % cfg.val_every_n_steps == 0
            ):
                val = self.evaluate(
                    eval_data(), state, stage, max_batches=cfg.val_batches
                )
                if jax.process_index() == 0:
                    logger.info("step %d %s", step + 1, val)
            for cb in callbacks:
                cb(self, state, aux, step + 1)
        return state
