"""Sample/metric logging callbacks.

Re-derivation of the reference's WandbSampleLogger
(reference: src/flash/trainer/loggers.py:17-138): every N steps, run
few-step sampling, build image grids ([-1,1] → uint8, 4 per row), and emit
them — to wandb when available, always to PNG files on disk (rank 0 only).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax
import numpy as np

logger = logging.getLogger(__name__)

try:  # wandb is optional in this environment
    import wandb  # type: ignore

    _HAS_WANDB = True
except Exception:  # pragma: no cover
    wandb = None
    _HAS_WANDB = False


def make_grid(images: np.ndarray, nrow: int = 4) -> np.ndarray:
    """[-1,1] NHWC float batch → one HWC uint8 grid (nrow per row)."""
    images = np.asarray(images)
    images = np.clip((images + 1.0) * 127.5, 0, 255).astype(np.uint8)
    b, h, w, c = images.shape
    ncol = nrow
    nrows = -(-b // ncol)
    pad = nrows * ncol - b
    if pad:
        images = np.concatenate([images, np.zeros((pad, h, w, c), np.uint8)])
    return (
        images.reshape(nrows, ncol, h, w, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(nrows * h, ncol * w, c)
    )


def save_png(path: str, array: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(array).save(path)


class SampleLogger:
    """Callback for TrainingPipeline.fit: periodic sample grids + scalars.

    Rank-0 only (reference @rank_zero_only, loggers.py:52,79).
    """

    def __init__(
        self,
        batch_provider,  # () -> conditioning batch for sampling
        input_shape: Sequence[int],  # latent (H, W, C)
        out_dir: str = "samples",
        every_n_steps: int = 200,
        num_steps=(1, 2, 4),
        guidance_scale: float = 1.0,
        log_teacher_samples: bool = False,
        use_wandb: Optional[bool] = None,
        use_ema: bool = True,  # sample the EMA student when it exists
    ):
        self.batch_provider = batch_provider
        self.input_shape = tuple(input_shape)
        self.out_dir = out_dir
        self.every_n_steps = every_n_steps
        self.num_steps = num_steps
        self.guidance_scale = guidance_scale
        self.log_teacher_samples = log_teacher_samples
        self.use_wandb = _HAS_WANDB if use_wandb is None else use_wandb
        self.use_ema = use_ema

    def __call__(self, pipeline, state, aux, step: int) -> None:
        if step % self.every_n_steps or jax.process_index() != 0:
            return
        batch = self.batch_provider()
        lora = state.lora
        if self.use_ema and jax.tree_util.tree_leaves(getattr(state, "ema", ())):
            lora = state.ema
        step_dir = os.path.join(self.out_dir, f"step{step:08d}")
        # input-image echo + caption table (reference trainer/trainer.py:
        # 227-251 logs the model input and text keys alongside the samples)
        if hasattr(batch.get("image", None), "shape"):
            grid = make_grid(np.asarray(batch["image"]))
            save_png(os.path.join(step_dir, "inputs.png"), grid)
            if self.use_wandb and wandb is not None and wandb.run is not None:
                wandb.log({"inputs": wandb.Image(grid)}, step=step)
        texts = batch.get("text")
        if isinstance(texts, (list, tuple)) and texts:
            os.makedirs(step_dir, exist_ok=True)
            with open(os.path.join(step_dir, "text.txt"), "w") as f:
                f.write("\n".join(str(t) for t in texts))
            if self.use_wandb and wandb is not None and wandb.run is not None:
                wandb.log(
                    {"text": wandb.Table(columns=["text"], data=[[t] for t in texts])},
                    step=step,
                )
        # sampling_frozen(): with text_encoder_offload on, pipeline.frozen
        # has no "conditioners" — this context places the towers for the call
        with pipeline.sampling_frozen() as frozen:
            logs = pipeline.model.log_samples(
                frozen,
                lora,
                batch,
                input_shape=self.input_shape,
                num_steps=self.num_steps,
                guidance_scale=self.guidance_scale,
                log_teacher_samples=self.log_teacher_samples,
                rng=jax.random.PRNGKey(step),
            )
        for name, images in logs.items():
            grid = make_grid(np.asarray(images))
            fname = os.path.join(self.out_dir, f"step{step:08d}", name.replace("/", "_") + ".png")
            save_png(fname, grid)
            if self.use_wandb and wandb is not None and wandb.run is not None:
                wandb.log({name: wandb.Image(grid)}, step=step)
        logger.info("step %d: wrote %d sample grids to %s", step, len(logs), self.out_dir)


class QualityValidator:
    """Sample-based quality signal inside fit() (the reference's long runs
    have none either — eval_coco.py is manual; this closes that gap): every
    N steps, sample few-step images from held-out conditioning batches and
    report the Fréchet distance between feature embeddings of reals vs
    samples, plus CLIPScore when ``text_embed_fn`` is given.

    ``embed_fn``: jitted [-1,1] NHWC images → [B, D] features — the CLIP
    vision tower or InceptionV3-pool3 (eval/harness.py builds both), or any
    cheap feature net for toy runs. Metrics land in the INFO log, wandb
    (when live), and ``self.history`` for tests/callers.
    """

    def __init__(
        self,
        batch_provider,  # () -> iterator of held-out batches w/ "image"
        input_shape: Sequence[int],  # latent (H, W, C)
        embed_fn,
        every_n_steps: int = 1000,
        num_batches: int = 4,
        num_steps: int = 4,
        guidance_scale: float = 1.0,
        text_embed_fn=None,
        use_ema: bool = True,
        use_wandb: Optional[bool] = None,
    ):
        self.batch_provider = batch_provider
        self.input_shape = tuple(input_shape)
        self.embed_fn = embed_fn
        self.every_n_steps = every_n_steps
        self.num_batches = num_batches
        self.num_steps = num_steps
        self.guidance_scale = guidance_scale
        self.text_embed_fn = text_embed_fn
        self.use_ema = use_ema
        self.use_wandb = _HAS_WANDB if use_wandb is None else use_wandb
        self.history = []

    def __call__(self, pipeline, state, aux, step: int) -> None:
        if step % self.every_n_steps or jax.process_index() != 0:
            return
        from ..eval.metrics import FIDStats, clip_score, frechet_distance

        lora = state.lora
        if self.use_ema and jax.tree_util.tree_leaves(getattr(state, "ema", ())):
            lora = state.ema
        real_s, fake_s = FIDStats(), FIDStats()
        scores = []
        with pipeline.sampling_frozen() as frozen:
            for i, batch in enumerate(self.batch_provider()):
                if i >= self.num_batches:
                    break
                n = np.asarray(batch["image"]).shape[0]
                z = jax.random.normal(
                    jax.random.fold_in(jax.random.PRNGKey(step), i),
                    (n, *self.input_shape),
                )
                fake = pipeline.model.sample(
                    frozen, lora, z, batch,
                    num_steps=self.num_steps, guidance_scale=self.guidance_scale,
                    rng=jax.random.PRNGKey(i),
                )
                real_emb = self.embed_fn(np.asarray(batch["image"]))
                fake_emb = self.embed_fn(fake)
                real_s.update(np.asarray(real_emb))
                fake_s.update(np.asarray(fake_emb))
                if self.text_embed_fn is not None:
                    scores.append(float(clip_score(fake_emb, self.text_embed_fn(batch))))
        mu_r, cov_r = real_s.finalize()
        mu_f, cov_f = fake_s.finalize()
        metrics = {"val/feature_fd": frechet_distance(mu_r, cov_r, mu_f, cov_f)}
        if scores:
            metrics["val/clip_score"] = float(np.mean(scores))
        self.history.append((step, metrics))
        logger.info("step %d quality %s", step, metrics)
        if self.use_wandb and wandb is not None and wandb.run is not None:
            wandb.log(metrics, step=step)


class MetricLogger:
    """Scalar metric callback: logging module + optional wandb
    (reference logs loss at INFO every step, trainer/trainer.py:177-180 —
    here throttled to every_n_steps)."""

    def __init__(self, every_n_steps: int = 50, use_wandb: Optional[bool] = None):
        self.every_n_steps = every_n_steps
        self.use_wandb = _HAS_WANDB if use_wandb is None else use_wandb

    def __call__(self, pipeline, state, aux, step: int) -> None:
        if step % self.every_n_steps or jax.process_index() != 0:
            return
        scalars = {k: float(v) for k, v in aux.items() if np.ndim(v) == 0}
        if self.use_wandb and wandb is not None and wandb.run is not None:
            wandb.log(scalars, step=step)


class CheckpointCallback:
    def __init__(self, directory: str, every_n_steps: int = 5000, keep=None):
        self.directory = directory
        self.every_n_steps = every_n_steps
        self.keep = keep

    def __call__(self, pipeline, state, aux, step: int) -> None:
        if step % self.every_n_steps:
            return
        from .checkpoint import save_state

        save_state(self.directory, step, jax.device_get(state), keep=self.keep)
        logger.info("step %d: checkpoint saved to %s", step, self.directory)
