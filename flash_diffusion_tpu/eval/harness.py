"""COCO-style FID / CLIP-score evaluation loop.

Fills the reference's missing eval layer (SURVEY.md §7.11): stream a
captioned image dataset (e.g. COCO shards through data.DataPipeline),
generate 4-NFE samples for each caption batch with a FlashPipeline, embed
real + generated images (CLIP vision tower), and report CLIP-FID + CLIPScore.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .metrics import FIDStats, clip_preprocess, clip_score, frechet_distance

logger = logging.getLogger(__name__)


def evaluate(
    pipeline,  # FlashPipeline
    data: Iterator[Dict],
    vision_module,
    vision_params,
    text_embed_fn: Optional[Callable[[Dict], jnp.ndarray]] = None,
    num_inference_steps: int = 4,
    guidance_scale: float = 0.0,
    max_batches: Optional[int] = None,
    seed: int = 0,
) -> Dict[str, float]:
    """Returns {"clip_fid": …, "clip_score": …, "num_samples": …}.

    ``data`` yields batches with "image" ([-1,1] NHWC) and the pipeline's
    conditioning inputs (e.g. "text"/"text_ids"). ``text_embed_fn`` maps a
    batch to CLIP text embeds for CLIPScore (skipped when None).
    """

    @jax.jit
    def embed(images):
        out = vision_module.apply(vision_params, clip_preprocess(images))
        return out["image_embeds"]

    real_stats, fake_stats = FIDStats(), FIDStats()
    scores = []
    n = 0
    for i, batch in enumerate(data):
        if max_batches is not None and i >= max_batches:
            break
        images = jnp.asarray(batch["image"])
        fake = pipeline.generate(
            {k: v for k, v in batch.items() if k != "image"},
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            seed=seed + i,
        )
        real_emb = embed(images)
        fake_emb = embed(fake)
        real_stats.update(np.asarray(real_emb))
        fake_stats.update(np.asarray(fake_emb))
        if text_embed_fn is not None:
            scores.append(float(clip_score(fake_emb, text_embed_fn(batch))))
        n += images.shape[0]
        if i % 10 == 0:
            logger.info("eval batch %d (%d samples)", i, n)

    mu_r, cov_r = real_stats.finalize()
    mu_f, cov_f = fake_stats.finalize()
    out = {
        "clip_fid": frechet_distance(mu_r, cov_r, mu_f, cov_f),
        "num_samples": n,
    }
    if scores:
        out["clip_score"] = float(np.mean(scores))
    return out
