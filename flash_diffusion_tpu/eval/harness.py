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
    vision_module=None,
    vision_params=None,
    text_embed_fn: Optional[Callable[[Dict], jnp.ndarray]] = None,
    num_inference_steps: int = 4,
    guidance_scale: float = 0.0,
    max_batches: Optional[int] = None,
    seed: int = 0,
    inception_params=None,
    inception_fid_variant: bool = False,
) -> Dict[str, float]:
    """Returns {"fid": …, "clip_fid": …, "clip_score": …, "num_samples": …}.

    ``data`` yields batches with "image" ([-1,1] NHWC) and the pipeline's
    conditioning inputs (e.g. "text"/"text_ids"). ``text_embed_fn`` maps a
    batch to CLIP text embeds for CLIPScore (skipped when None).
    ``inception_params`` (models.inception.load_inception_v3) enables
    InceptionV3-pool3 FID ("fid"); set ``inception_fid_variant=True`` when
    the params come from the pt_inception-2015-12-05 checkpoint to apply
    the canonical pytorch-fid block semantics (published-table-comparable
    FID). The CLIP vision tower gives "clip_fid" + "clip_score". At least
    one extractor must be provided.
    """
    if vision_params is None and inception_params is None:
        raise ValueError("provide vision_params (CLIP) and/or inception_params")

    embed = None
    if vision_params is not None:

        @jax.jit
        def embed(images):
            out = vision_module.apply(vision_params, clip_preprocess(images))
            return out["image_embeds"]

    embed_incep = None
    if inception_params is not None:
        from ..models.inception import InceptionV3Pool3
        from ..models.inception import preprocess as incep_preprocess

        incep = InceptionV3Pool3(fid_variant=inception_fid_variant)

        @jax.jit
        def embed_incep(images):
            return incep.apply(inception_params, incep_preprocess(images))

    real_stats, fake_stats = FIDStats(), FIDStats()
    real_i, fake_i = FIDStats(), FIDStats()
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
        if embed is not None:
            real_emb = embed(images)
            fake_emb = embed(fake)
            real_stats.update(np.asarray(real_emb))
            fake_stats.update(np.asarray(fake_emb))
            if text_embed_fn is not None:
                scores.append(float(clip_score(fake_emb, text_embed_fn(batch))))
        if embed_incep is not None:
            real_i.update(np.asarray(embed_incep(images)))
            fake_i.update(np.asarray(embed_incep(fake)))
        n += images.shape[0]
        if i % 10 == 0:
            logger.info("eval batch %d (%d samples)", i, n)

    out: Dict[str, float] = {"num_samples": n}
    if embed is not None:
        mu_r, cov_r = real_stats.finalize()
        mu_f, cov_f = fake_stats.finalize()
        out["clip_fid"] = frechet_distance(mu_r, cov_r, mu_f, cov_f)
    if embed_incep is not None:
        mu_r, cov_r = real_i.finalize()
        mu_f, cov_f = fake_i.finalize()
        out["fid"] = frechet_distance(mu_r, cov_r, mu_f, cov_f)
    if scores:
        out["clip_score"] = float(np.mean(scores))
    return out
