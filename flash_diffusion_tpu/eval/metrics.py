"""Quality metrics: FID statistics/distance and CLIP score.

The reference publishes COCO FID / CLIP-score claims without in-repo eval
code (reference: README.md:57; SURVEY.md §6 — self-measured baseline
required). This module provides the math + streaming accumulation; feature
extractors are pluggable (CLIP vision tower in models/vision.py; canonical
InceptionV3-pool3 import is tracked for a later round — CLIP-FID is the
in-framework default and correlates strongly with Inception-FID).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class FIDStats:
    """Streaming mean/covariance accumulator over feature batches."""

    n: int = 0
    sum: Optional[np.ndarray] = None
    outer: Optional[np.ndarray] = None

    def update(self, feats: np.ndarray) -> "FIDStats":
        feats = np.asarray(feats, np.float64)
        if self.sum is None:
            self.sum = np.zeros(feats.shape[-1])
            self.outer = np.zeros((feats.shape[-1], feats.shape[-1]))
        self.n += feats.shape[0]
        self.sum += feats.sum(0)
        self.outer += feats.T @ feats
        return self

    def finalize(self) -> Tuple[np.ndarray, np.ndarray]:
        mu = self.sum / self.n
        cov = (self.outer - self.n * np.outer(mu, mu)) / max(self.n - 1, 1)
        return mu, cov


def _sqrtm_psd(mat: np.ndarray) -> np.ndarray:
    """Matrix square root of a (nearly) PSD symmetric matrix via eigh."""
    vals, vecs = np.linalg.eigh((mat + mat.T) / 2.0)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(mu1, cov1, mu2, cov2) -> float:
    """FID = |μ1−μ2|² + Tr(Σ1 + Σ2 − 2·(Σ1 Σ2)^{1/2}).

    The cross term uses the symmetrized form
    (Σ2^{1/2} Σ1 Σ2^{1/2})^{1/2} for numerical stability.
    """
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    cov1, cov2 = np.asarray(cov1, np.float64), np.asarray(cov2, np.float64)
    diff = mu1 - mu2
    s2 = _sqrtm_psd(cov2)
    cross = _sqrtm_psd(s2 @ cov1 @ s2)
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2.0 * np.trace(cross))


def fid_from_features(real_feats: np.ndarray, fake_feats: np.ndarray) -> float:
    mu1, cov1 = FIDStats().update(real_feats).finalize()
    mu2, cov2 = FIDStats().update(fake_feats).finalize()
    return frechet_distance(mu1, cov1, mu2, cov2)


def clip_score(image_embeds: jnp.ndarray, text_embeds: jnp.ndarray, scale: float = 100.0) -> jnp.ndarray:
    """Mean max(0, cos(img, text)) · scale over matched pairs (the standard
    CLIPScore definition)."""
    img = image_embeds / (jnp.linalg.norm(image_embeds, axis=-1, keepdims=True) + 1e-8)
    txt = text_embeds / (jnp.linalg.norm(text_embeds, axis=-1, keepdims=True) + 1e-8)
    cos = jnp.sum(img * txt, axis=-1)
    return jnp.mean(jnp.maximum(cos, 0.0)) * scale


# CLIP preprocessing constants (for images in [-1, 1] NHWC)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073])
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711])


def clip_preprocess(images: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """[-1,1] NHWC → CLIP-normalized, bilinear-resized to size²."""
    x = (images + 1.0) / 2.0
    b, h, w, c = x.shape
    if (h, w) != (size, size):
        x = jax.image.resize(x, (b, size, size, c), method="bilinear")
    return (x - CLIP_MEAN) / CLIP_STD
