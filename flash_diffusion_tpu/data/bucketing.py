"""Aspect-ratio bucketed multi-shape training (⊕ — no reference analog).

The reference trains square center-crops only (its TorchvisionMapper chains
Resize+CenterCrop to IMAGE_SIZE², reference src/flash/data/mappers.py:86+);
production SDXL-class fine-tuning wants SDXL-paper-style aspect bucketing:
a ladder of (h, w) resolutions with h·w ≈ base², each sample routed to the
bucket nearest its aspect ratio, batches formed per bucket so every batch
is one fixed shape.

TPU fit: XLA compiles one executable per distinct latent shape. The ladder
is small (O(10-20) shapes for stride 64), so the trainer's per-shape jit
cache warms once per bucket and then runs compiled — no dynamic shapes,
no padding waste. Dims stay divisible by ``stride`` (default 64 = VAE 8×
downsampling × UNet/DiT 8× total stride, so latent dims stay
patch/pool-aligned).

Pieces (composable with the existing pipeline):

- :func:`make_buckets` — the resolution ladder.
- :class:`BucketAssignMapper` — per-sample: route to nearest-aspect bucket,
  cover-resize + crop, emit the SDXL micro-conditioning keys
  (``original_size_as_tuple`` / ``crop_coords_top_left`` /
  ``target_size_as_tuple`` — the key names train_flash_sdxl.py conditions
  on) and ``__bucket__``.
- :func:`bucket_batches` — groups a sample stream by bucket and yields
  fixed-shape collated batches (replaces ``DataPipeline.batches`` when
  bucketing; plug its output straight into ``TrainingPipeline.fit``).
"""

from __future__ import annotations

import logging
import math
from dataclasses import field
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
from pydantic.dataclasses import dataclass

from .collation import custom_collation_fn
from .mappers import BaseMapper, BaseMapperConfig, _to_pil

logger = logging.getLogger(__name__)


def make_buckets(
    base_size: int = 1024, stride: int = 64, max_aspect: float = 2.0
) -> List[Tuple[int, int]]:
    """SDXL-style bucket ladder: (h, w) pairs, dims multiples of ``stride``,
    pixel count ≤ base_size² (never exceeds the square budget — compiled
    peak memory is bounded by the base graph), aspect within
    [1/max_aspect, max_aspect]. Sorted by aspect; always contains the
    square (base, base)."""
    if base_size % stride:
        raise ValueError(f"base_size {base_size} not divisible by stride {stride}")
    budget = base_size * base_size
    buckets = {(base_size, base_size)}
    w = stride
    while True:
        h_max = (budget // w) // stride * stride
        if h_max < stride:
            break
        h = h_max
        a = w / h
        if 1.0 / max_aspect <= a <= max_aspect:
            buckets.add((h, w))
            buckets.add((w, h))
        if w > base_size * max_aspect:
            break
        w += stride
    return sorted(buckets, key=lambda hw: hw[1] / hw[0])


def assign_bucket(buckets: Sequence[Tuple[int, int]], height: int, width: int) -> int:
    """Index of the bucket nearest in log-aspect (symmetric in h/w)."""
    a = math.log(width / height)
    return min(
        range(len(buckets)), key=lambda i: abs(math.log(buckets[i][1] / buckets[i][0]) - a)
    )


@dataclass
class BucketAssignMapperConfig(BaseMapperConfig):
    # either give buckets explicitly or the ladder parameters
    buckets: Optional[List[Tuple[int, int]]] = None
    base_size: int = 1024
    stride: int = 64
    max_aspect: float = 2.0
    crop: str = "center"  # center | random
    to_tensor: bool = True  # emit float32 [0,1] HWC (ToTensor analog)
    emit_micro_conds: bool = True  # SDXL original/crop/target keys
    seed: Optional[int] = None


class BucketAssignMapper(BaseMapper):
    """Route a sample to its aspect bucket and fit the image to it.

    Fit = cover-resize (scale so both dims cover the bucket) + crop, the
    same geometry as Resize-shortest+CenterCrop but at the bucket's (h, w).
    Emits ``__bucket__`` (int index for :func:`bucket_batches`) and, by
    default, the SDXL micro-conditioning tuples measured on the REAL
    geometry (original size before resize, actual crop offset) — which is
    strictly more faithful than the constant square tuples a fixed-size
    pipeline fabricates."""

    def __init__(self, config: BucketAssignMapperConfig):
        super().__init__(config)
        self.buckets = (
            [tuple(b) for b in config.buckets]
            if config.buckets
            else make_buckets(config.base_size, config.stride, config.max_aspect)
        )
        self.rng = np.random.default_rng(config.seed)

    def __call__(self, sample: Dict[str, Any]) -> Dict[str, Any]:
        cfg = self.config
        img = _to_pil(sample[cfg.key])
        w0, h0 = img.size  # actual pixels (post draft-decode)
        # pre-draft TRUE file geometry when the decoder recorded it
        oh, ow = img.info.get("original_size", (h0, w0))
        idx = assign_bucket(self.buckets, h0, w0)
        th, tw = self.buckets[idx]
        scale = max(th / h0, tw / w0)
        rw, rh = max(tw, round(w0 * scale)), max(th, round(h0 * scale))
        img = img.resize((rw, rh))
        if cfg.crop == "random":
            left = int(self.rng.integers(0, rw - tw + 1))
            top = int(self.rng.integers(0, rh - th + 1))
        else:
            left, top = (rw - tw) // 2, (rh - th) // 2
        img = img.crop((left, top, left + tw, top + th))
        out = dict(sample)
        out[cfg.key] = (
            np.asarray(img, np.float32) / 255.0 if cfg.to_tensor else img
        )
        out["__bucket__"] = idx
        if cfg.emit_micro_conds:
            out["original_size_as_tuple"] = np.asarray([oh, ow], np.float32)
            # crop offset in the RESIZED frame — the convention SDXL was
            # trained with (diffusers' train_text_to_image_sdxl computes
            # (y1, x1) after Resize, before RandomCrop)
            out["crop_coords_top_left"] = np.asarray([top, left], np.float32)
            out["target_size_as_tuple"] = np.asarray([th, tw], np.float32)
        return out


def bucket_batches(
    samples: Iterator[Dict[str, Any]],
    batch_size: int,
    num_buckets: Optional[int] = None,
    drop_last: bool = True,
    collate: Callable = custom_collation_fn,
    max_pending: int = 1024,
) -> Iterator[Dict[str, Any]]:
    """Group a ``__bucket__``-tagged sample stream into fixed-shape batches.

    A batch is emitted the moment any bucket reaches ``batch_size``; rare
    aspect ratios therefore wait but never mix shapes. ``max_pending``
    bounds host memory: if the total backlog exceeds it, the fullest
    bucket is flushed as a short batch (when ``drop_last`` the overflow
    flush pads by repeating samples — shape stability beats sample purity
    for a compiled trainer). Remaining partials flush at stream end unless
    ``drop_last``."""
    pending: Dict[int, List[Dict[str, Any]]] = {}
    n_pending = 0
    for s in samples:
        if "__bucket__" not in s:
            raise ValueError(
                "bucket_batches needs __bucket__-tagged samples — put a "
                "BucketAssignMapper in the chain when aspect_bucketing=True "
                "(defaulting silently would mix shapes and crash in collation)"
            )
        b = int(s.pop("__bucket__"))
        pending.setdefault(b, []).append(s)
        n_pending += 1
        if len(pending[b]) == batch_size:
            yield collate(pending.pop(b))
            n_pending -= batch_size
        elif n_pending >= max_pending:
            fullest = max(pending, key=lambda k: len(pending[k]))
            batch = pending.pop(fullest)
            n_pending -= len(batch)
            if drop_last:  # pad to the fixed shape by repetition
                reps = [batch[i % len(batch)] for i in range(batch_size)]
                logger.warning(
                    "bucket backlog > %d: flushing bucket %d padded %d→%d",
                    max_pending, fullest, len(batch), batch_size,
                )
                yield collate(reps)
            else:
                yield collate(batch)
    if not drop_last:
        for batch in pending.values():
            if batch:
                yield collate(batch)
