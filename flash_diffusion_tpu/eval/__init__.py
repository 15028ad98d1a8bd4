from .harness import evaluate
from .metrics import (
    FIDStats,
    clip_preprocess,
    clip_score,
    fid_from_features,
    frechet_distance,
)

__all__ = [
    "FIDStats",
    "clip_preprocess",
    "clip_score",
    "evaluate",
    "fid_from_features",
    "frechet_distance",
]
