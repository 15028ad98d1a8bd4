from .base import DIM2CONDITIONING, BaseConditionerConfig, Conditioner
from .misc import (
    ModuleEmbedder,
    ModuleEmbedderConfig,
    RawVectorEmbedder,
    RawVectorEmbedderConfig,
    TimestepsEmbedder,
    TimestepsEmbedderConfig,
)
from .sd3 import SD3Conditioner, T5AsSD3Embedder
from .text import ClipEmbedder, ClipEmbedderConfig, T5TextEmbedder, T5TextEmbedderConfig
from .wrapper import KEY2CATDIM, ConditionerWrapper

__all__ = [
    "BaseConditionerConfig",
    "ClipEmbedder",
    "ClipEmbedderConfig",
    "Conditioner",
    "ConditionerWrapper",
    "DIM2CONDITIONING",
    "KEY2CATDIM",
    "ModuleEmbedder",
    "ModuleEmbedderConfig",
    "RawVectorEmbedder",
    "RawVectorEmbedderConfig",
    "SD3Conditioner",
    "T5AsSD3Embedder",
    "T5TextEmbedder",
    "T5TextEmbedderConfig",
    "TimestepsEmbedder",
    "TimestepsEmbedderConfig",
]
