from .base import DIM2CONDITIONING, BaseConditionerConfig, Conditioner
from .misc import (
    ModuleEmbedder,
    ModuleEmbedderConfig,
    TimestepsEmbedder,
    TimestepsEmbedderConfig,
)
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
    "T5TextEmbedder",
    "T5TextEmbedderConfig",
    "TimestepsEmbedder",
    "TimestepsEmbedderConfig",
]
