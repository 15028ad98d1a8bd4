from .ema import ema_warmup_decay, init_ema, update_ema
from .profiling import StepTimer, device_memory_stats, profile, trace_annotation
from .tensor import append_dims, extract_into_tensor, pad_to_multiple

__all__ = [
    "StepTimer",
    "append_dims",
    "device_memory_stats",
    "ema_warmup_decay",
    "extract_into_tensor",
    "init_ema",
    "pad_to_multiple",
    "profile",
    "trace_annotation",
    "update_ema",
]
