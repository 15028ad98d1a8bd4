from .checkpoint import adapt_state_dict, rename_keys, restore_state, save_state
from .loggers import CheckpointCallback, MetricLogger, QualityValidator, SampleLogger, make_grid
from .trainer import TrainingPipeline, TrainState, export_lora
from .training_config import TrainingConfig

__all__ = [
    "CheckpointCallback",
    "MetricLogger",
    "QualityValidator",
    "SampleLogger",
    "TrainState",
    "TrainingConfig",
    "TrainingPipeline",
    "adapt_state_dict",
    "export_lora",
    "make_grid",
    "rename_keys",
    "restore_state",
    "save_state",
]
