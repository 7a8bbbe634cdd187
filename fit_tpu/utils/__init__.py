"""Config, checkpointing, logging utilities."""

from fit_tpu.utils.checkpoint import CheckpointManager
from fit_tpu.utils.config import PreprocessConfig, SampleConfig, TrainConfig
from fit_tpu.utils.logging import MetricLogger

__all__ = [
    "CheckpointManager",
    "PreprocessConfig",
    "SampleConfig",
    "TrainConfig",
    "MetricLogger",
]
