"""Configs, logging, misc utilities."""

from .config import (
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
    benchmark_config,
)

__all__ = ["ExperimentConfig", "ModelConfig", "TrainConfig", "benchmark_config"]
