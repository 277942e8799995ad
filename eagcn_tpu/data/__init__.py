"""Data pipeline: datasets, array caching, splits, mega-graph batching."""

from .dataset import (
    DatasetSpec,
    FeaturizedDataset,
    bce_class_weights,
    featurize_dataset,
    load_dataset,
    train_val_test_split,
)
from .registry import available, get_spec
from .batching import (
    BatchShape,
    GraphBatch,
    GraphBatcher,
    MAX_DEGREE,
    batch_to_jax,
    iter_batches,
    plan_batch_shape,
)

__all__ = [
    "DatasetSpec", "FeaturizedDataset", "bce_class_weights",
    "featurize_dataset", "load_dataset", "train_val_test_split",
    "available", "get_spec", "BatchShape", "GraphBatch", "GraphBatcher",
    "MAX_DEGREE", "batch_to_jax", "iter_batches", "plan_batch_shape",
]
