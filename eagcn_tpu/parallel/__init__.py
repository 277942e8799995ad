"""Parallelism: device meshes, data-parallel sharding, edge partitioning."""

from .mesh import batch_sharding, make_mesh, replicated
from .dp import (
    make_dp_eval_step,
    make_dp_train_step,
    pack_sharded,
    sharded_batch_stream,
    stack_batches,
    unstack_lead,
)

__all__ = [
    "batch_sharding", "make_mesh", "replicated", "make_dp_eval_step",
    "make_dp_train_step", "pack_sharded", "sharded_batch_stream",
    "stack_batches", "unstack_lead",
]
