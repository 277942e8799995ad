"""Device mesh construction.

The reference's parallelism is `use_cuda = torch.cuda.is_available()`
(`eagcn_pytorch/train.py:124`).  eagcn_tpu scales through `jax.sharding`
meshes: axis 'data' shards mega-graph batches (molecule-level data
parallelism), axis 'graph' partitions a single giant graph's nodes/edges
(the sequence-parallel analogue for the synthetic stress configs).
Collectives ride ICI via XLA (`psum` for gradients and BN moments,
`all_gather`/`ppermute` for halo exchange)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    graph: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Builds a ('data', 'graph') mesh.  With graph=1 this is pure DP."""
    devs = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devs) // graph
    n = data * graph
    if n > len(devs):
        raise ValueError(f"need {n} devices, have {len(devs)}")
    arr = np.asarray(devs[:n]).reshape(data, graph)
    return Mesh(arr, axis_names=("data", "graph"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for stacked per-shard batches: leading axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
