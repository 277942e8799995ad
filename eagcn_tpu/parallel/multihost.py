"""Multi-host runtime initialization.

The reference is strictly single-process (SURVEY §2.2).  For N>=2 host
processes driving a pod slice, each process calls `initialize_multihost()`
before any JAX computation; the mesh builders in `mesh.py` then see the
global device set and shard the 'data' axis across hosts (each host packs
only its own molecule shards — `host_local_indices`).

Failure semantics (SURVEY §5): fail fast — collective timeouts abort the
process; recovery is restart-from-checkpoint via `Experiment.maybe_resume`
(bit-deterministic: data order derives from (seed, epoch)).  Elastic resize
is documented out of scope for v1."""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """`jax.distributed.initialize` with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or the cloud-TPU
    auto-detection when no arguments are given)."""
    import jax

    kwargs = {}
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
        kwargs["num_processes"] = int(
            os.environ["NUM_PROCESSES"] if num_processes is None
            else num_processes)
        # NOTE: `process_id or env` would be wrong — 0 is a valid id
        kwargs["process_id"] = int(
            os.environ["PROCESS_ID"] if process_id is None else process_id)
    jax.distributed.initialize(**kwargs)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def host_local_indices(
    indices: Sequence[int],
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> np.ndarray:
    """Disjoint per-host molecule shards: host p takes indices[p::P].
    Every host must iterate the same number of batches per epoch (the
    collectives are synchronous), which round-robin striding guarantees to
    within one element; the packer pads the difference."""
    import jax

    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    return np.asarray(indices)[p::n]
