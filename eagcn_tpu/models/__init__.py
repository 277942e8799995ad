"""Model family: EAGCN (Concate / Weighted_sum), GCN and GAT baselines,
DiffPool readout — functional JAX over packed mega-graph batches."""

from .eagcn import apply_eagcn, init_eagcn, layer_widths
from .norm import batch_norm_apply, init_batch_norm

__all__ = [
    "apply_eagcn", "init_eagcn", "layer_widths",
    "batch_norm_apply", "init_batch_norm",
]
