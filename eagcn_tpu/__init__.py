"""eagcn_tpu — a TPU-native multi-view edge-attention GNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Luckick/EAGCN
("Multi-View Spectral Graph Convolution with Consistent Edge Attention",
Neurocomputing 2021).  The reference's dense per-molecule batched matmuls
become sparse edge-list message passing over packed static-shape mega-graph
batches; parallelism is expressed with `jax.sharding` meshes instead of
device flags.

Layer map (bottom-up):
  chem/      host-side SMILES -> array featurizer (RDKit-free)
  data/      datasets, caching, splits, static-shape mega-graph batching
  ops/       aggregation kernels (XLA segment/gather paths + Pallas TPU)
  models/    EAGCN / GCN / GAT model family as functional JAX
  train/     jitted train & eval steps, losses, metrics, checkpoints
  parallel/  mesh construction, data/edge-partition sharding
  analysis/  attention dumps, embedding dumps (check_model/tsne parity)
"""

__version__ = "0.1.0"
