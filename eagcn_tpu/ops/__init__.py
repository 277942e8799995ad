"""Aggregation kernels: ELL gather, COO segment-sum, Pallas TPU fused."""

from .aggregate import CooOps, EllOps, make_ops, segment_readout

__all__ = ["CooOps", "EllOps", "make_ops", "segment_readout"]
