"""Offline analysis: attention dumps, training curves, embedding plots."""

from .attention import attention_heatmaps, extract_attention, print_attention
from .curves import plot_curves, read_metrics
from .embeddings import atom_kmeans, atom_tsne, load_reps, mol_projection

__all__ = [
    "attention_heatmaps", "extract_attention", "print_attention",
    "plot_curves", "read_metrics", "atom_kmeans", "atom_tsne", "load_reps",
    "mol_projection",
]
