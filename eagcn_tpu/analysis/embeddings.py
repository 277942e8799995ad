"""Representation-space analysis: t-SNE / PCA / k-means.

Parity with the reference's offline analysis scripts: atom-representation
t-SNE colored by subtype (`eagcn_pytorch/tsnes.py:49-205`), molecule-
representation projections colored by label (`tsnes.py:207-295`,
`mol_to_vec_plot.py:61-141`), and k-means clustering of atom reps with a
subtype confusion matrix (`kmeans_atomrep.py:16-87`).  Input is the npz
bundle written by `Experiment.dump_representations`."""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..chem import SUBTYPE_LIST


def load_reps(npz_path: str) -> Dict[str, np.ndarray]:
    z = np.load(npz_path)
    return {k: z[k] for k in z.files}


def atom_tsne(
    npz_path: str,
    out_path: str,
    max_points: int = 4000,
    perplexity: float = 30.0,
    random_state: int = 2,
    subtype_range: tuple = (1, 19),
) -> str:
    """t-SNE of atom representations colored by chemistry subtype; the
    reference keeps subtypes 1..18 (`train.py:264-268`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.manifold import TSNE

    d = load_reps(npz_path)
    reps, subs = d["atom_rep"], d["atom_subtype"]
    keep = (subs >= subtype_range[0]) & (subs < subtype_range[1])
    reps, subs = reps[keep], subs[keep]
    if len(reps) > max_points:
        rng = np.random.default_rng(random_state)
        sel = rng.choice(len(reps), max_points, replace=False)
        reps, subs = reps[sel], subs[sel]
    xy = TSNE(n_components=2, random_state=random_state,
              perplexity=min(perplexity, max(5, len(reps) // 4)),
              init="pca").fit_transform(reps)
    fig, ax = plt.subplots(figsize=(7, 6))
    for st in np.unique(subs):
        m = subs == st
        ax.scatter(xy[m, 0], xy[m, 1], s=4, alpha=0.4,
                   label=SUBTYPE_LIST[int(st) - 1])
    ax.legend(fontsize=6, markerscale=2, ncol=2)
    ax.set_title("atom representations (t-SNE, colored by subtype)")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def mol_projection(
    npz_path: str,
    out_path: str,
    method: str = "pca",
    task: int = 0,
    random_state: int = 2,
) -> str:
    """2D projection of molecule representations colored by label
    (`tsnes.py:207-295`, `mol_to_vec_plot.py`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d = load_reps(npz_path)
    reps, labels = d["graph_rep"], d["labels"][:, task]
    if method == "pca":
        from sklearn.decomposition import PCA

        xy = PCA(n_components=2, random_state=random_state).fit_transform(reps)
    else:
        from sklearn.manifold import TSNE

        xy = TSNE(n_components=2, random_state=random_state,
                  init="pca").fit_transform(reps)
    fig, ax = plt.subplots(figsize=(6.5, 5.5))
    sc = ax.scatter(xy[:, 0], xy[:, 1], c=labels, s=8, alpha=0.6,
                    cmap="coolwarm")
    fig.colorbar(sc, ax=ax, label=f"task {task} label")
    ax.set_title(f"molecule representations ({method})")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def atom_kmeans(
    npz_path: str,
    n_clusters: int = 10,
    random_state: int = 0,
    subtype_range: tuple = (1, 19),
) -> Dict[str, np.ndarray]:
    """k-means of atom reps + cluster-vs-subtype contingency matrix
    (`kmeans_atomrep.py:16-87`)."""
    from sklearn.cluster import KMeans

    d = load_reps(npz_path)
    reps, subs = d["atom_rep"], d["atom_subtype"]
    keep = (subs >= subtype_range[0]) & (subs < subtype_range[1])
    reps, subs = reps[keep], subs[keep]
    km = KMeans(n_clusters=n_clusters, random_state=random_state, n_init=10)
    assign = km.fit_predict(reps)
    subtypes = np.unique(subs)
    confusion = np.zeros((n_clusters, len(subtypes)), dtype=np.int64)
    for c in range(n_clusters):
        for j, st in enumerate(subtypes):
            confusion[c, j] = int(((assign == c) & (subs == st)).sum())
    return {
        "assignments": assign,
        "subtypes": subtypes,
        "confusion": confusion,
        "centers": km.cluster_centers_,
    }
