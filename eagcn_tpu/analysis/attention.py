"""Learned edge-attention inspection.

Parity with `eagcn_pytorch/check_model.py`: prints/saves the per-relation
attention dictionaries sigmoid(att_w) and self-loop weights sigmoid(self_r)
for all 5 views x 4 layers, and renders heatmaps with bond-type axis labels
(`check_model.py:287-340`).  Works directly on a params pytree or a
checkpoint directory."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

VIEW_NAMES = ["atom-pair type", "bond order", "aromaticity",
              "conjugation", "ring membership"]
ORDER_LABELS = ["single", "aromatic", "double", "triple"]
BINARY_LABELS = [["aromatic", "not aromatic"],
                 ["conjugated", "not conjugated"],
                 ["in ring", "not in ring"]]


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-np.asarray(x, dtype=np.float64)))


def extract_attention(params: Dict) -> List[Dict]:
    """params pytree -> list (per layer) of view dicts with sigmoided
    attention dictionaries and self weights."""
    out = []
    for li, layer in enumerate(params["layers"]):
        views = []
        for v, blk in enumerate(layer["blocks"]):
            views.append({
                "view": VIEW_NAMES[v],
                "attention": _sigmoid(blk["att"]),
                "self_weight": float(_sigmoid(blk["self_r"])),
            })
        entry = {"layer": li + 1, "views": views}
        if "ave" in layer:
            entry["fusion_weights"] = np.asarray(layer["ave"], np.float64)
        if "ave_A" in layer:
            entry["consensus_weights"] = np.asarray(layer["ave_A"], np.float64)
        out.append(entry)
    return out


def print_attention(params: Dict, bondtype_list: Optional[Sequence[str]] = None,
                    file=None) -> None:
    """Human-readable dump (`check_model.py:47-284` prints the same
    quantities)."""
    import sys

    f = file or sys.stdout
    for entry in extract_attention(params):
        print(f"=== layer {entry['layer']} ===", file=f)
        for v, view in enumerate(entry["views"]):
            labels = _labels_for_view(v, bondtype_list,
                                      len(view["attention"]))
            pairs = ", ".join(
                f"{l}={a:.3f}" for l, a in zip(labels, view["attention"])
            )
            print(f"  {view['view']}: self={view['self_weight']:.3f} | {pairs}",
                  file=f)


def _labels_for_view(v: int, bondtype_list, n: int) -> List[str]:
    if v == 0:
        if bondtype_list is not None and len(bondtype_list) == n:
            return [str(b) for b in bondtype_list]
        return [f"type{i}" for i in range(n)]
    if v == 1:
        return ORDER_LABELS[:n]
    return BINARY_LABELS[v - 2][:n]


def attention_heatmaps(params: Dict, out_path: str,
                       bondtype_list: Optional[Sequence[str]] = None) -> str:
    """Renders the 4x5 grid of attention-dictionary heatmaps
    (`check_model.py:287-340`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    entries = extract_attention(params)
    fig, axes = plt.subplots(len(entries), 5,
                             figsize=(22, 3 * len(entries)), squeeze=False)
    for li, entry in enumerate(entries):
        for v, view in enumerate(entry["views"]):
            ax = axes[li][v]
            att = view["attention"][None, :]
            im = ax.imshow(att, vmin=0, vmax=1, cmap="viridis",
                           aspect="auto")
            labels = _labels_for_view(v, bondtype_list, att.shape[1])
            ax.set_xticks(range(att.shape[1]))
            ax.set_xticklabels(labels, rotation=90, fontsize=6)
            ax.set_yticks([])
            ax.set_title(f"L{entry['layer']} {view['view']}"
                         f" (self={view['self_weight']:.2f})", fontsize=8)
    fig.colorbar(im, ax=axes[-1][-1], shrink=0.8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
