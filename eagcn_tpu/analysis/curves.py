"""Training-curve plotting.

Parity with `eagcn_pytorch/plot.py`, minus the fragility: the reference
regex-parses its own printed text logs (`plot.py:27-70`); eagcn_tpu reads
the structured JSONL stream the RunLogger writes."""

from __future__ import annotations

import json
from typing import Dict, List


def read_metrics(jsonl_path: str) -> List[Dict]:
    out = []
    with open(jsonl_path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("event") == "metrics":
                out.append(rec)
    return out


def plot_curves(jsonl_path: str, out_path: str, title: str = "") -> str:
    """AUC or RMSE curves over epochs (`plot.py:23-94`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    recs = read_metrics(jsonl_path)
    if not recs:
        raise ValueError(f"no metric records in {jsonl_path}")
    epochs = [r["epoch"] for r in recs]
    metric_keys = [k for k in recs[0]
                   if k.endswith(("AUC", "RMSE")) and "epoch" not in k]
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
    ax1.plot(epochs, [r["loss"] for r in recs])
    ax1.set_xlabel("epoch")
    ax1.set_ylabel("train loss")
    for k in metric_keys:
        ax2.plot(epochs, [r[k] for r in recs], label=k)
    ax2.set_xlabel("epoch")
    ax2.legend()
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
