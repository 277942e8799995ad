"""Structured run logging.

The reference prints formatted metric lines and appends them to a text log
that downstream tooling regex-parses (`eagcn_pytorch/train.py:347-378`,
`plot.py:27-70`).  eagcn_tpu writes BOTH: a human-readable line in the same
spirit, and a machine-readable JSONL stream (one JSON object per event) that
the analysis tools consume directly."""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class RunLogger:
    def __init__(self, out_dir: Optional[str], run_name: str,
                 echo: bool = True):
        self.echo = echo
        self.path = None
        self.jsonl_path = None
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self.path = os.path.join(out_dir, f"{run_name}.log")
            self.jsonl_path = os.path.join(out_dir, f"{run_name}.jsonl")
        self.t0 = time.time()

    def write_text(self, line: str) -> None:
        if self.echo:
            print(line, flush=True)
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")

    def log(self, event: str, **fields: Any) -> None:
        rec: Dict[str, Any] = {
            "event": event,
            "t": round(time.time() - self.t0, 3),
            **fields,
        }
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(rec, default=_js) + "\n")

    def metrics_line(self, epoch, num_epochs, step, loss, **metrics) -> None:
        parts = [f"Epoch: [{epoch}/{num_epochs}], Step: [{step}], "
                 f"Loss: {loss:.6f}"]
        for k, v in metrics.items():
            if isinstance(v, float):
                parts.append(f"{k}: {v:.4f}")
            else:
                parts.append(f"{k}: {v}")
        self.write_text(", ".join(parts))
        self.log("metrics", epoch=epoch, step=step, loss=loss, **metrics)


def _js(o):
    try:
        return float(o)
    except Exception:
        return str(o)
