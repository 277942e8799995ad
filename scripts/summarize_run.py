"""Summarize a training run's jsonl: best-validation epoch and the test
metric at that epoch (the reference's model-selection rule — val picks
the epoch, test is reported).  Works on finished AND in-flight/killed
runs, so a multi-hour run that lost its process still yields its
artifact-backed result.

Usage: python scripts/summarize_run.py runs/hiv_concat_rs0.jsonl
"""
import json
import sys


def summarize(path: str) -> dict:
    cfg = None
    evals = []
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue            # partial trailing line from a kill
            if ev.get("event") == "config":
                cfg = ev
            elif ev.get("event") == "metrics":
                evals.append(ev)
    if not evals:
        return {"path": path, "evals": 0}
    task = (cfg or {}).get("train", {}).get("task_type", "class")
    val_key = "Validation AUC" if task == "class" else "Validation RMSE"
    test_key = "Test AUC" if task == "class" else "Test RMSE"
    sign = 1.0 if task == "class" else -1.0
    best = max(evals, key=lambda e: sign * e.get(val_key, -sign * 1e9))
    return {
        "path": path,
        "evals": len(evals),
        "last_epoch": evals[-1].get("epoch"),
        "planned_epochs": (cfg or {}).get("train", {}).get("num_epochs"),
        "best_val_epoch": best.get("epoch"),
        "best_val": best.get(val_key),
        "test_at_best_val": best.get(test_key),
        "last_val": evals[-1].get(val_key),
        "last_test": evals[-1].get(test_key),
    }


if __name__ == "__main__":
    for p in sys.argv[1:]:
        print(json.dumps(summarize(p), indent=2))
