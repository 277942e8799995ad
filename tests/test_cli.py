"""CLI smoke tests (the reference's only interface is `python train.py`)."""

import json
import subprocess
import sys

import numpy as np


def test_featurize_command():
    out = subprocess.run(
        [sys.executable, "-m", "eagcn_tpu.cli", "featurize",
         "--dataset", "freesolv"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0, out.stderr[-500:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["molecules"] == 639 and rec["n_bfeat"] == 17


def test_train_command_smoke():
    out = subprocess.run(
        [sys.executable, "-m", "eagcn_tpu.cli", "train",
         "--dataset", "freesolv", "--epochs", "2", "--platform", "cpu",
         "--out-dir", "/tmp/cli_runs"],
        capture_output=True, text=True, cwd="/root/repo", timeout=500,
    )
    assert out.returncode == 0, out.stderr[-800:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["dataset"] == "freesolv"
    assert np.isfinite(rec["test"]["rmse"])


def test_sharded_batch_stream_covers_all():
    from eagcn_tpu.data import BatchShape, get_spec, load_dataset
    from eagcn_tpu.parallel import sharded_batch_stream

    ds = load_dataset(get_spec("freesolv"))
    shape = BatchShape(num_nodes=128, num_edges=256, num_mols=8)
    seen = []
    for stacked in sharded_batch_stream(ds, np.arange(100), shape, 4):
        assert stacked.node_feat.shape[0] == 4       # shard axis
        idx = stacked.mol_index[stacked.mol_mask > 0]
        seen.extend(int(i) for i in idx)
    assert sorted(seen) == list(range(100))
