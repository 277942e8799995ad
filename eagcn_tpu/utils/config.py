"""Declarative experiment configuration.

Replaces the reference's argparse + hard-coded per-dataset hyperparameter
blocks (`eagcn_pytorch/train.py:28-120`) with dataclasses; the benchmark
tables reproduce those exact values."""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple

STRUCTURES = ("Concate", "Weighted_sum", "GCN", "GAT")   # train.py:28
MOLFP_MODES = ("sum", "ave", "pool")                      # train.py:29


@dataclass
class ModelConfig:
    n_bfeat: int = 0                  # set from data at build time
    n_afeat: int = 24
    sgc1: Tuple[int, ...] = (40, 40, 40, 40, 40)
    sgc2: Tuple[int, ...] = (60, 60, 60, 60, 60)
    n_den1: int = 128
    n_den2: int = 64
    n_tasks: int = 1
    dropout: float = 0.3              # train.py:48 default
    structure: str = "Concate"
    molfp_mode: str = "sum"
    pool_num: int = 5                 # models.py:25
    backend: str = "ell"              # aggregation backend (ell|tile|coo|pallas)
    bf16: bool = False                # bf16 activations through graph layers
    pre_transform: bool = True        # narrow-side rewrite A@(XW) when
                                      # f_out < f_in (tile/pallas backends;
                                      # identical math, fewer FLOPs — turn
                                      # off for strict op-order parity)
    bn_count_padding: bool = False    # A/B: node-level BN statistics count
                                      # B*max(mol_size) rows — the
                                      # reference's per-batch-max padding
                                      # semantics (layers.py:394-412 over
                                      # utils.py:524 collate) — instead of
                                      # real atoms only
    remat: bool = False               # jax.checkpoint each graph layer:
                                      # recompute activations in backward
                                      # instead of saving [N,V,F] residuals
                                      # (trades ~33% FLOPs for O(layers x
                                      # width) HBM at large mega-batches)


@dataclass
class TrainConfig:
    dataset: str = "freesolv"
    task_type: str = "reg"
    batch_size: int = 32              # train.py:46
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    num_epochs: int = 1500
    random_state: int = 0
    eval_every_epochs: int = 1
    early_stop_window: int = 30       # train.py:383,421 best-30 mean
    early_stop_frac: float = 0.8      # last 1/5 of epochs, train.py:379,417
    seed: int = 0
    checkpoint_every: int = 0         # epochs; 0 = final only
    num_data_shards: int = 1          # data-parallel shards (mesh axis)
    scan_steps: int = 0               # >1: lax.scan K train steps per
                                      # dispatch (amortizes the remote-TPU
                                      # per-call overhead; single-device)


@dataclass
class ExperimentConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    out_dir: str = "runs"

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "ExperimentConfig":
        d = json.loads(s)
        return ExperimentConfig(
            model=ModelConfig(**{**d["model"],
                                 "sgc1": tuple(d["model"]["sgc1"]),
                                 "sgc2": tuple(d["model"]["sgc2"])}),
            train=TrainConfig(**d["train"]),
            out_dir=d.get("out_dir", "runs"),
        )


def benchmark_config(
    dataset: str,
    structure: str = "Concate",
    batch_size: Optional[int] = None,
    random_state: int = 0,
    dropout: float = 0.3,
) -> ExperimentConfig:
    """The per-dataset hyperparameter tables of `train.py:57-114`."""
    d = dataset.lower()
    m = ModelConfig(structure=structure, dropout=dropout)
    t = TrainConfig(dataset=d, random_state=random_state)
    if d == "tox21":                                   # train.py:61-68
        m.sgc1, m.sgc2 = (80,) * 5, (140,) * 5
        m.n_den1, m.n_den2, m.n_tasks = 256, 64, 12
        t.weight_decay, t.num_epochs, t.learning_rate = 1e-4, 100, 5e-4
        t.task_type = "class"
    elif d == "hiv":                                   # train.py:69-76
        m.sgc1, m.sgc2 = (100,) * 5, (250,) * 5
        m.n_den1, m.n_den2, m.n_tasks = 512, 128, 1
        t.weight_decay, t.num_epochs, t.learning_rate = 1e-5, 300, 1e-3
        t.task_type = "class"
    elif d == "nih":                                   # train.py:77-84
        m.sgc1 = (15, 12, 12, 12, 12)
        m.sgc2 = (30, 20, 20, 20, 20)
        m.n_den1, m.n_den2, m.n_tasks = 32, 16, 5
        t.weight_decay, t.num_epochs, t.learning_rate = 1e-3, 200, 5e-4
        t.task_type = "class"
    elif d == "lipo":                                  # train.py:87-95
        m.sgc1, m.sgc2 = (60,) * 5, (100,) * 5
        m.n_den1, m.n_den2, m.n_tasks = 128, 64, 1
        t.weight_decay, t.num_epochs, t.learning_rate = 1e-3, 500, 1e-4
        t.task_type = "reg"
    elif d == "esol":                                  # train.py:96-105
        m.sgc1, m.sgc2 = (50,) * 5, (80,) * 5
        m.n_den1, m.n_den2, m.n_tasks = 128, 64, 1
        t.weight_decay, t.num_epochs, t.learning_rate = 1e-3, 2500, 1e-3
        t.task_type = "reg"
    elif d == "freesolv":                              # train.py:106-114
        m.sgc1, m.sgc2 = (40,) * 5, (60,) * 5
        m.n_den1, m.n_den2, m.n_tasks = 128, 64, 1
        t.weight_decay, t.num_epochs, t.learning_rate = 1e-2, 1500, 1e-4
        t.task_type = "reg"
    else:
        raise KeyError(f"no benchmark config for dataset {dataset!r}")
    if batch_size is not None:
        t.batch_size = batch_size
    return ExperimentConfig(model=m, train=t)
