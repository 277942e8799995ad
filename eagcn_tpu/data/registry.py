"""Benchmark registry: the eight dataset definitions of the reference
(`eagcn_pytorch/EAGCN_dataset.py:398-496`) as declarative specs."""

from __future__ import annotations

from typing import Dict

from .dataset import DatasetSpec

_REGISTRY: Dict[str, DatasetSpec] = {}


def register(spec: DatasetSpec) -> DatasetSpec:
    _REGISTRY[spec.name] = spec
    return spec


def get_spec(name: str) -> DatasetSpec:
    try:
        return _REGISTRY[name.lower()]
    except KeyError:
        raise KeyError(
            f"unknown dataset {name!r}; known: {sorted(_REGISTRY)}"
        ) from None


def available() -> Dict[str, DatasetSpec]:
    return dict(_REGISTRY)


FREESOLV = register(DatasetSpec(
    name="freesolv", filename="SAMPL.csv", smiles_col=1, label_cols=[2],
    tasks=["expt"], task_type="reg",
))

LIPO = register(DatasetSpec(
    name="lipo", filename="Lipophilicity.csv", smiles_col=2, label_cols=[1],
    tasks=["exp"], task_type="reg",
))

TOX21 = register(DatasetSpec(
    name="tox21", filename="tox21.csv", smiles_col=13,
    label_cols=list(range(12)),
    tasks=["NR-AR", "NR-AR-LBD", "NR-AhR", "NR-Aromatase", "NR-ER",
           "NR-ER-LBD", "NR-PPAR-gamma", "SR-ARE", "SR-ATAD5", "SR-HSE",
           "SR-MMP", "SR-p53"],
    task_type="class",
))

HIV = register(DatasetSpec(
    name="hiv", filename="HIV.csv", smiles_col=0, label_cols=[2],
    tasks=["HIV_active"], task_type="class",
))

ESOL = register(DatasetSpec(
    name="esol", filename="delaney-processed.csv", smiles_col=9,
    label_cols=[8], tasks=["measured log solubility in mols per litre"],
    task_type="reg",
))

NIH = register(DatasetSpec(
    name="nih", filename="pubchem_data.csv", smiles_col=44,
    label_cols=[4, 12, 20, 28, 36],
    tasks=["HEK293-Outcome", "KB-3-1-Outcome", "NIH3T3-Outcome",
           "CRL-7250-Outcome", "HaCat-Outcome"],
    task_type="class", delimiter="\t",
    label_encoding={"Inactive": 0.0, "Active": 1.0, "": -1.0},
))

MUV = register(DatasetSpec(
    name="muv", filename="muv.csv", smiles_col=18, label_cols=list(range(17)),
    tasks=["MUV-466", "MUV-548", "MUV-600", "MUV-644", "MUV-652", "MUV-689",
           "MUV-692", "MUV-712", "MUV-713", "MUV-733", "MUV-737", "MUV-810",
           "MUV-832", "MUV-846", "MUV-852", "MUV-858", "MUV-859"],
    task_type="class",
))

PCBA = register(DatasetSpec(
    name="pcba", filename="pcba.csv", smiles_col=129,
    label_cols=list(range(128)),
    tasks=[f"PCBA-task-{i}" for i in range(128)],  # full ids in ref :466-496
    task_type="class",
))
