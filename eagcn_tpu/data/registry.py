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

# the 128 PubChem BioAssay ids, verbatim from `EAGCN_dataset.py:473-495`
_PCBA_AIDS = [
    1030, 1379, 1452, 1454, 1457, 1458, 1460, 1461, 1468, 1469, 1471, 1479,
    1631, 1634, 1688, 1721, 2100, 2101, 2147, 2242, 2326, 2451, 2517, 2528,
    2546, 2549, 2551, 2662, 2675, 2676, 411, 463254, 485281, 485290, 485294,
    485297, 485313, 485314, 485341, 485349, 485353, 485360, 485364, 485367,
    492947, 493208, 504327, 504332, 504333, 504339, 504444, 504466, 504467,
    504706, 504842, 504845, 504847, 504891, 540276, 540317, 588342, 588453,
    588456, 588579, 588590, 588591, 588795, 588855, 602179, 602233, 602310,
    602313, 602332, 624170, 624171, 624173, 624202, 624246, 624287, 624288,
    624291, 624296, 624297, 624417, 651635, 651644, 651768, 651965, 652025,
    652104, 652105, 652106, 686970, 686978, 686979, 720504, 720532, 720542,
    720551, 720553, 720579, 720580, 720707, 720708, 720709, 720711, 743255,
    743266, 875, 881, 883, 884, 885, 887, 891, 899, 902, 903, 904, 912, 914,
    915, 924, 925, 926, 927, 938, 995,
]

PCBA = register(DatasetSpec(
    name="pcba", filename="pcba.csv", smiles_col=129,
    label_cols=list(range(128)),
    tasks=[f"PCBA-{a}" for a in _PCBA_AIDS],
    task_type="class",
))
