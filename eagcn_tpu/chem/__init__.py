"""Host-side chemistry layer: SMILES parsing, perception, featurization.

RDKit-free replacement for the reference's L0 featurization layer
(`eagcn_pytorch/neural_fp.py`).  Everything here runs on the host and emits
pure numpy arrays; nothing in this package touches JAX.
"""

from .mol import (
    Atom,
    AtomError,
    Bond,
    ChemError,
    FeaturizeError,
    GraphError,
    Mol,
    ParseError,
    SubtypeError,
)
from .smiles import parse_smiles
from .perception import perceive, SUBTYPE_LIST
from .featurize import (
    MolGraph,
    NUM_ATOM_FEATURES,
    ORDER_DOMAIN,
    SELECTED_ATOMS,
    atom_feature_vector,
    bond_type_name,
    count_mol_types,
    dense_relation_tensors,
    featurize_mol,
    featurize_smiles,
    filter_types,
    mol_from_smiles,
)

__all__ = [
    "Atom", "AtomError", "Bond", "ChemError", "FeaturizeError", "GraphError",
    "Mol", "ParseError", "SubtypeError", "parse_smiles", "perceive",
    "SUBTYPE_LIST", "MolGraph", "NUM_ATOM_FEATURES", "ORDER_DOMAIN",
    "SELECTED_ATOMS", "atom_feature_vector", "bond_type_name",
    "count_mol_types", "dense_relation_tensors", "featurize_mol",
    "featurize_smiles", "filter_types", "mol_from_smiles",
]
