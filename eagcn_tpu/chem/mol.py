"""In-memory molecule structures and the chemistry error taxonomy.

Replaces the reference's RDKit `Mol` + `Graph`/`Node`/`Edge` IR
(`eagcn_pytorch/neural_fp.py:16-149`) with plain Python dataclasses that the
pure-array featurizer (`featurize.py`) consumes.  The error taxonomy mirrors
the exception classes the reference uses as row filters
(`neural_fp.py:527-537`, consumed at `EAGCN_dataset.py:109-119`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from .periodic import monoisotopic_mass

# Bond order encoding.  Aromatic bonds use 1.5, matching RDKit's
# GetBondTypeAsDouble one-hot domain [1.0, 1.5, 2.0, 3.0]
# (`neural_fp.py:214`).
SINGLE, AROMATIC, DOUBLE, TRIPLE = 1.0, 1.5, 2.0, 3.0

SP, SP2, SP3, HYB_OTHER = 1, 2, 3, 0


class ChemError(Exception):
    """Base class for all chemistry-layer errors (row filters)."""


class ParseError(ChemError):
    """SMILES string could not be parsed.

    Plays the role of the reference's `mol is None` -> `AttributeError`
    path (`EAGCN_dataset.py:109-110`)."""


class GraphError(ChemError):
    """Molecule has no atoms or no bonds (`neural_fp.py:59-62`)."""


class AtomError(ChemError):
    """Molecule contains an atom outside the supported whitelist
    (`neural_fp.py:237-241`, `neural_fp.py:308-309`)."""


class FeaturizeError(ChemError):
    """A feature value fell outside its one-hot domain (the reference's
    `OneHotError`, `neural_fp.py:339-344`; note the reference would crash on
    this — we filter the row instead)."""


class SubtypeError(ChemError):
    """Kept for taxonomy parity with `neural_fp.py:536-537`; the reference
    path can no longer trigger it (every atom receives a subtype)."""


@dataclass
class Atom:
    atomic_num: int
    aromatic: bool = False
    charge: int = 0
    explicit_h: Optional[int] = None    # from brackets; None => compute
    isotope: int = 0
    # --- filled by perception ---
    implicit_h: int = 0
    in_ring: bool = False
    hybridization: int = SP3
    degree: int = 0                     # number of explicit neighbours
    idx: int = -1
    subtype: int = 0                    # 1-based index into SUBTYPE_LIST

    @property
    def total_h(self) -> int:
        return self.explicit_h if self.explicit_h is not None else self.implicit_h


@dataclass
class Bond:
    a1: int
    a2: int
    order: float = SINGLE               # 1.0 / 1.5 / 2.0 / 3.0
    aromatic: bool = False
    in_ring: bool = False
    conjugated: bool = False

    def other(self, i: int) -> int:
        return self.a2 if i == self.a1 else self.a1


@dataclass
class Mol:
    atoms: List[Atom] = field(default_factory=list)
    bonds: List[Bond] = field(default_factory=list)
    smiles: str = ""

    @property
    def num_atoms(self) -> int:
        return len(self.atoms)

    @property
    def num_bonds(self) -> int:
        return len(self.bonds)

    def neighbors(self, i: int) -> List[Tuple[int, int]]:
        """Returns [(atom_idx, bond_idx)] for atom i."""
        out = []
        for b_idx, b in enumerate(self.bonds):
            if b.a1 == i:
                out.append((b.a2, b_idx))
            elif b.a2 == i:
                out.append((b.a1, b_idx))
        return out

    def adjacency(self) -> List[List[Tuple[int, int]]]:
        """Adjacency list: adj[i] = [(neighbor_atom, bond_idx), ...]."""
        adj: List[List[Tuple[int, int]]] = [[] for _ in self.atoms]
        for b_idx, b in enumerate(self.bonds):
            adj[b.a1].append((b.a2, b_idx))
            adj[b.a2].append((b.a1, b_idx))
        return adj

    def exact_mol_wt(self) -> float:
        """Monoisotopic molecular weight including implicit/explicit Hs —
        the analogue of `Descriptors.ExactMolWt` used by the MolWt>700
        filter (`eagcn_pytorch/utils.py:898-915`)."""
        wt = 0.0
        h_mass = monoisotopic_mass(1)
        for a in self.atoms:
            wt += monoisotopic_mass(a.atomic_num)
            wt += a.total_h * h_mass
        return wt
