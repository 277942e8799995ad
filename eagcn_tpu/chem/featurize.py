"""SMILES -> pure-array featurizer (sparse, device-ready).

This is the TPU-native replacement for the reference's dense featurizer
(`eagcn_pytorch/neural_fp.py:57-122` `Graph.dump_as_matrices_Att`): instead of
an N x N adjacency plus five C x N x N one-hot relation tensors, it emits a
compact edge list with five integer relation ids per edge.  The one-hot
channel index <-> relation id correspondence is exact:

* ``type_id``  — index into the frequency-ordered bond-type list
  (TypeAtt channel, `neural_fp.py:226-228`; out-of-vocabulary types map to
  the LAST index, replicating `oneHotVector_with_fill`, `neural_fp.py:346`)
* ``order_id`` — index into [1.0, 1.5, 2.0, 3.0] (`neural_fp.py:214`)
* ``arom_id``  — 0 if aromatic else 1 (one-hot over [1.0, 0.0],
  `neural_fp.py:215`)
* ``conj_id``  — 0 if conjugated else 1 (`neural_fp.py:216`)
* ``ring_id``  — 0 if in ring else 1 (`neural_fp.py:217`)

Atom features are the exact 24-dim vector of `neural_fp.py:312-333`:
one-hot atomic number (10) + heavy-neighbor count one-hot (6) + H-count
one-hot (5) + formal charge + in-ring + aromatic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np

from .mol import (
    AtomError,
    FeaturizeError,
    GraphError,
    Mol,
    ParseError,
)
from .perception import perceive
from .smiles import parse_smiles

SELECTED_ATOMS = [5, 6, 7, 8, 9, 15, 16, 17, 35, 53]  # neural_fp.py:152
_SELECTED_INDEX = {z: i for i, z in enumerate(SELECTED_ATOMS)}
ORDER_DOMAIN = [1.0, 1.5, 2.0, 3.0]                    # neural_fp.py:214
NUM_ATOM_FEATURES = 24                                  # utils.py:531


def mol_from_smiles(smiles: str) -> Mol:
    """parse + perceive; raises ParseError on bad input."""
    return perceive(parse_smiles(smiles))


@dataclass
class MolGraph:
    """Sparse per-molecule arrays (host side, numpy)."""
    # [n, 24] float32 raw (un-normalized) atom features
    atom_features: np.ndarray
    # [m, 2] int32 undirected bonds (each bond once; i<j not guaranteed)
    bonds: np.ndarray
    # [m, 5] int32 relation ids: (type_id, order_id, arom_id, conj_id, ring_id)
    bond_relations: np.ndarray
    # [n] int32 subtype labels (1-based; analysis only)
    subtypes: np.ndarray
    smiles: str = ""

    @property
    def num_atoms(self) -> int:
        return int(self.atom_features.shape[0])

    @property
    def num_bonds(self) -> int:
        return int(self.bonds.shape[0])


def bond_type_name(z1: int, z2: int) -> str:
    """Canonical atom-pair bond-type string (`neural_fp.py:219-224`)."""
    if z1 < z2:
        return f"{z1}_{z2}"
    return f"{z2}_{z1}"


def count_mol_types(
    mol: Mol,
    bondtype_counts: Dict[str, int],
    atomtype_counts: Dict[int, int],
) -> None:
    """One molecule's contribution to the dataset type dictionaries
    (`neural_fp.py:363-393`).  Raises AtomError when an atom falls outside
    the whitelist.  Divergence from the reference (documented): the
    reference's in-place dict mutation leaves PARTIAL counts behind for
    rejected molecules; we validate first so rejected molecules contribute
    nothing — deterministic and implementation-independent (the native
    C++ path shares this contract)."""
    for a in mol.atoms:
        if a.atomic_num not in _SELECTED_INDEX:
            raise AtomError(f"atom {a.atomic_num} outside whitelist")
    for a in mol.atoms:
        atomtype_counts[a.atomic_num] = atomtype_counts.get(a.atomic_num, 0) + 1
    for b in mol.bonds:
        z1 = mol.atoms[b.a1].atomic_num
        z2 = mol.atoms[b.a2].atomic_num
        name = bond_type_name(z1, z2)
        bondtype_counts[name] = bondtype_counts.get(name, 0) + 1


def filter_types(
    counts: Dict, freq_threshold: int
) -> List:
    """Frequency-ordered type list with optional 'Others' tail, replicating
    `EAGCN_dataset.get_filt_types` (`EAGCN_dataset.py:130-165`) including
    its tie-breaking (stable ascending sort then reverse)."""
    items = sorted(counts.items(), key=lambda kv: kv[1])
    items.reverse()
    kept = []
    dropped = False
    for key, cnt in items:
        if cnt > freq_threshold:
            kept.append(key)
        else:
            dropped = True
    if dropped:
        kept.append("Others")
    return kept


def _one_hot_index(val, domain: Sequence, what: str) -> int:
    try:
        return domain.index(val)
    except ValueError:
        raise FeaturizeError(f"{what}={val!r} outside domain {list(domain)}")


def _fill_index(val, domain: Sequence) -> int:
    """`oneHotVector_with_fill` (`neural_fp.py:346-351`): out-of-vocabulary
    values map to the LAST element."""
    try:
        return domain.index(val)
    except ValueError:
        return len(domain) - 1


def atom_feature_vector(mol: Mol, idx: int) -> np.ndarray:
    """24-dim atom features (`neural_fp.py:295-337`)."""
    a = mol.atoms[idx]
    if a.atomic_num not in _SELECTED_INDEX:
        raise AtomError(f"atom {a.atomic_num} outside whitelist")
    v = np.zeros((NUM_ATOM_FEATURES,), dtype=np.float32)
    v[_SELECTED_INDEX[a.atomic_num]] = 1.0
    deg = a.degree
    # heavy-neighbour one-hot over [0..5]; the reference would crash with an
    # uncaught OneHotError on degree>5 — we reject the row instead.
    if deg > 5:
        raise FeaturizeError(f"degree {deg} > 5")
    v[10 + deg] = 1.0
    h = a.total_h
    if h > 4:
        raise FeaturizeError(f"H count {h} > 4")
    v[16 + h] = 1.0
    v[21] = float(a.charge)
    v[22] = 1.0 if a.in_ring else 0.0
    v[23] = 1.0 if a.aromatic else 0.0
    return v


def featurize_mol(mol: Mol, bondtype_list: Sequence[str]) -> MolGraph:
    """Mol -> sparse arrays.  Raises GraphError for atomless/bondless mols
    (`neural_fp.py:59-62`), AtomError / FeaturizeError per the taxonomy."""
    if not mol.atoms:
        raise GraphError("no atoms")
    if not mol.bonds:
        raise GraphError("need at least one bond")

    n, m = mol.num_atoms, mol.num_bonds
    afm = np.zeros((n, NUM_ATOM_FEATURES), dtype=np.float32)
    subtypes = np.zeros((n,), dtype=np.int32)
    for i in range(n):
        afm[i] = atom_feature_vector(mol, i)
        subtypes[i] = mol.atoms[i].subtype

    bonds = np.zeros((m, 2), dtype=np.int32)
    rels = np.zeros((m, 5), dtype=np.int32)
    btl = list(bondtype_list)
    for k, b in enumerate(mol.bonds):
        bonds[k, 0], bonds[k, 1] = b.a1, b.a2
        z1 = mol.atoms[b.a1].atomic_num
        z2 = mol.atoms[b.a2].atomic_num
        rels[k, 0] = _fill_index(bond_type_name(z1, z2), btl)
        rels[k, 1] = _one_hot_index(b.order, ORDER_DOMAIN, "bond order")
        rels[k, 2] = 0 if b.aromatic else 1
        rels[k, 3] = 0 if b.conjugated else 1
        rels[k, 4] = 0 if b.in_ring else 1
    return MolGraph(
        atom_features=afm,
        bonds=bonds,
        bond_relations=rels,
        subtypes=subtypes,
        smiles=mol.smiles,
    )


def featurize_smiles(smiles: str, bondtype_list: Sequence[str]) -> MolGraph:
    return featurize_mol(mol_from_smiles(smiles), bondtype_list)


def dense_relation_tensors(
    g: MolGraph, n_bond_types: int
) -> Tuple[np.ndarray, ...]:
    """Reconstructs the reference's dense per-molecule tensors from the
    sparse arrays — (adj, TypeAtt, OrderAtt, AromAtt, ConjAtt, RingAtt)
    exactly as `dump_as_matrices_Att` lays them out (`neural_fp.py:57-122`:
    zero diagonals, symmetric fill).  Used by tests and the numpy oracle."""
    n = g.num_atoms
    adj = np.zeros((n, n), dtype=np.float32)
    type_t = np.zeros((n_bond_types, n, n), dtype=np.float32)
    order_t = np.zeros((4, n, n), dtype=np.float32)
    arom_t = np.zeros((2, n, n), dtype=np.float32)
    conj_t = np.zeros((2, n, n), dtype=np.float32)
    ring_t = np.zeros((2, n, n), dtype=np.float32)
    for k in range(g.num_bonds):
        i, j = int(g.bonds[k, 0]), int(g.bonds[k, 1])
        t, o, ar, cj, rg = (int(x) for x in g.bond_relations[k])
        adj[i, j] = adj[j, i] = 1.0
        type_t[t, i, j] = type_t[t, j, i] = 1.0
        order_t[o, i, j] = order_t[o, j, i] = 1.0
        arom_t[ar, i, j] = arom_t[ar, j, i] = 1.0
        conj_t[cj, i, j] = conj_t[cj, j, i] = 1.0
        ring_t[rg, i, j] = ring_t[rg, j, i] = 1.0
    return adj, type_t, order_t, arom_t, conj_t, ring_t
