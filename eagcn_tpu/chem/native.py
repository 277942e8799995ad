"""ctypes bindings for the native (C++) featurizer and batch packer.

The native library (`csrc/featurizer.cpp`) mirrors the pure-Python chemistry
stack exactly — tests assert bit-identical outputs — and exists for host
throughput: SMILES featurization and mega-graph packing are the two hot
host-side loops feeding the TPU.  If the library is missing it is built
on first use (g++ via csrc/Makefile); if that fails, callers fall back to
the Python implementation transparently."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional, Sequence

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.abspath(os.path.join(_CSRC, "libeagcn_native.so"))
_lock = threading.Lock()
_lib = None
_lib_failed = False


class _MolResult(ctypes.Structure):
    _fields_ = [
        ("error", ctypes.c_int32),
        ("n_atoms", ctypes.c_int32),
        ("n_bonds", ctypes.c_int32),
        ("mol_wt", ctypes.c_double),
        ("atom_features", ctypes.POINTER(ctypes.c_float)),
        ("subtypes", ctypes.POINTER(ctypes.c_int32)),
        ("bonds", ctypes.POINTER(ctypes.c_int32)),
        ("bond_pair_z", ctypes.POINTER(ctypes.c_int32)),
        ("bond_feats", ctypes.POINTER(ctypes.c_int32)),
    ]


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=os.path.abspath(_CSRC), check=True,
            capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Loads (building if needed) the native library, or None."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _lib_failed = True
            return None
        lib.eagcn_featurize.restype = ctypes.POINTER(_MolResult)
        lib.eagcn_featurize.argtypes = [ctypes.c_char_p]
        lib.eagcn_free.argtypes = [ctypes.POINTER(_MolResult)]
        lib.eagcn_pack.restype = ctypes.c_int32
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


# --------------------------------------------------------------------------
# featurizer
# --------------------------------------------------------------------------

class NativeResult:
    """Featurization output before bond-type-id resolution."""
    __slots__ = ("error", "mol_wt", "atom_features", "subtypes", "bonds",
                 "bond_pair_z", "bond_feats")

    def __init__(self, r: _MolResult):
        self.error = int(r.error)
        self.mol_wt = float(r.mol_wt)
        n, m = int(r.n_atoms), int(r.n_bonds)
        if self.error == 0 and n > 0:
            self.atom_features = np.ctypeslib.as_array(
                r.atom_features, (n, 24)).copy()
            self.subtypes = np.ctypeslib.as_array(r.subtypes, (n,)).copy()
            self.bonds = np.ctypeslib.as_array(r.bonds, (m, 2)).copy()
            self.bond_pair_z = np.ctypeslib.as_array(
                r.bond_pair_z, (m, 2)).copy()
            self.bond_feats = np.ctypeslib.as_array(
                r.bond_feats, (m, 4)).copy()
        else:
            self.atom_features = self.subtypes = None
            self.bonds = self.bond_pair_z = self.bond_feats = None


def native_featurize(smiles: str) -> Optional[NativeResult]:
    lib = get_lib()
    if lib is None:
        return None
    ptr = lib.eagcn_featurize(smiles.encode("utf-8"))
    try:
        return NativeResult(ptr.contents)
    finally:
        lib.eagcn_free(ptr)


def resolve_type_ids(
    bond_pair_z: np.ndarray, bondtype_index: Dict[str, int], n_types: int
) -> np.ndarray:
    """bond pair atomic numbers -> TypeAtt channel ids with fill-to-last
    (`neural_fp.py:346-351`)."""
    out = np.empty((bond_pair_z.shape[0],), dtype=np.int32)
    for k in range(bond_pair_z.shape[0]):
        name = f"{bond_pair_z[k,0]}_{bond_pair_z[k,1]}"
        out[k] = bondtype_index.get(name, n_types - 1)
    return out


# --------------------------------------------------------------------------
# batch packer
# --------------------------------------------------------------------------

def native_pack(
    afm: np.ndarray, bonds: np.ndarray, rels: np.ndarray,
    subtypes: np.ndarray, node_off: np.ndarray, bond_off: np.ndarray,
    mol_ids: Sequence[int],
    num_nodes: int, num_edges: int, num_mols: int, max_deg: int,
    tile_size: int = 0,
):
    """Runs the C++ packer; returns dict of output arrays or None when the
    native library is unavailable.  Raises ValueError on budget overflow
    (same contract as GraphBatcher.pack).  `tile_size > 0` enables
    boundary-aligned placement + block-dense tile tensors."""
    lib = get_lib()
    if lib is None:
        return None
    n_feat = afm.shape[1]
    ids = np.ascontiguousarray(np.asarray(mol_ids, dtype=np.int32))
    T = num_nodes // tile_size if tile_size else 0
    S = tile_size
    out = {
        "tile_adj": np.zeros((T, S, S), np.int8),
        "tile_rel": np.zeros((T, 5, S, S), np.int8),
        "node_feat": np.zeros((num_nodes, n_feat), np.float32),
        "node_mol": np.full((num_nodes,), num_mols, np.int32),
        "node_mask": np.zeros((num_nodes,), np.float32),
        "node_conn": np.zeros((num_nodes,), np.float32),
        "node_tiny": np.zeros((num_nodes,), np.float32),
        "node_subtype": np.zeros((num_nodes,), np.int32),
        "neigh": np.zeros((num_nodes, max_deg), np.int32),
        "neigh_rel": np.zeros((num_nodes, max_deg, 5), np.int32),
        "neigh_mask": np.zeros((num_nodes, max_deg), np.float32),
        "neigh_rev": np.zeros((num_nodes, max_deg), np.int32),
        "edge_src": np.zeros((num_edges,), np.int32),
        "edge_dst": np.zeros((num_edges,), np.int32),
        "edge_rel": np.zeros((num_edges, 5), np.int32),
        "edge_mask": np.zeros((num_edges,), np.float32),
        "mol_size": np.zeros((num_mols,), np.float32),
        "mol_index": np.full((num_mols,), -1, np.int32),
        "mol_mask": np.zeros((num_mols,), np.float32),
    }

    def ptr(a, ty):
        return a.ctypes.data_as(ctypes.POINTER(ty))

    rc = lib.eagcn_pack(
        ptr(np.ascontiguousarray(afm, np.float32), ctypes.c_float),
        ptr(np.ascontiguousarray(bonds, np.int32), ctypes.c_int32),
        ptr(np.ascontiguousarray(rels, np.int32), ctypes.c_int32),
        ptr(np.ascontiguousarray(subtypes, np.int32), ctypes.c_int32),
        ptr(np.ascontiguousarray(node_off, np.int64), ctypes.c_int64),
        ptr(np.ascontiguousarray(bond_off, np.int64), ctypes.c_int64),
        ptr(ids, ctypes.c_int32),
        ctypes.c_int32(len(ids)), ctypes.c_int32(n_feat),
        ctypes.c_int32(num_nodes), ctypes.c_int32(num_edges),
        ctypes.c_int32(num_mols), ctypes.c_int32(max_deg),
        ptr(out["node_feat"], ctypes.c_float),
        ptr(out["node_mol"], ctypes.c_int32),
        ptr(out["node_mask"], ctypes.c_float),
        ptr(out["node_conn"], ctypes.c_float),
        ptr(out["node_tiny"], ctypes.c_float),
        ptr(out["node_subtype"], ctypes.c_int32),
        ptr(out["neigh"], ctypes.c_int32),
        ptr(out["neigh_rel"], ctypes.c_int32),
        ptr(out["neigh_mask"], ctypes.c_float),
        ptr(out["neigh_rev"], ctypes.c_int32),
        ptr(out["edge_src"], ctypes.c_int32),
        ptr(out["edge_dst"], ctypes.c_int32),
        ptr(out["edge_rel"], ctypes.c_int32),
        ptr(out["edge_mask"], ctypes.c_float),
        ptr(out["mol_size"], ctypes.c_float),
        ptr(out["mol_index"], ctypes.c_int32),
        ptr(out["mol_mask"], ctypes.c_float),
        ctypes.c_int32(tile_size),
        ptr(out["tile_adj"], ctypes.c_int8),
        ptr(out["tile_rel"], ctypes.c_int8),
    )
    if rc == 1:
        raise ValueError("native pack: batch budget exceeded")
    if rc == 2:
        raise ValueError("native pack: max_degree exceeded")
    return out
