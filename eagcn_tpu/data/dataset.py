"""Dataset framework: CSV -> featurized sparse arrays with caching.

Re-designs the reference's `EAGCN_Dataset` (`eagcn_pytorch/EAGCN_dataset.py`)
for a TPU pipeline: where the reference re-runs the full RDKit featurization
on every startup and caches only a cleaned CSV
(`EAGCN_dataset.py:33-37,104-108`), we cache the *arrays* (single `.npz`
bundle + JSON metadata) so subsequent runs skip host chemistry entirely.

Row-filtering semantics mirror the reference exactly:
  * empty rows skipped (`EAGCN_dataset.py:64-65`)
  * unparseable SMILES -> skip (`:109-110`, AttributeError path)
  * empty-SMILES / MolWt>700 -> skip (`utils.py:898-915` mol_remover)
  * atoms outside the 10-element whitelist -> skip (AtomError)
  * atomless / bondless molecules -> skip (GraphError)
  * molecules above `size_cutoff=1000` atoms dropped (`EAGCN_dataset.py:31`,
    `data_filter` `:236-254`)
  * classification labels: '' -> -1 (missing), `:84-86`
Features are min-max normalized with DATASET-GLOBAL per-feature statistics
(`EAGCN_dataset.py:206-234` — computed before splitting, replicated as-is).
"""

from __future__ import annotations

import csv
import hashlib
import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..chem import (
    ChemError,
    MolGraph,
    count_mol_types,
    featurize_mol,
    filter_types,
    mol_from_smiles,
)

DEFAULT_DATA_DIR = os.environ.get("EAGCN_DATA", "/root/reference/Data")
DEFAULT_CACHE_DIR = os.environ.get(
    "EAGCN_CACHE", os.path.join(os.path.dirname(__file__), "..", "..", ".cache")
)


@dataclass
class DatasetSpec:
    """Static description of one benchmark (the registry entry)."""
    name: str
    filename: str
    smiles_col: int
    label_cols: Sequence[int]
    tasks: Sequence[str]
    task_type: str                      # 'reg' | 'class'
    delimiter: str = ","
    label_encoding: Optional[Dict[str, float]] = None  # e.g. NIH Active/Inactive
    bondtype_freq: int = 0              # EAGCN_dataset.py:29
    atomtype_freq: int = 0
    size_cutoff: int = 1000             # EAGCN_dataset.py:31
    molwt_cutoff: float = 700.0         # utils.py:905


@dataclass
class FeaturizedDataset:
    """All kept molecules of one benchmark as flat arrays."""
    spec: DatasetSpec
    graphs: List[MolGraph]
    labels: np.ndarray                  # [n_mols, n_tasks] float32
    smiles: List[str]
    bondtype_list: List[str]
    atomtype_list: List
    feat_min: np.ndarray                # [24] pre-normalization stats
    feat_max: np.ndarray
    skip_stats: Dict[str, int] = field(default_factory=dict)

    _concat_cache: Optional[tuple] = None

    @property
    def n_bfeat(self) -> int:
        return len(self.bondtype_list)

    def concat_arrays(self):
        """Concatenated per-molecule arrays + offsets for the native batch
        packer (built once, cached)."""
        if self._concat_cache is None:
            node_off = np.zeros(len(self.graphs) + 1, np.int64)
            bond_off = np.zeros(len(self.graphs) + 1, np.int64)
            for i, g in enumerate(self.graphs):
                node_off[i + 1] = node_off[i] + g.num_atoms
                bond_off[i + 1] = bond_off[i] + g.num_bonds
            self._concat_cache = (
                np.ascontiguousarray(
                    np.concatenate([g.atom_features for g in self.graphs])),
                np.ascontiguousarray(
                    np.concatenate([g.bonds for g in self.graphs])),
                np.ascontiguousarray(
                    np.concatenate([g.bond_relations for g in self.graphs])),
                np.ascontiguousarray(
                    np.concatenate([g.subtypes for g in self.graphs])),
                node_off,
                bond_off,
            )
        return self._concat_cache

    @property
    def n_afeat(self) -> int:
        return int(self.graphs[0].atom_features.shape[1])

    def __len__(self) -> int:
        return len(self.graphs)

    def sizes(self) -> np.ndarray:
        return np.array([g.num_atoms for g in self.graphs], dtype=np.int32)


def _read_csv(path: str, delimiter: str) -> List[List[str]]:
    with open(path, "r", newline="") as f:
        return [row for row in csv.reader(f, delimiter=delimiter, quotechar='"')]


def build_type_dicts(
    rows: List[List[str]], spec: DatasetSpec, use_native: bool = True,
) -> Tuple[List[str], List[int]]:
    """Dataset-wide bond/atom type frequency pass
    (`EAGCN_dataset.py:167-197` + `get_filt_types` `:130-165`).  Uses the
    C++ featurizer when available (same counting contract)."""
    bond_counts: Dict[str, int] = {}
    atom_counts: Dict[int, int] = {}
    native = None
    if use_native:
        from ..chem.native import native_available, native_featurize
        if native_available():
            native = native_featurize
    from ..chem.featurize import SELECTED_ATOMS

    for row in rows[1:]:
        if not row:
            continue
        smi = row[spec.smiles_col]
        if native is not None:
            r = native(smi)
            if r.error != 0:
                continue
            zs = np.asarray(SELECTED_ATOMS)[
                r.atom_features[:, :10].argmax(1)]
            for z in zs:
                atom_counts[int(z)] = atom_counts.get(int(z), 0) + 1
            for k in range(r.bond_pair_z.shape[0]):
                name = f"{r.bond_pair_z[k,0]}_{r.bond_pair_z[k,1]}"
                bond_counts[name] = bond_counts.get(name, 0) + 1
            continue
        try:
            mol = mol_from_smiles(smi)
            count_mol_types(mol, bond_counts, atom_counts)
        except ChemError:
            continue
    bondtype_list = filter_types(bond_counts, spec.bondtype_freq)
    atomtype_list = filter_types(atom_counts, spec.atomtype_freq)
    return bondtype_list, atomtype_list


def _parse_labels(row: List[str], spec: DatasetSpec) -> np.ndarray:
    vals = []
    for j in spec.label_cols:
        raw = row[j]
        if spec.label_encoding is not None:
            vals.append(spec.label_encoding.get(raw, -1.0))
        elif spec.task_type == "class":
            vals.append(-1.0 if raw == "" else float(raw))
        else:
            vals.append(float(raw))
    return np.asarray(vals, dtype=np.float32)


_NATIVE_ERROR_NAMES = {1: "ParseError", 2: "AtomError", 3: "GraphError",
                       4: "FeaturizeError"}


def featurize_dataset(
    spec: DatasetSpec,
    data_dir: str = DEFAULT_DATA_DIR,
    limit: Optional[int] = None,
    use_native: bool = True,
) -> FeaturizedDataset:
    path = os.path.join(data_dir, spec.filename)
    rows = _read_csv(path, spec.delimiter)
    bondtype_list, atomtype_list = build_type_dicts(rows, spec, use_native)

    native = None
    if use_native:
        from ..chem.native import native_available, native_featurize
        if native_available():
            native = native_featurize
    bondtype_index = {b: i for i, b in enumerate(bondtype_list)}

    graphs: List[MolGraph] = []
    labels: List[np.ndarray] = []
    smiles: List[str] = []
    skip: Dict[str, int] = {}

    def _skip(key: str) -> None:
        skip[key] = skip.get(key, 0) + 1

    body = rows[1:]
    if limit is not None:
        body = body[: limit]
    for row in body:
        if not row:
            continue
        smi = row[spec.smiles_col]
        if len(smi) == 0:
            _skip("empty_smiles")
            continue
        if native is not None:
            r = native(smi)
            if r.error != 0:
                _skip(_NATIVE_ERROR_NAMES.get(r.error, "ChemError"))
                continue
            if r.mol_wt > spec.molwt_cutoff:
                _skip("too_heavy")
                continue
            if r.atom_features.shape[0] > spec.size_cutoff:
                _skip("too_large")
                continue
            from ..chem.native import resolve_type_ids

            rels = np.empty((r.bonds.shape[0], 5), dtype=np.int32)
            rels[:, 0] = resolve_type_ids(
                r.bond_pair_z, bondtype_index, len(bondtype_list))
            rels[:, 1:] = r.bond_feats
            g = MolGraph(
                atom_features=r.atom_features, bonds=r.bonds,
                bond_relations=rels, subtypes=r.subtypes, smiles=smi,
            )
            try:
                y = _parse_labels(row, spec)
            except ValueError:
                _skip("bad_label")
                continue
            graphs.append(g)
            labels.append(y)
            smiles.append(smi)
            continue
        try:
            mol = mol_from_smiles(smi)
            if mol.exact_mol_wt() > spec.molwt_cutoff:
                _skip("too_heavy")
                continue
            g = featurize_mol(mol, bondtype_list)
            if g.num_atoms > spec.size_cutoff:
                _skip("too_large")
                continue
            y = _parse_labels(row, spec)
        except ChemError as e:
            _skip(type(e).__name__)
            continue
        except ValueError:
            _skip("bad_label")
            continue
        graphs.append(g)
        labels.append(y)
        smiles.append(smi)

    if not graphs:
        raise RuntimeError(f"no molecules survived filtering for {spec.name}")

    label_arr = np.stack(labels).astype(np.float32)
    feat_min, feat_max = _normalize_features_inplace(graphs)
    return FeaturizedDataset(
        spec=spec,
        graphs=graphs,
        labels=label_arr,
        smiles=smiles,
        bondtype_list=bondtype_list,
        atomtype_list=atomtype_list,
        feat_min=feat_min,
        feat_max=feat_max,
        skip_stats=skip,
    )


def _normalize_features_inplace(
    graphs: List[MolGraph],
) -> Tuple[np.ndarray, np.ndarray]:
    """Global min-max scaling over ALL molecules (`EAGCN_dataset.py:206-234`;
    the reference runs this before splitting — replicated, quirk and all)."""
    fmin = graphs[0].atom_features.min(0).copy()
    fmax = graphs[0].atom_features.max(0).copy()
    for g in graphs[1:]:
        fmin = np.minimum(fmin, g.atom_features.min(0))
        fmax = np.maximum(fmax, g.atom_features.max(0))
    diff = fmax - fmin
    diff[diff == 0] = 1.0
    for g in graphs:
        g.atom_features[:] = (g.atom_features - fmin) / diff
    return fmin, fmax


# --------------------------------------------------------------------------
# array cache (npz bundle)
# --------------------------------------------------------------------------

def _cache_key(spec: DatasetSpec, data_dir: str, limit: Optional[int]) -> str:
    src = os.path.join(data_dir, spec.filename)
    stat = os.stat(src)
    h = hashlib.sha1(
        json.dumps(
            [spec.name, spec.filename, list(spec.label_cols), spec.smiles_col,
             stat.st_size, int(stat.st_mtime), limit, "v1"]
        ).encode()
    ).hexdigest()[:12]
    return f"{spec.name}_{h}"


def save_cache(ds: FeaturizedDataset, cache_dir: str, key: str) -> str:
    os.makedirs(cache_dir, exist_ok=True)
    node_off = np.zeros(len(ds.graphs) + 1, dtype=np.int64)
    bond_off = np.zeros(len(ds.graphs) + 1, dtype=np.int64)
    for i, g in enumerate(ds.graphs):
        node_off[i + 1] = node_off[i] + g.num_atoms
        bond_off[i + 1] = bond_off[i] + g.num_bonds
    afm = np.concatenate([g.atom_features for g in ds.graphs])
    bonds = np.concatenate([g.bonds for g in ds.graphs])
    rels = np.concatenate([g.bond_relations for g in ds.graphs])
    subs = np.concatenate([g.subtypes for g in ds.graphs])
    path = os.path.join(cache_dir, key + ".npz")
    np.savez_compressed(
        path,
        afm=afm, bonds=bonds, rels=rels, subtypes=subs,
        node_offsets=node_off, bond_offsets=bond_off,
        labels=ds.labels,
        smiles=np.asarray(ds.smiles, dtype=object),
        feat_min=ds.feat_min, feat_max=ds.feat_max,
    )
    meta = {
        "bondtype_list": ds.bondtype_list,
        "atomtype_list": ds.atomtype_list,
        "skip_stats": ds.skip_stats,
        "tasks": list(ds.spec.tasks),
    }
    with open(os.path.join(cache_dir, key + ".json"), "w") as f:
        json.dump(meta, f)
    return path


def load_cache(
    spec: DatasetSpec, cache_dir: str, key: str
) -> Optional[FeaturizedDataset]:
    npz_path = os.path.join(cache_dir, key + ".npz")
    json_path = os.path.join(cache_dir, key + ".json")
    if not (os.path.exists(npz_path) and os.path.exists(json_path)):
        return None
    z = np.load(npz_path, allow_pickle=True)
    with open(json_path) as f:
        meta = json.load(f)
    node_off, bond_off = z["node_offsets"], z["bond_offsets"]
    # materialize ONCE: NpzFile re-reads and decompresses the whole zip
    # entry on every __getitem__ — indexing z["afm"] inside the loop was
    # O(n_mols) full decompressions (~hours and ~100 GB of allocation
    # churn on HIV's 39k molecules)
    afm, bonds_a = z["afm"], z["bonds"]
    rels, subtypes = z["rels"], z["subtypes"]
    graphs = []
    smiles = [str(s) for s in z["smiles"]]
    for i in range(len(node_off) - 1):
        graphs.append(
            MolGraph(
                atom_features=afm[node_off[i]:node_off[i + 1]],
                bonds=bonds_a[bond_off[i]:bond_off[i + 1]],
                bond_relations=rels[bond_off[i]:bond_off[i + 1]],
                subtypes=subtypes[node_off[i]:node_off[i + 1]],
                smiles=smiles[i],
            )
        )
    return FeaturizedDataset(
        spec=spec,
        graphs=graphs,
        labels=z["labels"],
        smiles=smiles,
        bondtype_list=list(meta["bondtype_list"]),
        atomtype_list=list(meta["atomtype_list"]),
        feat_min=z["feat_min"],
        feat_max=z["feat_max"],
        skip_stats=dict(meta["skip_stats"]),
    )


def load_dataset(
    spec: DatasetSpec,
    data_dir: str = DEFAULT_DATA_DIR,
    cache_dir: str = DEFAULT_CACHE_DIR,
    use_cache: bool = True,
    limit: Optional[int] = None,
) -> FeaturizedDataset:
    """Featurize (or reload from the array cache)."""
    key = _cache_key(spec, data_dir, limit)
    if use_cache:
        ds = load_cache(spec, cache_dir, key)
        if ds is not None:
            return ds
    ds = featurize_dataset(spec, data_dir, limit=limit)
    if use_cache:
        save_cache(ds, cache_dir, key)
    return ds


# --------------------------------------------------------------------------
# splits & class weights
# --------------------------------------------------------------------------

def train_val_test_split(
    n: int, random_state: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """80/10/10 split replicating the reference's nested
    `train_test_split(test_size=0.2, rs)` then 50/50
    (`EAGCN_dataset.py:357-372`) — uses sklearn for bit-exact index parity."""
    from sklearn.model_selection import train_test_split

    idx = np.arange(n)
    train_idx, vt_idx = train_test_split(idx, test_size=0.2, random_state=random_state)
    val_idx, test_idx = train_test_split(vt_idx, test_size=0.5, random_state=random_state)
    return train_idx, val_idx, test_idx


def bce_class_weights(y_train: np.ndarray) -> np.ndarray:
    """Per-task [w_pos, w_neg] = [5000/pos_count, 5000/neg_count]
    (`utils.py:676-700` set_weight).  Tasks with zero positives in train get
    weight 0 for that side (the reference would KeyError; we are defensive).
    Returns [n_tasks, 2] float32."""
    n_tasks = y_train.shape[1]
    out = np.zeros((n_tasks, 2), dtype=np.float32)
    for j in range(n_tasks):
        pos = int((y_train[:, j] == 1).sum())
        neg = int((y_train[:, j] == 0).sum())
        out[j, 0] = 5000.0 / pos if pos > 0 else 0.0
        out[j, 1] = 5000.0 / neg if neg > 0 else 0.0
    return out
