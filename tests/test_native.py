"""Native (C++) featurizer/packer vs pure-Python: bit-identical outputs."""

import csv

import numpy as np
import pytest

from eagcn_tpu.chem import ChemError, featurize_smiles, mol_from_smiles
from eagcn_tpu.chem.native import (
    native_available,
    native_featurize,
    native_pack,
    resolve_type_ids,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable"
)

PROBES = [
    "CC", "C=C", "C#N", "c1ccccc1", "C1=CC=CC=C1", "CN1C=NC2=C1C(=O)N(C(=O)N2C)C",
    "CN(C)C(=O)c1ccc(cc1)OC", "CS(=O)(=O)Cl", "c1cc[nH]c1", "C1=CC=CN1",
    "c1ccoc1", "c1ccsc1", "CC(=O)NC", "[NH4+].[Cl-]", "C/C=C/C(=O)O",
    "N[C@@H](C)C(=O)O", "O=[N+]([O-])c1ccccc1", "C1CC2CCC1CC2",
]


def _compare_one(smi):
    r = native_featurize(smi)
    try:
        g = featurize_smiles(smi, ["Others"])
        py_err = 0
    except ChemError as e:
        py_err = type(e).__name__
        assert r.error != 0, f"python rejected {smi} ({py_err}), native accepted"
        return
    assert r.error == 0, f"native rejected {smi} (err {r.error}), python accepted"
    np.testing.assert_array_equal(r.atom_features, g.atom_features, err_msg=smi)
    np.testing.assert_array_equal(r.subtypes, g.subtypes, err_msg=smi)
    np.testing.assert_array_equal(r.bonds, g.bonds, err_msg=smi)
    np.testing.assert_array_equal(r.bond_feats, g.bond_relations[:, 1:],
                                  err_msg=smi)
    mol = mol_from_smiles(smi)
    assert abs(r.mol_wt - mol.exact_mol_wt()) < 1e-9, smi


class TestNativeFeaturizer:
    @pytest.mark.parametrize("smi", PROBES)
    def test_probe_molecules(self, smi):
        _compare_one(smi)

    def test_freesolv_full(self, data_dir):
        rows = list(csv.reader(open(f"{data_dir}/SAMPL.csv")))[1:]
        for r in rows:
            if r:
                _compare_one(r[1])

    def test_tox21_sample(self, data_dir):
        rows = list(csv.reader(open(f"{data_dir}/tox21.csv")))[1:]
        for r in rows[::10]:
            if r:
                _compare_one(r[13])

    # Full-corpus cross-checks (every row of all four CSVs, zero
    # mismatches) are run by scripts/crosscheck_datasets.py; artifact at
    # runs/native_crosscheck.json.  CI keeps sampled versions fast.
    def test_hiv_sample(self, data_dir):
        rows = list(csv.reader(open(f"{data_dir}/HIV.csv")))[1:]
        for r in rows[::25]:
            if r:
                _compare_one(r[0])

    def test_lipo_sample(self, data_dir):
        rows = list(csv.reader(open(f"{data_dir}/Lipophilicity.csv")))[1:]
        for r in rows[::5]:
            if r:
                _compare_one(r[2])

    def test_type_resolution(self):
        r = native_featurize("CO")
        ids = resolve_type_ids(r.bond_pair_z, {"6_8": 0, "6_6": 1}, 2)
        assert ids.tolist() == [0]
        ids = resolve_type_ids(r.bond_pair_z, {"6_6": 0, "Others": 1}, 2)
        assert ids.tolist() == [1]  # fill-to-last


class TestNativePacker:
    @pytest.mark.parametrize("tile_size", [0, 32])
    def test_pack_matches_python(self, data_dir, tile_size):
        from eagcn_tpu.data import (
            BatchShape, GraphBatcher, get_spec, load_dataset,
        )
        ds = load_dataset(get_spec("freesolv"))
        idx = list(range(16))
        shape = BatchShape(num_nodes=256 if not tile_size else 512,
                           num_edges=512, num_mols=16, tile_size=tile_size)
        py = GraphBatcher(shape).pack(
            [ds.graphs[i] for i in idx],
            np.stack([ds.labels[i] for i in idx]), idx,
        )
        # concatenated arrays for the native packer
        node_off = np.zeros(len(ds.graphs) + 1, np.int64)
        bond_off = np.zeros(len(ds.graphs) + 1, np.int64)
        for i, g in enumerate(ds.graphs):
            node_off[i + 1] = node_off[i] + g.num_atoms
            bond_off[i + 1] = bond_off[i] + g.num_bonds
        afm = np.concatenate([g.atom_features for g in ds.graphs])
        bonds = np.concatenate([g.bonds for g in ds.graphs])
        rels = np.concatenate([g.bond_relations for g in ds.graphs])
        subs = np.concatenate([g.subtypes for g in ds.graphs])
        out = native_pack(afm, bonds, rels, subs, node_off, bond_off, idx,
                          shape.num_nodes, shape.num_edges, shape.num_mols,
                          shape.max_degree, tile_size=shape.tile_size)
        assert out is not None
        names = ["node_feat", "node_mol", "node_mask", "node_conn",
                 "node_tiny", "node_subtype", "neigh", "neigh_rel",
                 "neigh_mask", "neigh_rev", "edge_src", "edge_dst",
                 "edge_rel", "edge_mask", "mol_size", "mol_index",
                 "mol_mask"]
        if tile_size:
            names += ["tile_adj", "tile_rel"]
        for name in names:
            np.testing.assert_array_equal(
                out[name], getattr(py, name), err_msg=name
            )
