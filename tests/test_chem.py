"""Chemistry-layer tests: SMILES parsing, perception, featurization.

Mirrors the reference's featurizer semantics (`eagcn_pytorch/neural_fp.py`)
via fixed-molecule probes — the `sizeAttributeVectorsAtt` 'CC' trick
(`neural_fp.py:354-360`) generalized."""

import numpy as np
import pytest

from eagcn_tpu.chem import (
    AtomError,
    FeaturizeError,
    GraphError,
    ParseError,
    atom_feature_vector,
    dense_relation_tensors,
    featurize_smiles,
    mol_from_smiles,
    parse_smiles,
)


class TestParser:
    def test_ethane(self):
        m = parse_smiles("CC")
        assert m.num_atoms == 2 and m.num_bonds == 1
        assert m.bonds[0].order == 1.0

    def test_bond_orders(self):
        m = parse_smiles("C=C")
        assert m.bonds[0].order == 2.0
        m = parse_smiles("C#N")
        assert m.bonds[0].order == 3.0

    def test_branches(self):
        m = parse_smiles("CC(C)(C)C")  # neopentane
        assert m.num_atoms == 5 and m.num_bonds == 4
        assert m.atoms[1].degree == 0 or True  # degree set by perceive

    def test_ring_closure(self):
        m = parse_smiles("C1CCCCC1")
        assert m.num_atoms == 6 and m.num_bonds == 6

    def test_percent_ring_closure(self):
        m = parse_smiles("C%12CCCCC%12")
        assert m.num_bonds == 6

    def test_brackets(self):
        m = parse_smiles("[NH4+]")
        a = m.atoms[0]
        assert a.atomic_num == 7 and a.charge == 1 and a.explicit_h == 4

    def test_charges(self):
        assert parse_smiles("[O-]").atoms[0].charge == -1
        assert parse_smiles("[Fe+3]").atoms[0].charge == 3
        assert parse_smiles("[Ca++]").atoms[0].charge == 2

    def test_isotope_and_class(self):
        a = parse_smiles("[13CH4:2]").atoms[0]
        assert a.isotope == 13 and a.explicit_h == 4

    def test_fragments(self):
        m = parse_smiles("[Na+].[Cl-]")
        assert m.num_atoms == 2 and m.num_bonds == 0

    def test_stereo_slashes_are_single(self):
        m = parse_smiles("C/C=C/C")
        orders = sorted(b.order for b in m.bonds)
        assert orders == [1.0, 1.0, 2.0]

    def test_chirality_skipped(self):
        m = parse_smiles("N[C@@H](C)C(=O)O")  # alanine
        assert m.num_atoms == 6

    def test_errors(self):
        for bad in ["", "C(", "C1CC", "CQ", "C==C", "[]", "C)"]:
            with pytest.raises(ParseError):
                parse_smiles(bad)


class TestPerception:
    def test_benzene_kekule_equals_aromatic(self):
        for smi in ["c1ccccc1", "C1=CC=CC=C1"]:
            m = mol_from_smiles(smi)
            assert all(a.aromatic for a in m.atoms), smi
            assert all(b.order == 1.5 for b in m.bonds), smi
            assert all(a.total_h == 1 for a in m.atoms), smi
            assert all(a.in_ring for a in m.atoms), smi

    def test_pyridine(self):
        m = mol_from_smiles("c1ccncc1")
        n = next(a for a in m.atoms if a.atomic_num == 7)
        assert n.aromatic and n.total_h == 0

    def test_pyrrole(self):
        m = mol_from_smiles("c1cc[nH]1" if False else "c1cc[nH]c1")
        n = next(a for a in m.atoms if a.atomic_num == 7)
        assert n.aromatic and n.total_h == 1

    def test_kekule_pyrrole(self):
        m = mol_from_smiles("C1=CC=CN1")
        n = next(a for a in m.atoms if a.atomic_num == 7)
        assert n.aromatic and n.total_h == 1

    def test_furan_thiophene(self):
        for smi, z in [("c1ccoc1", 8), ("c1ccsc1", 16)]:
            m = mol_from_smiles(smi)
            het = next(a for a in m.atoms if a.atomic_num == z)
            assert het.aromatic and het.total_h == 0

    def test_cyclohexane_not_aromatic(self):
        m = mol_from_smiles("C1CCCCC1")
        assert not any(a.aromatic for a in m.atoms)
        assert all(a.in_ring for a in m.atoms)
        assert all(a.total_h == 2 for a in m.atoms)

    def test_cyclohexene_not_aromatic(self):
        m = mol_from_smiles("C1=CCCCC1")
        assert not any(a.aromatic for a in m.atoms)

    def test_naphthalene_kekule(self):
        m = mol_from_smiles("C1=CC2=CC=CC=C2C=C1")
        assert all(a.aromatic for a in m.atoms)

    def test_implicit_h(self):
        cases = {
            "C": 4, "N": 3, "O": 2, "Cl": 1, "S": 2, "P": 3,
        }
        for smi, h in cases.items():
            m = parse_smiles(smi)
            from eagcn_tpu.chem.perception import perceive
            perceive(m)
            assert m.atoms[0].total_h == h, smi

    def test_hypervalent_sulfur(self):
        m = mol_from_smiles("CS(=O)(=O)C")  # sulfone: S valence 6
        s = next(a for a in m.atoms if a.atomic_num == 16)
        assert s.total_h == 0

    def test_conjugation(self):
        # butadiene: all three C-C bonds conjugated
        m = mol_from_smiles("C=CC=C")
        assert all(b.conjugated for b in m.bonds)
        # acetone: C-C singles not conjugated, C=O not conjugated
        m = mol_from_smiles("CC(=O)C")
        singles = [b for b in m.bonds if b.order == 1.0]
        assert not any(b.conjugated for b in singles)
        # amide N-C(=O) conjugated
        m = mol_from_smiles("CC(=O)NC")
        n_idx = next(a.idx for a in m.atoms if a.atomic_num == 7)
        nc = [b for b in m.bonds if n_idx in (b.a1, b.a2) and b.order == 1.0]
        carbonyl_c = next(
            b for b in nc
            if any(ob.order == 2.0 and (ob.a1 in (b.a1, b.a2) or ob.a2 in (b.a1, b.a2))
                   for ob in m.bonds)
        )
        assert carbonyl_c.conjugated

    def test_ring_membership_spiro_vs_chain(self):
        m = mol_from_smiles("C1CC1CCC")  # cyclopropane + chain
        ring_atoms = [a.in_ring for a in m.atoms]
        assert ring_atoms == [True, True, True, False, False, False]

    def test_molwt(self):
        # caffeine monoisotopic mass 194.0804
        m = mol_from_smiles("CN1C=NC2=C1C(=O)N(C(=O)N2C)C")
        assert abs(m.exact_mol_wt() - 194.0804) < 0.01


class TestFeaturizer:
    def test_ethane_features(self):
        g = featurize_smiles("CC", ["6_6"])
        assert g.atom_features.shape == (2, 24)
        f = g.atom_features[0]
        # one-hot C at index 1; 1 heavy neighbour -> index 10+1; 3 Hs -> 16+3
        expect = np.zeros(24, np.float32)
        expect[1] = expect[11] = expect[19] = 1.0
        np.testing.assert_array_equal(f, expect)
        # relations: type 6_6 -> 0, order single -> 0, not arom/conj/ring -> 1
        np.testing.assert_array_equal(g.bond_relations[0], [0, 0, 1, 1, 1])

    def test_type_fill_to_last(self):
        # unknown bond type maps to LAST index (oneHotVector_with_fill)
        g = featurize_smiles("CO", ["6_6", "Others"])
        assert g.bond_relations[0, 0] == 1

    def test_charge_and_ring_flags(self):
        g = featurize_smiles("c1ccccc1", ["6_6"])
        assert np.all(g.atom_features[:, 22] == 1)  # in ring
        assert np.all(g.atom_features[:, 23] == 1)  # aromatic
        assert np.all(g.bond_relations[:, 1] == 1)  # order 1.5 -> idx 1
        assert np.all(g.bond_relations[:, 2] == 0)  # aromatic channel 0

    def test_atom_error(self):
        with pytest.raises(AtomError):
            featurize_smiles("C[Si](C)C", ["6_6"])

    def test_graph_error_single_atom(self):
        with pytest.raises(GraphError):
            featurize_smiles("C", ["6_6"])

    def test_dense_roundtrip(self):
        g = featurize_smiles("CN(C)C(=O)c1ccc(cc1)OC", ["6_6", "6_7", "6_8"])
        adj, type_t, order_t, arom_t, conj_t, ring_t = dense_relation_tensors(g, 3)
        n = g.num_atoms
        assert adj.shape == (n, n)
        np.testing.assert_array_equal(adj, adj.T)
        assert np.all(np.diag(adj) == 0)  # neural_fp.py:89-93 zero diagonals
        # each bonded pair sets exactly one channel in each relation tensor
        assert type_t.sum() == 2 * g.num_bonds
        assert order_t.sum() == 2 * g.num_bonds
        deg = adj.sum(1)
        assert deg.max() <= 5

    def test_freesolv_first_rows(self, data_dir):
        import csv
        rows = list(csv.reader(open(f"{data_dir}/SAMPL.csv")))[1:20]
        for r in rows:
            g = featurize_smiles(r[1], ["6_6", "Others"])
            assert g.num_atoms > 1


class TestFusedKekuleAromaticity:
    """Round-5 audit regression: chord-only cycle bases missed the benzo
    ring of fused 5-6 bicyclics written in Kekule form, so indole/purine
    scaffolds featurized half-aromatic (perception.py:_small_rings)."""

    PAIRS = [
        ("indole", "c1ccc2[nH]ccc2c1", "C1=CC=C2NC=CC2=C1"),
        ("benzimidazole", "c1ccc2[nH]cnc2c1", "C1=CC=C2NC=NC2=C1"),
        ("purine", "c1ncc2[nH]cnc2n1", "C1=NC=C2NC=NC2=N1"),
        ("benzothiazole", "c1ccc2scnc2c1", "C1=CC=C2SC=NC2=C1"),
        ("benzofuran", "c1ccc2occc2c1", "C1=CC=C2OC=CC2=C1"),
    ]

    def test_kekule_fused_bicyclics_fully_aromatic(self):
        from eagcn_tpu.chem import mol_from_smiles

        for name, arom, kek in self.PAIRS:
            ma = mol_from_smiles(arom)
            mk = mol_from_smiles(kek)
            assert all(a.aromatic for a in ma.atoms), name
            assert all(a.aromatic for a in mk.atoms), f"{name} (kekule)"

    def test_kekule_fused_featurization_matches_aromatic_form(self):
        from eagcn_tpu.chem import featurize_smiles
        import numpy as np

        for name, arom, kek in self.PAIRS:
            ga = featurize_smiles(arom, [])
            gk = featurize_smiles(kek, [])
            fa = sorted(tuple(r) for r in np.asarray(ga.atom_features))
            fk = sorted(tuple(r) for r in np.asarray(gk.atom_features))
            assert fa == fk, name
