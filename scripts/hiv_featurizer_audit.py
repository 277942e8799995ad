"""HIV featurizer-drift audit (VERDICT r4, Missing #1 suspect (c)).

The from-scratch SMILES/perception stack (`eagcn_tpu/chem/`) replaces
RDKit, which this environment lacks — so drift vs the reference's
featurization (`eagcn_pytorch/neural_fp.py:152-267`) can't be diffed
directly.  This audit drives the comparison through invariants instead:

1. Row-filter parity signals: kept-row count, per-category skip stats,
   and the kept-set max atom count vs the reference's own in-comment
   ground truth (`utils.py:590-592`: HIV pads to 222 atoms, Tox21 to 132
   — i.e. the RDKit-kept sets have those maxima).
2. Dataset chemistry statistics (aromatic fraction, ring fraction, bond
   order histogram, atomic-number histogram, formal charges), overall and
   for the HIV-active positives (AUC hinges on ~1400 positives).
3. Kekule-vs-aromatic input-form invariance on HIV-relevant heterocycles
   (purines, azoles, quinolines...): both encodings of the same molecule
   must featurize identically; any mismatch is a perception bug.

Writes runs/hiv_featurizer_audit.json.
"""
import json
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

import numpy as np

from eagcn_tpu.chem import featurize_smiles, mol_from_smiles
from eagcn_tpu.data import get_spec, load_dataset

OUT = "/root/repo/runs/hiv_featurizer_audit.json"

# (name, aromatic form, kekule form) — cores ubiquitous in HIV-screen
# chemistry.  Forms are alternative encodings of the SAME molecule.
PAIRS = [
    ("benzene", "c1ccccc1", "C1=CC=CC=C1"),
    ("pyridine", "c1ccncc1", "C1=CC=NC=C1"),
    ("pyrimidine", "c1cncnc1", "C1=CN=CN=C1"),
    ("pyrazine", "c1cnccn1", "C1=CN=CC=N1"),
    ("imidazole", "c1c[nH]cn1", "C1=CNC=N1"),
    ("pyrazole", "c1cc[nH]n1", "C1=CC=NN1"),
    ("1,2,4-triazole", "c1nc[nH]n1", "C1=NC=NN1"),
    ("tetrazole", "c1nnn[nH]1", "C1=NN=NN1"),
    ("thiazole", "c1cscn1", "C1=CSC=N1"),
    ("oxazole", "c1cocn1", "C1=COC=N1"),
    ("isoxazole", "c1cc(on1)", "C1=CC=NO1"),
    ("furan", "c1ccoc1", "C1=CC=CO1"),
    ("thiophene", "c1ccsc1", "C1=CC=CS1"),
    ("pyrrole", "c1cc[nH]c1", "C1=CC=CN1"),
    ("naphthalene", "c1ccc2ccccc2c1", "C1=CC=C2C=CC=CC2=C1"),
    ("quinoline", "c1ccc2ncccc2c1", "C1=CC=C2N=CC=CC2=C1"),
    ("isoquinoline", "c1ccc2cnccc2c1", "C1=CC=C2C=NC=CC2=C1"),
    ("indole", "c1ccc2[nH]ccc2c1", "C1=CC=C2NC=CC2=C1"),
    ("benzimidazole", "c1ccc2[nH]cnc2c1", "C1=CC=C2NC=NC2=C1"),
    ("purine", "c1ncc2[nH]cnc2n1", "C1=NC=C2NC=NC2=N1"),
    ("quinazoline", "c1ccc2ncncc2c1", "C1=CC=C2N=CN=CC2=C1"),
    ("pteridine-core", "c1cnc2ncncc2n1", "C1=CN=C2N=CN=CC2=N1"),
    ("benzothiazole", "c1ccc2scnc2c1", "C1=CC=C2SC=NC2=C1"),
    ("benzofuran", "c1ccc2occc2c1", "C1=CC=C2OC=CC2=C1"),
    ("phenol", "Oc1ccccc1", "OC1=CC=CC=C1"),
    ("aniline", "Nc1ccccc1", "NC1=CC=CC=C1"),
    ("nitrobenzene", "O=[N+]([O-])c1ccccc1", "O=[N+]([O-])C1=CC=CC=C1"),
    ("benzenesulfonamide", "NS(=O)(=O)c1ccccc1", "NS(=O)(=O)C1=CC=CC=C1"),
    ("pyridinium", "c1cc[nH+]cc1", "C1=CC=[NH+]C=C1"),
]


def graph_fingerprint(g):
    """Order-independent fingerprint of a featurized graph."""
    rows = sorted(tuple(r) for r in np.asarray(g.atom_features).round(6))
    bonds = sorted(
        (min(int(a), int(b)), max(int(a), int(b))) + tuple(int(x) for x in rel)
        for (a, b), rel in zip(g.bonds, g.bond_relations))
    return (rows, bonds)


def pair_invariance():
    results = []
    for name, arom, kek in PAIRS:
        row = {"name": name}
        try:
            ga = featurize_smiles(arom, [])
            gk = featurize_smiles(kek, [])
            row["match"] = graph_fingerprint(ga) == graph_fingerprint(gk)
            if not row["match"]:
                aa = np.asarray(ga.atom_features)
                ak = np.asarray(gk.atom_features)
                row["aromatic_atoms"] = [int(aa[:, 23].sum()),
                                         int(ak[:, 23].sum())]
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {e}"
        results.append(row)
    return results


def dataset_stats(name):
    ds = load_dataset(get_spec(name))
    sizes = ds.sizes()
    arom_atoms = tot_atoms = ring_atoms = 0
    order_hist = Counter()
    z_hist = Counter()
    charge_hist = Counter()
    pos_arom = pos_tot = 0
    labels = np.asarray(ds.labels)
    for i, g in enumerate(ds.graphs):
        af = np.asarray(g.atom_features)
        n = af.shape[0]
        tot_atoms += n
        na = int(af[:, 23].sum())
        arom_atoms += na
        ring_atoms += int(af[:, 22].sum())
        if labels.shape[1] == 1 and labels[i, 0] > 0.5:
            pos_tot += n
            pos_arom += na
        for rel in np.asarray(g.bond_relations):
            order_hist[int(rel[1])] += 1
        # one-hot atomic number block is features 0..9
        for r in af:
            z_hist[int(np.argmax(r[:10]))] += 1
            charge_hist[round(float(r[21]), 3)] += 1
    return {
        "kept_rows": len(ds),
        "skip_stats": ds.skip_stats,
        "n_bfeat": ds.n_bfeat,
        "max_atoms_kept": int(sizes.max()),
        "mean_atoms": round(float(sizes.mean()), 2),
        "aromatic_atom_fraction": round(arom_atoms / tot_atoms, 4),
        "ring_atom_fraction": round(ring_atoms / tot_atoms, 4),
        "bond_order_hist": dict(order_hist),
        "atomz_onehot_hist": dict(z_hist),
        "formal_charge_hist": {str(k): v for k, v in charge_hist.items()},
        "positives_aromatic_fraction": (
            round(pos_arom / pos_tot, 4) if pos_tot else None),
    }


def main():
    out = {"pair_invariance": pair_invariance()}
    bad = [r for r in out["pair_invariance"]
           if not r.get("match", False)]
    print(f"kekule/aromatic pairs: {len(PAIRS) - len(bad)}/{len(PAIRS)} "
          f"invariant; failures: {[r['name'] for r in bad]}", flush=True)
    for name, ref_max in (("hiv", 222), ("tox21", 132)):
        print(f"featurizing {name}...", flush=True)
        st = dataset_stats(name)
        st["reference_max_atoms"] = ref_max      # utils.py:590-592 comments
        st["max_atoms_matches_reference"] = st["max_atoms_kept"] == ref_max
        out[name] = st
        print(json.dumps({k: st[k] for k in (
            "kept_rows", "max_atoms_kept", "reference_max_atoms",
            "max_atoms_matches_reference", "aromatic_atom_fraction")},
            indent=None), flush=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
