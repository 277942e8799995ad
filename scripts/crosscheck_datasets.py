"""Cross-check the native (C++) featurizer against the pure-Python path on
EVERY row of HIV (82k) and Lipophilicity, then warm the array caches for
both datasets (load_dataset writes the .npz bundle).

Round-1 verdict flagged that `csrc/featurizer.cpp` claimed validation on
all four MoleculeNet CSVs while only freesolv (full) + tox21 (sampled) were
checked.  This makes the claim true and records the skip taxonomy.

Run: python scripts/crosscheck_datasets.py  (CPU-only, no TPU needed)
"""
import csv
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from eagcn_tpu.chem import ChemError, featurize_smiles, mol_from_smiles
from eagcn_tpu.chem.native import native_available, native_featurize

assert native_available(), "native library must be built"

t0 = time.time()


def log(m):
    print(f"{time.time()-t0:7.1f}s {m}", flush=True)


def compare_one(smi):
    r = native_featurize(smi)
    try:
        g = featurize_smiles(smi, ["Others"])
        py_err = None
    except ChemError as e:
        py_err = type(e).__name__
        assert r.error != 0, f"python rejected {smi} ({py_err}), native accepted"
        return py_err
    assert r.error == 0, f"native rejected {smi} (err {r.error}), python accepted"
    np.testing.assert_array_equal(r.atom_features, g.atom_features, err_msg=smi)
    np.testing.assert_array_equal(r.subtypes, g.subtypes, err_msg=smi)
    np.testing.assert_array_equal(r.bonds, g.bonds, err_msg=smi)
    np.testing.assert_array_equal(r.bond_feats, g.bond_relations[:, 1:],
                                  err_msg=smi)
    mol = mol_from_smiles(smi)
    assert abs(r.mol_wt - mol.exact_mol_wt()) < 1e-9, smi
    return None


def crosscheck(csv_name, smiles_col):
    rows = list(csv.reader(open(f"/root/reference/Data/{csv_name}")))[1:]
    stats = {"ok": 0}
    mismatches = 0
    for i, row in enumerate(rows):
        if not row or not row[smiles_col]:
            continue
        try:
            err = compare_one(row[smiles_col])
        except AssertionError as e:
            mismatches += 1
            log(f"MISMATCH row {i}: {e}")
            if mismatches > 10:
                raise
            continue
        key = err or "ok"
        stats[key] = stats.get(key, 0) + 1
        if (i + 1) % 10000 == 0:
            log(f"{csv_name}: {i+1}/{len(rows)} rows, stats={stats}")
    log(f"{csv_name} DONE: {json.dumps(stats)}, mismatches={mismatches}")
    return stats, mismatches


results = {}
for name, csvf, col in (("lipo", "Lipophilicity.csv", 2),
                        ("hiv", "HIV.csv", 0)):
    stats, mism = crosscheck(csvf, col)
    results[name] = {"stats": stats, "mismatches": mism}

with open("/root/repo/runs/native_crosscheck.json", "w") as f:
    json.dump(results, f, indent=1)
log("crosscheck results written")

# warm the array caches (uses the native path end-to-end)
from eagcn_tpu.data import get_spec, load_dataset

for name in ("lipo", "hiv", "tox21", "freesolv"):
    ds = load_dataset(get_spec(name))
    log(f"{name}: cached {len(ds.graphs)} mols, skips={ds.skip_stats}")
