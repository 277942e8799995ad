"""Element tables for the EAGCN-TPU chemistry layer.

The reference framework (Luckick/EAGCN) delegates all chemistry to RDKit
(`eagcn_pytorch/neural_fp.py:4-11`).  This build environment has no RDKit, so
eagcn_tpu ships its own minimal cheminformatics stack.  Only the ten elements
the reference whitelists (`neural_fp.py:152`, `selected_atom_list = [5, 6, 7,
8, 9, 15, 16, 17, 35, 53]`) plus hydrogen need full support; everything else
only needs enough data to be *recognised* (so unknown-atom molecules can be
rejected the same way the reference raises `AtomError`,
`neural_fp.py:237-241`).
"""

from __future__ import annotations

# Atomic numbers for every symbol a SMILES string may mention.  Two-letter
# symbols must be checked before one-letter prefixes when tokenizing.
SYMBOL_TO_NUM = {
    "H": 1, "He": 2, "Li": 3, "Be": 4, "B": 5, "C": 6, "N": 7, "O": 8,
    "F": 9, "Ne": 10, "Na": 11, "Mg": 12, "Al": 13, "Si": 14, "P": 15,
    "S": 16, "Cl": 17, "Ar": 18, "K": 19, "Ca": 20, "Sc": 21, "Ti": 22,
    "V": 23, "Cr": 24, "Mn": 25, "Fe": 26, "Co": 27, "Ni": 28, "Cu": 29,
    "Zn": 30, "Ga": 31, "Ge": 32, "As": 33, "Se": 34, "Br": 35, "Kr": 36,
    "Rb": 37, "Sr": 38, "Y": 39, "Zr": 40, "Nb": 41, "Mo": 42, "Tc": 43,
    "Ru": 44, "Rh": 45, "Pd": 46, "Ag": 47, "Cd": 48, "In": 49, "Sn": 50,
    "Sb": 51, "Te": 52, "I": 53, "Xe": 54, "Cs": 55, "Ba": 56, "La": 57,
    "Ce": 58, "Pr": 59, "Nd": 60, "Pm": 61, "Sm": 62, "Eu": 63, "Gd": 64,
    "Tb": 65, "Dy": 66, "Ho": 67, "Er": 68, "Tm": 69, "Yb": 70, "Lu": 71,
    "Hf": 72, "Ta": 73, "W": 74, "Re": 75, "Os": 76, "Ir": 77, "Pt": 78,
    "Au": 79, "Hg": 80, "Tl": 81, "Pb": 82, "Bi": 83, "Po": 84, "At": 85,
    "Rn": 86, "Fr": 87, "Ra": 88, "Ac": 89, "Th": 90, "Pa": 91, "U": 92,
    "Np": 93, "Pu": 94,
}

NUM_TO_SYMBOL = {v: k for k, v in SYMBOL_TO_NUM.items()}

# Organic-subset atoms may appear outside brackets (OpenSMILES spec).
ORGANIC_SUBSET = {"B", "C", "N", "O", "P", "S", "F", "Cl", "Br", "I"}

# Lowercase aromatic symbols allowed outside brackets.
AROMATIC_ORGANIC = {"b", "c", "n", "o", "p", "s"}
# Aromatic symbols allowed inside brackets.
AROMATIC_BRACKET = {"b", "c", "n", "o", "p", "s", "se", "as", "te", "si"}

# Default valence lists for implicit-hydrogen computation (OpenSMILES):
# the implicit H count fills the smallest listed valence >= current bond sum.
DEFAULT_VALENCES = {
    5: (3,),          # B
    6: (4,),          # C
    7: (3, 5),        # N
    8: (2,),          # O
    9: (1,),          # F
    15: (3, 5),       # P
    16: (2, 4, 6),    # S
    17: (1,),         # Cl
    35: (1,),         # Br
    53: (1,),         # I
}

# Monoisotopic masses (most abundant isotope), used for the MolWt>700 filter
# mirroring `Descriptors.ExactMolWt` in `eagcn_pytorch/utils.py:898-915`.
MONOISOTOPIC_MASS = {
    1: 1.00782503207,
    5: 11.0093054,
    6: 12.0,
    7: 14.0030740048,
    8: 15.9949146196,
    9: 18.99840322,
    14: 27.9769265325,
    15: 30.97376163,
    16: 31.97207100,
    17: 34.96885268,
    35: 78.9183371,
    53: 126.904473,
    # coarse fallbacks for elements outside the whitelist — these molecules
    # get rejected with AtomError anyway, the mass only matters for the
    # MolWt>700 pre-filter which runs first.
    3: 7.016, 11: 22.9898, 12: 23.985, 13: 26.9815, 19: 38.9637,
    20: 39.9626, 26: 55.9349, 29: 62.9296, 30: 63.9291, 33: 74.9216,
    34: 79.9165, 47: 106.9051, 50: 119.9022, 78: 194.9648, 80: 201.9706,
}

# Average masses fallback for anything not listed above.
_GENERIC_MASS_PER_Z = 2.0


def monoisotopic_mass(atomic_num: int) -> float:
    m = MONOISOTOPIC_MASS.get(atomic_num)
    if m is None:
        m = _GENERIC_MASS_PER_Z * atomic_num
    return m


# Elements whose lone pairs participate in conjugation (used by the
# GetIsConjugated equivalent in perception.py).
LONE_PAIR_DONORS = {7, 8, 15, 16, 9, 17, 35, 53}
