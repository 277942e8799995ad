"""Molecular perception: rings, aromaticity, implicit Hs, conjugation.

This module re-implements the subset of RDKit sanitization that EAGCN's
featurizer observes (`eagcn_pytorch/neural_fp.py:209-263`):

* ``bond.IsInRing`` / ``atom.IsInRing``  -> bridge analysis (a bond is in a
  ring iff it is not a bridge of the molecular graph)
* ``bond.GetIsAromatic`` / ``atom.GetIsAromatic`` -> lowercase SMILES flags
  plus Hueckel perception of Kekule-written rings (RDKit aromatizes Kekule
  inputs during sanitization, so ``C1=CC=CC=C1`` must look identical to
  ``c1ccccc1``)
* ``atom.GetTotalNumHs`` -> implicit hydrogen computation per OpenSMILES
  default valences
* ``bond.GetIsConjugated`` -> pi/lone-pair adjacency rule
* ``atom.GetHybridization`` -> simple SP/SP2/SP3 assignment
* the 28-label atom sub-typing of `neural_fp.py:395-524` (analysis only)

Chemistry corner cases RDKit resolves differently (exotic fused-ring
aromaticity, charged-ring systems) are documented in tests; they affect
neither row filtering parity on the shipped datasets nor model semantics.
"""

from __future__ import annotations

from collections import deque
from typing import List, Set, Tuple

from .mol import (
    AROMATIC,
    Bond,
    DOUBLE,
    HYB_OTHER,
    Mol,
    SINGLE,
    SP,
    SP2,
    SP3,
    TRIPLE,
)
from .periodic import DEFAULT_VALENCES, LONE_PAIR_DONORS

# Subtype labels, exactly the list at `neural_fp.py:162-163`.
SUBTYPE_LIST = [
    "os", "oh", "oa", "o", "un O", "c3", "c1", "ca", "c", "c2", "un C",
    "n1", "n3", "na", "n", "no", "nh", "un N", "s2", "-sh", "-ss", "un S",
    "f", "cl", "br", "i", "p", "unreconginized",
]
_SUBTYPE_INDEX = {name: i + 1 for i, name in enumerate(SUBTYPE_LIST)}  # 1-based


def perceive(mol: Mol) -> Mol:
    """Completes a freshly parsed Mol in place and returns it."""
    _compute_degrees(mol)
    _compute_implicit_h(mol)
    _perceive_rings(mol)
    _perceive_aromaticity(mol)
    _perceive_conjugation(mol)
    _perceive_hybridization(mol)
    _assign_subtypes(mol)
    return mol


# --------------------------------------------------------------------------
# degrees & implicit hydrogens
# --------------------------------------------------------------------------

def _compute_degrees(mol: Mol) -> None:
    for a in mol.atoms:
        a.degree = 0
    for b in mol.bonds:
        mol.atoms[b.a1].degree += 1
        mol.atoms[b.a2].degree += 1


def _bond_order_sum(mol: Mol, i: int) -> float:
    s = 0.0
    for b in mol.bonds:
        if b.a1 == i or b.a2 == i:
            s += b.order
    return s


def _compute_implicit_h(mol: Mol) -> None:
    """OpenSMILES implicit-H rule; runs BEFORE Kekule aromatization so the
    hydrogen counts match RDKit (which computes implicit valence on the
    Kekule structure)."""
    for a in mol.atoms:
        if a.explicit_h is not None:        # bracket atom: explicit count
            a.implicit_h = a.explicit_h
            continue
        valences = DEFAULT_VALENCES.get(a.atomic_num)
        if valences is None:
            a.implicit_h = 0
            continue
        if a.aromatic:
            # lowercase organic-subset atom: sigma-frame rule.  Aromatic C/B
            # carry one in-ring pi bond, so sigma slots = 3; aromatic
            # N/O/S/P lone-pair or pyridine-type atoms carry no implicit H
            # when written without brackets.
            if a.atomic_num in (5, 6):
                a.implicit_h = max(0, 3 - a.degree)
            else:
                a.implicit_h = 0
            continue
        bond_sum = int(round(_bond_order_sum(mol, a.idx)))
        for v in valences:
            if bond_sum <= v:
                a.implicit_h = v - bond_sum
                break
        else:
            a.implicit_h = 0                 # hypervalent: no implicit Hs


# --------------------------------------------------------------------------
# ring membership (bridge analysis)
# --------------------------------------------------------------------------

def _perceive_rings(mol: Mol) -> None:
    """atom/bond in_ring via Tarjan bridge finding: a bond lies on a cycle
    iff it is not a bridge; an atom lies on a cycle iff one of its bonds
    does."""
    n = mol.num_atoms
    adj = mol.adjacency()
    visited = [False] * n
    tin = [0] * n
    low = [0] * n
    timer = [0]
    is_bridge = [False] * mol.num_bonds

    for root in range(n):
        if visited[root]:
            continue
        # iterative DFS to avoid recursion limits on 1000-atom molecules
        stack: List[Tuple[int, int, int]] = [(root, -1, 0)]  # (node, parent_bond, child_ptr)
        while stack:
            v, pb, ptr = stack.pop()
            if ptr == 0:
                visited[v] = True
                timer[0] += 1
                tin[v] = low[v] = timer[0]
            if ptr < len(adj[v]):
                stack.append((v, pb, ptr + 1))
                to, b_idx = adj[v][ptr]
                if b_idx == pb:
                    continue
                if visited[to]:
                    low[v] = min(low[v], tin[to])
                else:
                    stack.append((to, b_idx, 0))
            else:
                if pb >= 0:
                    b = mol.bonds[pb]
                    parent = b.other(v)
                    low[parent] = min(low[parent], low[v])
                    if low[v] > tin[parent]:
                        is_bridge[pb] = True

    for b_idx, b in enumerate(mol.bonds):
        b.in_ring = not is_bridge[b_idx]
    for a in mol.atoms:
        a.in_ring = False
    for b in mol.bonds:
        if b.in_ring:
            mol.atoms[b.a1].in_ring = True
            mol.atoms[b.a2].in_ring = True


def _small_rings(mol: Mol, max_size: int = 7) -> List[List[int]]:
    """Relevant small rings: for EVERY ring bond, the shortest cycle through
    it (BFS with that edge removed), deduplicated by atom set.

    Chord-only fundamental cycles are NOT enough: in a fused 5-6 bicyclic
    written in Kekule form (indole, purine, benzofuran...) both chords'
    shortest cycles collapse onto the 5-ring and the 6-ring is never
    produced, so Hueckel aromatization missed the benzo ring (round-5
    audit finding).  Per-ring-bond shortest cycles cover every ring that
    any bond considers its smallest — the Hueckel candidate set RDKit's
    ring perception would give on these graphs."""
    n = mol.num_atoms
    adj = mol.adjacency()
    rings: List[List[int]] = []
    ring_keys: Set[frozenset] = set()
    for b_idx, b in enumerate(mol.bonds):
        if not b.in_ring:       # bridges (set by _perceive_rings) have no cycle
            continue
        # BFS shortest path b.a1 -> b.a2 avoiding bond b_idx
        prev = [-1] * n
        prev[b.a1] = b.a1
        dq = deque([b.a1])
        found = False
        while dq and not found:
            v = dq.popleft()
            for to, e_idx in adj[v]:
                if e_idx == b_idx or prev[to] != -1:
                    continue
                prev[to] = v
                if to == b.a2:
                    found = True
                    break
                dq.append(to)
        if not found:
            continue
        path = [b.a2]
        while path[-1] != b.a1:
            path.append(prev[path[-1]])
        if len(path) <= max_size:
            key = frozenset(path)
            if key not in ring_keys:
                ring_keys.add(key)
                rings.append(path)
    return rings


# --------------------------------------------------------------------------
# aromaticity (Hueckel on Kekule-written rings)
# --------------------------------------------------------------------------

def _perceive_aromaticity(mol: Mol) -> None:
    rings = _small_rings(mol, max_size=7)
    if not rings:
        return
    bond_of = {}
    for b_idx, b in enumerate(mol.bonds):
        bond_of[(b.a1, b.a2)] = b_idx
        bond_of[(b.a2, b.a1)] = b_idx

    changed = True
    rounds = 0
    while changed and rounds < 10:
        changed = False
        rounds += 1
        for ring in rings:
            ring_set = set(ring)
            ring_bonds = []
            ok = True
            for i, v in enumerate(ring):
                w = ring[(i + 1) % len(ring)]
                bi = bond_of.get((v, w))
                if bi is None:
                    ok = False
                    break
                ring_bonds.append(bi)
            if not ok:
                continue
            if all(mol.bonds[bi].aromatic for bi in ring_bonds):
                continue  # already aromatic
            electrons = 0
            capable = True
            for v in ring:
                e = _pi_electrons(mol, v, ring_set)
                if e is None:
                    capable = False
                    break
                electrons += e
            if capable and electrons % 4 == 2:
                for bi in ring_bonds:
                    b = mol.bonds[bi]
                    if not b.aromatic:
                        b.aromatic = True
                        b.order = AROMATIC
                        changed = True
                for v in ring:
                    if not mol.atoms[v].aromatic:
                        mol.atoms[v].aromatic = True
                        changed = True


def _pi_electrons(mol: Mol, v: int, ring_set: Set[int]):
    """Electron contribution of atom v to a candidate aromatic ring, or None
    if the atom cannot take part in an aromatic system."""
    a = mol.atoms[v]
    if a.atomic_num not in (5, 6, 7, 8, 15, 16):
        return None
    sigma = a.degree + a.total_h
    if sigma > 3:
        return None
    endo_pi = False
    exo_pi_ring_c = False
    exo_pi_hetero = False
    for b in mol.bonds:
        if b.a1 != v and b.a2 != v:
            continue
        if b.order == TRIPLE:
            return None
        if b.order == DOUBLE or b.aromatic:
            o = mol.atoms[b.other(v)]
            if b.other(v) in ring_set or (b.aromatic and o.aromatic):
                endo_pi = True
            elif o.atomic_num == 6 and o.in_ring:
                exo_pi_ring_c = True    # Kekule fused-ring double
            else:
                exo_pi_hetero = True    # e.g. exocyclic C=O
    if endo_pi or exo_pi_ring_c:
        return 1
    if exo_pi_hetero:
        return 0                         # pyridone-type carbon
    # no pi bond: lone-pair donors
    if a.atomic_num in (7, 15) and sigma == 3:
        return 2                         # pyrrole-type N/P
    if a.atomic_num in (8, 16) and sigma == 2:
        return 2                         # furan O / thiophene S
    if a.atomic_num == 6 and a.charge < 0 and sigma == 3:
        return 2                         # cyclopentadienyl anion
    if a.atomic_num == 6 and a.charge > 0 and sigma == 3:
        return 0                         # tropylium cation
    if a.atomic_num == 5 and sigma == 3:
        return 0                         # borole-type B
    return None


# --------------------------------------------------------------------------
# conjugation (GetIsConjugated equivalent)
# --------------------------------------------------------------------------

def _perceive_conjugation(mol: Mol) -> None:
    has_pi = [False] * mol.num_atoms
    for b in mol.bonds:
        if b.order in (DOUBLE, TRIPLE) or b.aromatic:
            has_pi[b.a1] = True
            has_pi[b.a2] = True

    def pi_excluding(v: int, bond: Bond) -> bool:
        for ob in mol.bonds:
            if ob is bond or (ob.a1 != v and ob.a2 != v):
                continue
            if ob.order in (DOUBLE, TRIPLE) or ob.aromatic:
                return True
        return False

    # pass 1: aromatic bonds and single bonds.  A single bond is conjugated
    # when BOTH ends carry pi or a lone pair and at least one end actually
    # has a pi bond (amide N-C(=O): yes; ether O-CH3: no).
    for b in mol.bonds:
        if b.aromatic:
            b.conjugated = True
            continue
        if b.order == SINGLE:
            a1, a2 = mol.atoms[b.a1], mol.atoms[b.a2]
            lp1 = a1.atomic_num in LONE_PAIR_DONORS
            lp2 = a2.atomic_num in LONE_PAIR_DONORS
            p1, p2 = pi_excluding(b.a1, b), pi_excluding(b.a2, b)
            b.conjugated = (p1 or lp1) and (p2 or lp2) and (p1 or p2)
    # pass 2: a multiple bond is conjugated iff it touches a conjugated
    # single/aromatic bond (butadiene/styrene: yes; lone C=C, acetone C=O,
    # cumulated allene doubles: no).
    for b in mol.bonds:
        if b.order not in (DOUBLE, TRIPLE):
            continue
        for ob in mol.bonds:
            if ob is b or not ob.conjugated:
                continue
            if len({ob.a1, ob.a2} & {b.a1, b.a2}) > 0:
                b.conjugated = True
                break


def _has_lp_neighbor(mol: Mol, v: int, bond: Bond) -> bool:
    for ob in mol.bonds:
        if ob is bond or (ob.a1 != v and ob.a2 != v):
            continue
        if mol.atoms[ob.other(v)].atomic_num in LONE_PAIR_DONORS:
            return True
    return False


# --------------------------------------------------------------------------
# hybridization + subtypes (analysis labels; `neural_fp.py:395-524`)
# --------------------------------------------------------------------------

def _perceive_hybridization(mol: Mol) -> None:
    n_double = [0] * mol.num_atoms
    n_triple = [0] * mol.num_atoms
    arom = [False] * mol.num_atoms
    for b in mol.bonds:
        if b.aromatic:
            arom[b.a1] = arom[b.a2] = True
        elif b.order == DOUBLE:
            n_double[b.a1] += 1
            n_double[b.a2] += 1
        elif b.order == TRIPLE:
            n_triple[b.a1] += 1
            n_triple[b.a2] += 1
    for a in mol.atoms:
        i = a.idx
        if a.atomic_num in (9, 17, 35, 53, 1):
            a.hybridization = SP3
        elif n_triple[i] > 0 or n_double[i] >= 2:
            a.hybridization = SP
        elif n_double[i] == 1 or arom[i] or a.aromatic:
            a.hybridization = SP2
        elif a.degree + a.total_h > 0:
            a.hybridization = SP3
        else:
            a.hybridization = HYB_OTHER


def _assign_subtypes(mol: Mol) -> None:
    """Mirrors `sub_type_setup` (`neural_fp.py:395-524`) including its
    behavioural quirks: phosphorus lands on 'unreconginized' there due to an
    operator-precedence bug; we assign 'p' correctly and note the
    divergence (analysis labels only, never model input)."""
    for a in mol.atoms:
        z, hyb, deg = a.atomic_num, a.hybridization, a.degree
        name = "unreconginized"
        if z == 8:
            if hyb == SP3:
                name = "os" if deg == 2 else ("oh" if deg == 1 else "un O")
            elif hyb == SP2:
                if a.aromatic:
                    name = "oa"
                elif deg == 1:
                    name = "o"
                elif deg == 2:
                    name = "oa"
                else:
                    name = "un O"
            else:
                name = "un O"
        elif z == 6:
            if hyb == SP3:
                name = "c3"
            elif hyb == SP:
                name = "c1"
            elif hyb == SP2:
                if a.aromatic:
                    name = "ca"
                elif a.total_h == 0 and deg == 3:
                    name = "c"
                elif a.total_h == 1 and deg == 2:
                    name = "c2"
                else:
                    name = "un C"
            else:
                name = "un C"
        elif z == 7:
            if hyb == SP:
                name = "n1"
            elif hyb == SP3:
                name = "n3"
            elif hyb == SP2:
                if a.aromatic:
                    name = "na"
                elif deg == 3:
                    valence = int(round(_bond_order_sum(mol, a.idx)))
                    if valence == 3:
                        name = "n"
                    elif valence == 4 and a.total_h == 2:
                        name = "no"
                    else:
                        name = "un N"
                elif deg == 1:
                    name = "n"
                elif deg == 2:
                    name = "nh"
                else:
                    name = "un N"
            else:
                name = "un N"
        elif z == 16:
            if hyb == SP2:
                name = "s2"
            elif hyb == SP3:
                if deg == 1 and a.total_h == 1:
                    name = "-sh"
                elif deg == 2:
                    name = "-ss"
                else:
                    name = "un S"
            else:
                name = "un S"
        elif z == 9:
            name = "f"
        elif z == 17:
            name = "cl"
        elif z == 35:
            name = "br"
        elif z == 53:
            name = "i"
        elif z == 15 and hyb == SP3:
            name = "p"
        a.subtype = _SUBTYPE_INDEX[name]
