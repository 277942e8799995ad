"""A from-scratch SMILES parser.

The reference uses RDKit's `MolFromSmiles` (`eagcn_pytorch/EAGCN_dataset.py:6`,
`:68`).  RDKit is not available in this environment, so eagcn_tpu ships its
own OpenSMILES-subset parser covering everything that appears in the four
MoleculeNet CSVs (Tox21 / HIV / Lipophilicity / Freesolv):

* organic-subset atoms (``B C N O P S F Cl Br I``) and aromatic lowercase
  (``b c n o p s``)
* bracket atoms ``[isotope? symbol chirality? Hcount? charge? :class?]``
* bond symbols ``- = # : / \\ ~`` (stereo slashes are treated as single
  bonds; up/down stereo information is irrelevant to EAGCN's features)
* branches ``( )``, ring-bond closures ``1``-``9`` and ``%nn``, and dot-
  separated fragments

Parsing produces a raw `Mol`; `perception.perceive` then completes it (ring
flags, aromaticity, implicit Hs, conjugation, hybridization) the way RDKit's
sanitization does.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from .mol import Atom, Bond, Mol, ParseError, SINGLE, DOUBLE, TRIPLE, AROMATIC
from .periodic import (
    AROMATIC_BRACKET,
    AROMATIC_ORGANIC,
    ORGANIC_SUBSET,
    SYMBOL_TO_NUM,
)

_BOND_CHARS = {
    "-": SINGLE,
    "=": DOUBLE,
    "#": TRIPLE,
    ":": AROMATIC,
    "/": SINGLE,
    "\\": SINGLE,
    "~": SINGLE,  # "any" bond; extremely rare, treat as single
}


def parse_smiles(text: str) -> Mol:
    """Parses a SMILES string into a raw (pre-perception) Mol.

    Raises ParseError on malformed input (the analogue of RDKit returning
    None and the reference dying with AttributeError at
    `EAGCN_dataset.py:109-110`)."""
    if text is None:
        raise ParseError("empty SMILES")
    s = text.strip()
    if not s:
        raise ParseError("empty SMILES")

    mol = Mol(smiles=text)
    prev_atom: Optional[int] = None            # index of previous atom in chain
    pending_bond: Optional[float] = None       # bond symbol seen since last atom
    branch_stack: List[Tuple[Optional[int], Optional[float]]] = []
    # ring-closure table: number -> (atom_idx, bond_order_or_None)
    ring: Dict[int, Tuple[int, Optional[float]]] = {}

    i, n = 0, len(s)
    while i < n:
        c = s[i]

        if c in _BOND_CHARS:
            if pending_bond is not None:
                raise ParseError(f"two bond symbols in a row at {i}: {s}")
            pending_bond = _BOND_CHARS[c]
            i += 1
            continue

        if c == ".":
            if pending_bond is not None:
                raise ParseError(f"bond before dot at {i}: {s}")
            prev_atom = None
            i += 1
            continue

        if c == "(":
            if prev_atom is None:
                raise ParseError(f"branch with no preceding atom at {i}: {s}")
            branch_stack.append((prev_atom, pending_bond))
            pending_bond = None
            i += 1
            continue

        if c == ")":
            if not branch_stack:
                raise ParseError(f"unmatched ')' at {i}: {s}")
            prev_atom, _saved = branch_stack.pop()
            pending_bond = None
            i += 1
            continue

        if c.isdigit() or c == "%":
            if prev_atom is None:
                raise ParseError(f"ring closure with no atom at {i}: {s}")
            if c == "%":
                if i + 2 >= n or not (s[i + 1].isdigit() and s[i + 2].isdigit()):
                    raise ParseError(f"bad %nn ring closure at {i}: {s}")
                num = int(s[i + 1 : i + 3])
                i += 3
            else:
                num = int(c)
                i += 1
            if num in ring:
                open_atom, open_order = ring.pop(num)
                order = _resolve_ring_order(
                    open_order, pending_bond, mol, open_atom, prev_atom, s
                )
                if open_atom == prev_atom:
                    raise ParseError(f"self ring bond at {i}: {s}")
                _add_bond(mol, open_atom, prev_atom, order)
            else:
                ring[num] = (prev_atom, pending_bond)
            pending_bond = None
            continue

        if c == "[":
            j = s.find("]", i)
            if j < 0:
                raise ParseError(f"unclosed bracket at {i}: {s}")
            atom = _parse_bracket_atom(s[i + 1 : j], s)
            i = j + 1
        elif c.isalpha() or c == "*":
            atom, i = _parse_organic_atom(s, i)
        else:
            raise ParseError(f"unexpected character {c!r} at {i}: {s}")

        atom.idx = len(mol.atoms)
        mol.atoms.append(atom)
        if prev_atom is not None:
            order = pending_bond
            if order is None:
                a_prev = mol.atoms[prev_atom]
                order = AROMATIC if (a_prev.aromatic and atom.aromatic) else SINGLE
            _add_bond(mol, prev_atom, atom.idx, order)
        pending_bond = None
        prev_atom = atom.idx

    if branch_stack:
        raise ParseError(f"unclosed branch: {s}")
    if ring:
        raise ParseError(f"unclosed ring bond(s) {sorted(ring)}: {s}")
    if pending_bond is not None:
        raise ParseError(f"dangling bond symbol: {s}")
    if not mol.atoms:
        raise ParseError(f"no atoms parsed: {s}")
    return mol


def _add_bond(mol: Mol, a1: int, a2: int, order: float) -> None:
    for b in mol.bonds:
        if {b.a1, b.a2} == {a1, a2}:
            raise ParseError(f"duplicate bond {a1}-{a2}: {mol.smiles}")
    mol.bonds.append(Bond(a1=a1, a2=a2, order=order, aromatic=(order == AROMATIC)))


def _resolve_ring_order(
    open_order: Optional[float],
    close_order: Optional[float],
    mol: Mol,
    a1: int,
    a2: int,
    s: str,
) -> float:
    if open_order is not None and close_order is not None and open_order != close_order:
        raise ParseError(f"conflicting ring bond orders: {s}")
    order = open_order if open_order is not None else close_order
    if order is None:
        order = (
            AROMATIC
            if (mol.atoms[a1].aromatic and mol.atoms[a2].aromatic)
            else SINGLE
        )
    return order


def _parse_organic_atom(s: str, i: int) -> Tuple[Atom, int]:
    # two-letter symbols first (Cl, Br)
    if s[i : i + 2] in ("Cl", "Br"):
        sym = s[i : i + 2]
        return Atom(atomic_num=SYMBOL_TO_NUM[sym]), i + 2
    c = s[i]
    if c == "*":
        raise ParseError(f"wildcard atom '*' unsupported: {s}")
    if c in ORGANIC_SUBSET:
        return Atom(atomic_num=SYMBOL_TO_NUM[c]), i + 1
    if c in AROMATIC_ORGANIC:
        return Atom(atomic_num=SYMBOL_TO_NUM[c.upper()], aromatic=True), i + 1
    raise ParseError(f"unknown organic-subset symbol {c!r} at {i}: {s}")


def _parse_bracket_atom(body: str, full: str) -> Atom:
    """Parses the inside of a bracket atom: isotope? symbol chiral? H? charge? class?"""
    if not body:
        raise ParseError(f"empty bracket atom: {full}")
    k = 0
    # isotope
    isotope = 0
    while k < len(body) and body[k].isdigit():
        isotope = isotope * 10 + int(body[k])
        k += 1
    # element symbol (possibly aromatic lowercase, possibly two letters)
    sym = None
    aromatic = False
    for cand_len in (2, 1):
        cand = body[k : k + cand_len]
        if not cand or len(cand) < cand_len:
            continue
        if cand in SYMBOL_TO_NUM:
            sym = cand
            break
        if cand.lower() in AROMATIC_BRACKET and cand.islower():
            cap = cand.capitalize() if cand_len == 2 else cand.upper()
            if cap in SYMBOL_TO_NUM:
                sym = cap
                aromatic = True
                break
    if sym is None:
        raise ParseError(f"unknown element in bracket {body!r}: {full}")
    k += len(sym) if not aromatic else len(sym)
    atom = Atom(atomic_num=SYMBOL_TO_NUM[sym], aromatic=aromatic, isotope=isotope)
    # chirality
    if k < len(body) and body[k] == "@":
        k += 1
        if k < len(body) and body[k] == "@":
            k += 1
        # named chirality classes like @TH1 — skip letters+digits
        while k < len(body) and (body[k].isupper() and body[k] in "TSAOBH"):
            j = k
            while j < len(body) and (body[j].isalnum()):
                j += 1
            # only treat as chirality tag if it looks like TH1/AL2/SP3/TB#/OH#
            tag = body[k:j]
            if tag[:2] in ("TH", "AL", "SP", "TB", "OH") and tag[2:].isdigit():
                k = j
            break
    # explicit H count
    explicit_h = 0
    if k < len(body) and body[k] == "H":
        k += 1
        h = 0
        while k < len(body) and body[k].isdigit():
            h = h * 10 + int(body[k])
            k += 1
        explicit_h = h if h > 0 else 1
    atom.explicit_h = explicit_h
    # charge
    charge = 0
    while k < len(body) and body[k] in "+-":
        sign = 1 if body[k] == "+" else -1
        k += 1
        mag = 0
        while k < len(body) and body[k].isdigit():
            mag = mag * 10 + int(body[k])
            k += 1
        if mag == 0:
            mag = 1
            # allow ++ / -- runs
            while k < len(body) and body[k] == ("+" if sign > 0 else "-"):
                mag += 1
                k += 1
        charge += sign * mag
    atom.charge = charge
    # atom class
    if k < len(body) and body[k] == ":":
        k += 1
        if k == len(body) or not body[k].isdigit():
            raise ParseError(f"bad atom class in {body!r}: {full}")
        while k < len(body) and body[k].isdigit():
            k += 1
    if k != len(body):
        raise ParseError(f"trailing junk {body[k:]!r} in bracket atom: {full}")
    return atom
