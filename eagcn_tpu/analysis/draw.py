"""2D molecule drawing (parity with `eagcn_pytorch/plot_molecule.py`, which
uses RDKit's depiction).  RDKit-free: force-directed layout of the bond
graph + matplotlib rendering with element colors and bond-order styling."""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..chem import Mol, mol_from_smiles
from ..chem.periodic import NUM_TO_SYMBOL

_ELEMENT_COLORS = {
    6: "#303030", 7: "#2040d0", 8: "#d03030", 9: "#30a030", 15: "#d08020",
    16: "#b0a020", 17: "#20a040", 35: "#803030", 53: "#602080", 5: "#d070a0",
    1: "#909090",
}


def layout_2d(mol: Mol, seed: int = 0, iters: int = 300) -> np.ndarray:
    """Fruchterman-Reingold layout over the bond graph -> [n, 2] coords."""
    n = mol.num_atoms
    rng = np.random.default_rng(seed)
    pos = rng.normal(0, 1, (n, 2))
    if n == 1:
        return pos
    adj = np.zeros((n, n), bool)
    for b in mol.bonds:
        adj[b.a1, b.a2] = adj[b.a2, b.a1] = True
    k = 1.0 / np.sqrt(n)
    t = 0.15
    for it in range(iters):
        delta = pos[:, None, :] - pos[None, :, :]
        dist = np.linalg.norm(delta, axis=-1) + 1e-9
        rep = (k * k / dist**2)[:, :, None] * delta
        att = np.where(adj[:, :, None], (dist / k)[:, :, None] * -delta / dist[:, :, None], 0.0)
        disp = rep.sum(1) + att.sum(1)
        length = np.linalg.norm(disp, axis=-1, keepdims=True) + 1e-9
        pos = pos + disp / length * min(t, 0.3)
        t *= 0.985
    pos -= pos.mean(0)
    scale = np.abs(pos).max() + 1e-9
    return pos / scale


def draw_molecule(
    smiles_or_mol, out_path: str, title: Optional[str] = None, seed: int = 0,
) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mol = (smiles_or_mol if isinstance(smiles_or_mol, Mol)
           else mol_from_smiles(smiles_or_mol))
    pos = layout_2d(mol, seed)
    fig, ax = plt.subplots(figsize=(5, 5))
    for b in mol.bonds:
        p1, p2 = pos[b.a1], pos[b.a2]
        n_lines = 2 if b.order == 2.0 else (3 if b.order == 3.0 else 1)
        style = "--" if b.aromatic else "-"
        d = p2 - p1
        perp = np.array([-d[1], d[0]])
        perp = perp / (np.linalg.norm(perp) + 1e-9) * 0.02
        for li in range(n_lines):
            off = perp * (li - (n_lines - 1) / 2) * 2
            ax.plot([p1[0] + off[0], p2[0] + off[0]],
                    [p1[1] + off[1], p2[1] + off[1]],
                    style, color="#404040", lw=1.4, zorder=1)
    for a in mol.atoms:
        c = _ELEMENT_COLORS.get(a.atomic_num, "#707070")
        sym = NUM_TO_SYMBOL.get(a.atomic_num, "?")
        label = sym if a.atomic_num != 6 else ""
        ax.scatter(*pos[a.idx], s=180 if label else 40, c="white" if label
                   else c, edgecolors=c, linewidths=1.5, zorder=2)
        if label:
            ax.annotate(label, pos[a.idx], ha="center", va="center",
                        color=c, fontsize=10, zorder=3)
    ax.set_aspect("equal")
    ax.axis("off")
    if title:
        ax.set_title(title, fontsize=9)
    fig.tight_layout()
    fig.savefig(out_path, dpi=130)
    plt.close(fig)
    return out_path
