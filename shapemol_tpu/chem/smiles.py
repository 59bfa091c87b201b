"""Canonical SMILES generation from the framework's Molecule graph —
self-contained replacement for the RDKit MolToSmiles calls the reference's
eval stack depends on (scripts/evaluate_diffusion_sim.py:159-166 uses SMILES
for completeness '.'-checks and uniqueness sets).

Canonicalization: iterative neighborhood refinement (Morgan/Weisfeiler-
Lehman) over atom invariants (element, degree, charge, aromaticity, ring
membership), ties broken deterministically; then a canonical DFS emits
atoms, bond symbols and ring-closure digits. Disconnected components are
joined with '.'. This yields a *canonical form within this framework* —
identical graphs map to identical strings, which is exactly what the
uniqueness/completeness metrics require (it is not guaranteed to equal
RDKit's canonical string)."""
from __future__ import annotations

from typing import Dict, List, Set, Tuple

import numpy as np

from shapemol_tpu.chem.mol import Molecule, AROMATIC

_ORGANIC_SUBSET = {"B", "C", "N", "O", "P", "S", "F", "Cl", "Br", "I"}
_BOND_SYMBOL = {1: "", 2: "=", 3: "#", AROMATIC: ""}


def _canonical_ranks(mol: Molecule) -> List[int]:
    n = mol.num_atoms
    adj = mol.neighbors()
    arom = mol.aromatic if mol.aromatic is not None else np.zeros(n, bool)
    in_ring = np.zeros(n, bool)
    from shapemol_tpu.chem.mol import ring_basis
    for r in ring_basis(mol):
        for a in r:
            in_ring[a] = True
    bond_orders = mol.bond_dict()

    inv = [(int(mol.atomic_nums[a]), len(adj[a]), int(mol.charges[a]),
            bool(arom[a]), bool(in_ring[a])) for a in range(n)]
    ranks = _rank(inv)
    for _ in range(n):
        new_inv = []
        for a in range(n):
            nbr_sig = sorted(
                (ranks[b], bond_orders[(min(a, b), max(a, b))])
                for b in adj[a])
            new_inv.append((ranks[a], tuple(nbr_sig)))
        new_ranks = _rank(new_inv)
        if new_ranks == ranks:
            break
        ranks = new_ranks
    # final deterministic tie-break: repeatedly promote the lowest-index
    # member of the smallest tied class (standard canonical-rank trick)
    while len(set(ranks)) < n:
        counts: Dict[int, List[int]] = {}
        for a, r in enumerate(ranks):
            counts.setdefault(r, []).append(a)
        tied = min((r for r, atoms in counts.items() if len(atoms) > 1))
        chosen = min(counts[tied])
        inv2 = [(ranks[a], 0 if a == chosen else 1) for a in range(n)]
        ranks = _rank(inv2)
        for _ in range(n):
            new_inv = []
            for a in range(n):
                nbr_sig = sorted(
                    (ranks[b], bond_orders[(min(a, b), max(a, b))])
                    for b in adj[a])
                new_inv.append((ranks[a], tuple(nbr_sig)))
            new_ranks = _rank(new_inv)
            if new_ranks == ranks:
                break
            ranks = new_ranks
    return ranks


def _rank(invariants: List) -> List[int]:
    order = sorted(set(invariants))
    lookup = {v: i for i, v in enumerate(order)}
    return [lookup[v] for v in invariants]


def _atom_token(mol: Molecule, a: int, arom: np.ndarray) -> str:
    sym = mol.symbols[a]
    chg = int(mol.charges[a])
    aromatic = bool(arom[a]) and sym in ("B", "C", "N", "O", "P", "S")
    body = sym.lower() if aromatic else sym
    if sym in _ORGANIC_SUBSET and chg == 0:
        return body
    chg_s = ""
    if chg > 0:
        chg_s = "+" if chg == 1 else f"+{chg}"
    elif chg < 0:
        chg_s = "-" if chg == -1 else f"{chg}"
    return f"[{body}{chg_s}]"


def to_smiles(mol: Molecule) -> str:
    """Canonical SMILES of the (possibly disconnected) molecular graph."""
    n = mol.num_atoms
    if n == 0:
        return ""
    ranks = _canonical_ranks(mol)
    adj = mol.neighbors()
    bond_orders = mol.bond_dict()
    arom = mol.aromatic if mol.aromatic is not None else np.zeros(n, bool)

    visited: Set[int] = set()
    closure_digit = [0]

    def component_smiles(root: int) -> str:
        """Two passes: pass 1 classifies ring back-edges in canonical DFS
        order so closure digits can be attached to BOTH endpoints; pass 2
        emits the token stream over the spanning tree."""
        ring_bonds_at: Dict[int, List[Tuple[int, int]]] = {}
        seen1: Set[int] = set()
        ring_edges: List[Tuple[int, int]] = []

        def walk(a: int, parent: int):
            seen1.add(a)
            for b in sorted(adj[a], key=lambda t: ranks[t]):
                if b == parent:
                    continue
                key = (min(a, b), max(a, b))
                if b in seen1:
                    if key not in ring_edges:
                        ring_edges.append(key)
                else:
                    walk(b, a)

        walk(root, -1)
        for k, key in enumerate(ring_edges):
            digit = k + 1 + closure_digit[0]
            order = bond_orders[key]
            ring_bonds_at.setdefault(key[0], []).append((digit, order))
            ring_bonds_at.setdefault(key[1], []).append((digit, order))
        closure_digit[0] += len(ring_edges)
        ring_edge_set = set(ring_edges)

        def dfs(a: int, parent: int) -> List[str]:
            visited.add(a)
            out = [_atom_token(mol, a, arom)]
            for (digit, order) in sorted(ring_bonds_at.get(a, [])):
                out.append((_BOND_SYMBOL[order] if order in (2, 3) else "")
                           + _digit_str(digit))
            nbrs = [b for b in sorted(adj[a], key=lambda t: ranks[t])
                    if b != parent
                    and (min(a, b), max(a, b)) not in ring_edge_set
                    and b not in visited]
            for idx, b in enumerate(nbrs):
                order = bond_orders[(min(a, b), max(a, b))]
                sub = dfs(b, a)
                frag = [_BOND_SYMBOL[order]] + sub
                if idx < len(nbrs) - 1:
                    out.append("(")
                    out.extend(frag)
                    out.append(")")
                else:
                    out.extend(frag)
            return out

        return "".join(dfs(root, -1))

    parts = []
    comps = mol.connected_components()
    for comp in comps:
        root = min(comp, key=lambda a: (ranks[a], a))
        parts.append(component_smiles(root))
    parts.sort()
    return ".".join(parts)


def _digit_str(d: int) -> str:
    return str(d) if d < 10 else f"%{d}"


def is_complete(smiles: str) -> bool:
    """Single connected component (reference completeness check:
    '.' not in smiles — evaluate_diffusion_sim.py:162)."""
    return bool(smiles) and "." not in smiles
