"""Lightweight molecular-graph container + graph algorithms (no RDKit
dependency). This is the framework's host-side molecule type; adapters to
RDKit exist in chem/rdkit_compat.py when RDKit is installed.

Covers the graph functionality the reference obtains from RDKit/OpenBabel:
neighbors, rings (SSSR-ish cycle basis), aromaticity perception (Hückel-lite
on planar rings of sp2 atoms), valence accounting.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, FrozenSet, List, Optional, Set, Tuple

import numpy as np

from shapemol_tpu.chem import periodic as pt

# bond orders: 1, 2, 3, 4 == aromatic (matches the reference BOND_TYPES
# ordering utils/data.py:12-18 where aromatic is its own category)
AROMATIC = 4
_BOND_ORDER_VALENCE = {1: 1.0, 2: 2.0, 3: 3.0, AROMATIC: 1.5}


@dataclasses.dataclass
class Molecule:
    atomic_nums: np.ndarray                  # (N,) int
    pos: np.ndarray                          # (N, 3) float
    bonds: List[Tuple[int, int, int]]        # (i, j, order), i < j
    charges: Optional[np.ndarray] = None     # (N,) int formal charges
    aromatic: Optional[np.ndarray] = None    # (N,) bool per-atom flag
    hybridization: Optional[List[str]] = None

    def __post_init__(self):
        self.atomic_nums = np.asarray(self.atomic_nums, dtype=np.int32)
        self.pos = np.asarray(self.pos, dtype=np.float64)
        if self.charges is None:
            self.charges = np.zeros(len(self.atomic_nums), dtype=np.int32)

    @property
    def num_atoms(self) -> int:
        return len(self.atomic_nums)

    @property
    def symbols(self) -> List[str]:
        return [pt.SYMBOLS.get(int(z), "C") for z in self.atomic_nums]

    def neighbors(self) -> List[List[int]]:
        adj: List[List[int]] = [[] for _ in range(self.num_atoms)]
        for i, j, _ in self.bonds:
            adj[i].append(j)
            adj[j].append(i)
        return adj

    def bond_dict(self) -> Dict[Tuple[int, int], int]:
        return {(min(i, j), max(i, j)): o for i, j, o in self.bonds}

    def explicit_valences(self) -> np.ndarray:
        """Sum of bond orders per atom (aromatic counts 1.5)."""
        val = np.zeros(self.num_atoms)
        for i, j, o in self.bonds:
            v = _BOND_ORDER_VALENCE[o]
            val[i] += v
            val[j] += v
        return val

    def heavy_indices(self) -> np.ndarray:
        return np.where(self.atomic_nums != 1)[0]

    def without_hydrogens(self) -> "Molecule":
        keep = self.atomic_nums != 1
        remap = -np.ones(self.num_atoms, dtype=np.int64)
        remap[keep] = np.arange(keep.sum())
        bonds = [(int(remap[i]), int(remap[j]), o) for i, j, o in self.bonds
                 if keep[i] and keep[j]]
        return Molecule(self.atomic_nums[keep], self.pos[keep], bonds,
                        charges=self.charges[keep],
                        aromatic=None if self.aromatic is None
                        else self.aromatic[keep])

    def connected_components(self) -> List[Set[int]]:
        adj = self.neighbors()
        seen: Set[int] = set()
        comps = []
        for s in range(self.num_atoms):
            if s in seen:
                continue
            comp = {s}
            stack = [s]
            while stack:
                u = stack.pop()
                for w in adj[u]:
                    if w not in comp:
                        comp.add(w)
                        stack.append(w)
            seen |= comp
            comps.append(comp)
        return comps

    def is_connected(self) -> bool:
        return len(self.connected_components()) <= 1


def ring_basis(mol: Molecule, max_size: int = 12) -> List[List[int]]:
    """Smallest-set-of-smallest-rings approximation via per-bond BFS: for
    every bond (u, v) on a cycle, the smallest ring through it is
    shortest_path(u, v, without edge uv) + the edge. Deduplicated by atom
    set. Sufficient for ring-size statistics and aromaticity perception on
    drug-like molecules."""
    adj = mol.neighbors()
    rings: List[List[int]] = []
    seen: Set[FrozenSet[int]] = set()
    for (u, v, _o) in mol.bonds:
        # BFS from u to v avoiding the direct edge
        prev = {u: -1}
        queue = [u]
        found = False
        while queue and not found:
            nxt = []
            for a in queue:
                for b in adj[a]:
                    if a == u and b == v:
                        continue
                    if b not in prev:
                        prev[b] = a
                        if b == v:
                            found = True
                            break
                        nxt.append(b)
                if found:
                    break
            queue = nxt
        if not found:
            continue
        path = [v]
        while path[-1] != u:
            path.append(prev[path[-1]])
        if len(path) > max_size:
            continue
        key = frozenset(path)
        if key not in seen:
            seen.add(key)
            rings.append(path)
    return rings


def ring_sizes(mol: Molecule) -> List[int]:
    return sorted(len(r) for r in ring_basis(mol))


# valence-electron counts for Hückel counting
_PI_CONTRIB = {
    # (symbol) -> function(valence_in_ring_context) handled in perceive
}


def perceive_aromaticity(mol: Molecule) -> np.ndarray:
    """Mark atoms aromatic when they sit on a planar-ish ring of size 5-6
    whose pi-electron count satisfies 4n+2 (simplified Hückel, covering the
    benzene/pyridine/pyrrole/furan/thiophene families that dominate MOSES2).
    Uses bond orders: alternating single/double rings or already-AROMATIC
    bonds qualify; heteroatoms contribute lone pairs by the standard rules.
    Returns a bool (N,) array and upgrades qualifying ring bonds to AROMATIC
    in-place."""
    rings = ring_basis(mol, max_size=7)
    bond_orders = mol.bond_dict()
    arom = np.zeros(mol.num_atoms, dtype=bool)
    syms = mol.symbols
    val = mol.explicit_valences()

    for ring in rings:
        n = len(ring)
        if n not in (5, 6):
            continue
        ring_set = set(ring)
        # order ring atoms along the cycle
        adj = mol.neighbors()
        ordered = [ring[0]]
        while len(ordered) < n:
            last = ordered[-1]
            nxt = [a for a in adj[last]
                   if a in ring_set and a not in ordered]
            if not nxt:
                break
            ordered.append(nxt[0])
        if len(ordered) < n:
            continue
        ring_bonds = []
        ok = True
        for idx in range(n):
            a, b = ordered[idx], ordered[(idx + 1) % n]
            o = bond_orders.get((min(a, b), max(a, b)))
            if o is None:
                ok = False
                break
            ring_bonds.append((a, b, o))
        if not ok:
            continue

        pi = 0
        valid = True
        for idx, a in enumerate(ordered):
            s = syms[a]
            o_prev = ring_bonds[idx - 1][2]
            o_next = ring_bonds[idx][2]
            in_ring_double = (o_prev in (2, AROMATIC)
                              or o_next in (2, AROMATIC))
            # exocyclic double bond (e.g. quinone C=O) -> contributes 0
            exo_double = any(
                o == 2 for (i, j, o) in mol.bonds
                if (i == a and j not in ring_set)
                or (j == a and i not in ring_set))
            if s == "C":
                if in_ring_double:
                    pi += 1
                elif exo_double:
                    pi += 0
                else:
                    valid = False
                    break
            elif s in ("N", "P"):
                if in_ring_double:
                    pi += 1
                else:
                    pi += 2      # pyrrole-type lone pair
            elif s in ("O", "S"):
                if in_ring_double:
                    valid = False  # O/S with in-ring double: not aromatic
                    break
                pi += 2          # furan/thiophene lone pair
            else:
                valid = False
                break
        if valid and pi % 4 == 2:
            for a in ordered:
                arom[a] = True
            # upgrade bond orders
            new_bonds = []
            ring_pairs = {(min(a, b), max(a, b)) for a, b, _ in ring_bonds}
            for (i, j, o) in mol.bonds:
                if (min(i, j), max(i, j)) in ring_pairs:
                    new_bonds.append((i, j, AROMATIC))
                else:
                    new_bonds.append((i, j, o))
            mol.bonds = new_bonds
            bond_orders = mol.bond_dict()
    mol.aromatic = arom
    return arom


def infer_hybridization(mol: Molecule) -> List[str]:
    """SP/SP2/SP3 from bond orders (reference stores RDKit hybridization;
    this reproduces it for the organic subset)."""
    hyb = []
    orders = [[] for _ in range(mol.num_atoms)]
    for i, j, o in mol.bonds:
        orders[i].append(o)
        orders[j].append(o)
    for a in range(mol.num_atoms):
        os_ = orders[a]
        if 3 in os_ or os_.count(2) >= 2:
            hyb.append("SP")
        elif 2 in os_ or AROMATIC in os_:
            hyb.append("SP2")
        else:
            hyb.append("SP3")
    mol.hybridization = hyb
    return hyb


def kekulize(mol: Molecule) -> Optional[Dict[Tuple[int, int], int]]:
    """Assign alternating single/double orders to the aromatic bonds.

    Returns {(i, j): 1|2} for every aromatic bond, or None if no valid
    kekulé structure exists. Constraints per aromatic atom:
      * carbon: exactly ONE double bond among its aromatic bonds, unless it
        already carries an exocyclic double/triple bond (then zero);
      * nitrogen: one double bond, or zero when it is a lone-pair donor
        (three connections total, an exocyclic substituent, or a positive
        ring N-H situation) — the search tries both;
      * O/S (furan/thiophene): zero double bonds (pure lone-pair donors).

    Small backtracking search — aromatic systems in drug-like molecules
    have at most a few dozen bonds. This is what RDKit/OpenBabel do for the
    reference at sanitization time; needed so valence checks see kekulé
    orders instead of 1.5-per-aromatic-bond sums
    (e.g. N-methylpyrrole N: 1.5+1.5+1 = 4 "valence" but kekulized 1+1+1=3).
    """
    arom_bonds = [(i, j) for i, j, o in mol.bonds if o == AROMATIC]
    if not arom_bonds:
        return {}
    other_valence = np.zeros(mol.num_atoms)
    arom_deg = np.zeros(mol.num_atoms, dtype=int)
    for i, j, o in mol.bonds:
        if o == AROMATIC:
            arom_deg[i] += 1
            arom_deg[j] += 1
        else:
            other_valence[i] += _BOND_ORDER_VALENCE[o]
            other_valence[j] += _BOND_ORDER_VALENCE[o]
    degree = np.zeros(mol.num_atoms, dtype=int)
    for i, j, _ in mol.bonds:
        degree[i] += 1
        degree[j] += 1

    atoms = sorted({a for b in arom_bonds for a in b})

    def build_need(relax_carbon: bool) -> Dict[int, Tuple[int, int]]:
        # how many double bonds each aromatic atom may take: (min, max)
        need: Dict[int, Tuple[int, int]] = {}
        for a in atoms:
            z = int(mol.atomic_nums[a])
            if z == 6:
                # carbon with an exocyclic multiple bond (quinoid) -> 0
                if other_valence[a] >= 2:
                    lo = hi = 0
                else:
                    lo, hi = (0, 1) if relax_carbon else (1, 1)
            elif z == 7:
                hi = 1 if other_valence[a] <= 1 and degree[a] <= 2 else 0
                lo = 0
            elif z in (8, 16, 34):
                lo = hi = 0
            else:
                lo, hi = 0, 1
            need[a] = (lo, hi)
        return need

    need = build_need(relax_carbon=False)

    nb: Dict[int, List[int]] = {a: [] for a in atoms}
    for k, (i, j) in enumerate(arom_bonds):
        nb[i].append(k)
        nb[j].append(k)

    assign = [0] * len(arom_bonds)           # 0 unset, 1 single, 2 double
    dbl = {a: 0 for a in atoms}
    unset = {a: len(nb[a]) for a in atoms}

    def ok(a):
        lo, hi = need[a]
        return dbl[a] <= hi and dbl[a] + unset[a] >= lo

    def rec(k):
        if k == len(arom_bonds):
            return all(need[a][0] <= dbl[a] <= need[a][1] for a in atoms)
        i, j = arom_bonds[k]
        for val in (2, 1):
            assign[k] = val
            d = 1 if val == 2 else 0
            dbl[i] += d
            dbl[j] += d
            unset[i] -= 1
            unset[j] -= 1
            if ok(i) and ok(j) and rec(k + 1):
                return True
            dbl[i] -= d
            dbl[j] -= d
            unset[i] += 1
            unset[j] += 1
            assign[k] = 0
        return False

    if not rec(0):
        # relaxed retry: allow aromatic carbons WITHOUT a ring double
        # (mis-perceived quinoid/exocyclic cases). Used only for valence
        # ACCOUNTING — relaxation can underestimate, never overestimate,
        # so true sigma-bond hypervalency is still caught.
        need = build_need(relax_carbon=True)
        assign[:] = [0] * len(arom_bonds)
        for a in atoms:
            dbl[a] = 0
            unset[a] = len(nb[a])
        if not rec(0):
            return None
    return {(min(i, j), max(i, j)): assign[k]
            for k, (i, j) in enumerate(arom_bonds)}


def kekulized_valences(mol: Molecule) -> np.ndarray:
    """Per-atom valence with aromatic systems kekulized (falls back to the
    1.5-per-aromatic-bond sum when no kekulé structure exists)."""
    kek = kekulize(mol)
    if kek is None:
        return mol.explicit_valences()
    val = np.zeros(mol.num_atoms)
    for i, j, o in mol.bonds:
        v = (kek[(min(i, j), max(i, j))] if o == AROMATIC
             else _BOND_ORDER_VALENCE[o])
        val[i] += v
        val[j] += v
    return val
