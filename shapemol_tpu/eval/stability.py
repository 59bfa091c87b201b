"""Molecule/atom stability metrics from raw (positions, atom types).

Functional parity target: check_stability / analyze_stability_for_molecules
(utils/evaluation/analyze.py:264-394): infer bond orders for every atom pair
from the empirical length tables, sum per-atom bond orders, and call an atom
stable when 0 < total <= allowed valence. Vectorized over the pair matrix
instead of the reference's O(N^2) Python loop."""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from shapemol_tpu.chem import periodic as pt


def _pair_bond_orders(positions: np.ndarray, symbols: List[str]) -> np.ndarray:
    n = len(symbols)
    nr_bonds = np.zeros(n, dtype=np.int64)
    d = np.linalg.norm(positions[:, None] - positions[None, :], axis=-1)
    for i in range(n):
        for j in range(i + 1, n):
            order = pt.get_bond_order(symbols[i], symbols[j], d[i, j])
            nr_bonds[i] += order
            nr_bonds[j] += order
    return nr_bonds


def check_stability(positions: np.ndarray, atomic_nums: Sequence[int],
                    include_hs: bool = False
                    ) -> Tuple[bool, int, int]:
    """Returns (molecule_stable, n_stable_atoms, n_atoms)."""
    positions = np.asarray(positions, dtype=np.float64)
    assert positions.ndim == 2 and positions.shape[1] == 3
    symbols = [pt.SYMBOLS.get(int(z), "C") for z in atomic_nums]
    nr_bonds = _pair_bond_orders(positions, symbols)

    n_stable = 0
    for sym, nb in zip(symbols, nr_bonds):
        allowed = pt.allowed_valence(sym)
        if isinstance(allowed, list):
            ok = (nb in allowed) if include_hs else any(
                a >= nb > 0 for a in allowed)
        else:
            ok = (allowed == nb) if include_hs else (allowed >= nb > 0)
        n_stable += int(ok)
    return n_stable == len(symbols), n_stable, len(symbols)


def analyze_stability_for_molecules(mol_list: Sequence[Tuple[np.ndarray,
                                                             Sequence[int]]]
                                    ) -> Dict[str, float]:
    """Aggregate stability over a list of (positions, atomic_nums)."""
    n_mol_stable = n_atm_stable = n_mol = n_atm = 0
    for positions, atomic_nums in mol_list:
        mol_ok, n_stable, n = check_stability(positions, atomic_nums)
        n_mol_stable += int(mol_ok)
        n_atm_stable += n_stable
        n_mol += 1
        n_atm += n
    return {
        "mol_stable": n_mol_stable / max(n_mol, 1),
        "atm_stable": n_atm_stable / max(n_atm, 1),
    }
