"""Gasteiger-Marsili (PEOE) partial charges — self-contained replacement for
the charge models the reference pulls from oddt/rdkit (oddtconftool
.calccharges at utils/shape.py:159, espsim charge helpers at
utils/espsim/helpers.py:74-178).

Parameters from Gasteiger & Marsili, Tetrahedron 36 (1980): electronegativity
chi(q) = a + b q + c q^2 per (element, hybridization); iterative charge
transfer with 0.5^k damping."""
from __future__ import annotations

from typing import List

import numpy as np

from shapemol_tpu.chem.mol import Molecule, infer_hybridization

# (a, b, c) by (atomic number, hybridization key)
_PEOE = {
    (1, "S"): (7.17, 6.24, -0.56),
    (6, "SP3"): (7.98, 9.18, 1.88),
    (6, "SP2"): (8.79, 9.32, 1.51),
    (6, "SP"): (10.39, 9.45, 0.73),
    (7, "SP3"): (11.54, 10.82, 1.36),
    (7, "SP2"): (12.87, 11.15, 0.85),
    (7, "SP"): (15.68, 11.70, -0.27),
    (8, "SP3"): (14.18, 12.92, 1.39),
    (8, "SP2"): (17.07, 13.79, 0.47),
    (9, "SP3"): (14.66, 13.85, 2.31),
    (17, "SP3"): (11.00, 9.69, 1.35),
    (35, "SP3"): (10.08, 8.47, 1.16),
    (53, "SP3"): (9.90, 7.96, 0.96),
    (16, "SP3"): (10.14, 9.13, 1.38),
    (16, "SP2"): (10.88, 9.49, 1.33),
    (15, "SP3"): (8.90, 8.24, 0.96),
}


def _params(z: int, hyb: str):
    for key in ((z, hyb), (z, "SP3"), (z, "SP2"), (z, "SP")):
        if key in _PEOE:
            return _PEOE[key]
    return (7.98, 9.18, 1.88)           # carbon fallback


def gasteiger_charges(mol: Molecule, n_iter: int = 12) -> np.ndarray:
    """Iterative partial-charge equalization over the bond graph. Returns
    (N,) charges for heavy atoms (implicit hydrogens folded in via an H
    pseudo-neighbor per implicit H)."""
    if mol.hybridization is None:
        infer_hybridization(mol)
    from shapemol_tpu.eval.scoring import implicit_h_counts
    n = mol.num_atoms
    hs = implicit_h_counts(mol)

    # build extended atom list: heavy atoms + implicit H pseudo-atoms
    params = [_params(int(mol.atomic_nums[a]), mol.hybridization[a])
              for a in range(n)]
    h_par = _PEOE[(1, "S")]
    edges: List[tuple] = [(i, j) for (i, j, _o) in mol.bonds]
    ext_params = list(params)
    for a in range(n):
        for _ in range(int(hs[a])):
            edges.append((a, len(ext_params)))
            ext_params.append(h_par)

    m = len(ext_params)
    q = np.zeros(m)
    q[:n] = mol.charges.astype(np.float64)
    abc = np.asarray(ext_params)        # (m, 3)
    chi_plus = abc.sum(axis=1)          # chi of the cation, used as damping

    for it in range(n_iter):
        chi = abc[:, 0] + abc[:, 1] * q + abc[:, 2] * q * q
        damp = 0.5 ** (it + 1)
        dq = np.zeros(m)
        for (i, j) in edges:
            if chi[j] > chi[i]:
                t = (chi[j] - chi[i]) / chi_plus[i] * damp
                dq[i] += t
                dq[j] -= t
            else:
                t = (chi[i] - chi[j]) / chi_plus[j] * damp
                dq[i] -= t
                dq[j] += t
        q += dq
    # fold H charges back onto their heavy atom
    heavy_q = q[:n].copy()
    k = n
    for a in range(mol.num_atoms):
        for _ in range(int(hs[a])):
            heavy_q[a] += q[k]
            k += 1
    return heavy_q
