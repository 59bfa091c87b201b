"""Electrostatic-potential and shape similarity (espsim equivalents).

Functional parity targets (vendored espsim in the reference):
  * GetEspSim — utils/espsim/electrostatics.py:79-140: Carbo similarity of
    Gaussian-smeared charge distributions, analytic integrals
  * GetShapeSim — electrostatics.py:64-77 (1 - shape Tanimoto distance);
    here computed with the analytic Gaussian-overlap tanimoto

Charges come from the self-contained Gasteiger implementation
(chem/charges.py) — the reference's 'gasteiger' charge model. The Carbo
integral uses Gaussian charge densities of fixed width, which preserves the
metric's semantics (value in [-1, 1], 1 = identical fields)."""
from __future__ import annotations

from typing import Optional

import numpy as np

from shapemol_tpu.chem.charges import gasteiger_charges
from shapemol_tpu.chem.mol import Molecule
from shapemol_tpu.eval.similarity import shape_tanimoto


def _gauss_cross(pos_a: np.ndarray, q_a: np.ndarray, pos_b: np.ndarray,
                 q_b: np.ndarray, alpha: float) -> float:
    """int rho_A(x) rho_B(x) dx for rho = sum_i q_i N exp(-alpha |x-r_i|^2),
    up to a constant common to all three integrals (cancels in Carbo)."""
    r2 = np.sum((pos_a[:, None] - pos_b[None]) ** 2, axis=-1)
    return float(np.sum(q_a[:, None] * q_b[None] * np.exp(-(alpha / 2) * r2)))


def esp_sim(mol_a: Molecule, mol_b: Molecule, alpha: float = 0.81,
            charges_a: Optional[np.ndarray] = None,
            charges_b: Optional[np.ndarray] = None) -> float:
    """Carbo similarity of the two (aligned) molecules' smeared charge
    fields: <A,B> / sqrt(<A,A><B,B>)."""
    qa = gasteiger_charges(mol_a) if charges_a is None else charges_a
    qb = gasteiger_charges(mol_b) if charges_b is None else charges_b
    aa = _gauss_cross(mol_a.pos, qa, mol_a.pos, qa, alpha)
    bb = _gauss_cross(mol_b.pos, qb, mol_b.pos, qb, alpha)
    ab = _gauss_cross(mol_a.pos, qa, mol_b.pos, qb, alpha)
    denom = np.sqrt(max(aa, 1e-12) * max(bb, 1e-12))
    return float(ab / denom)


def get_shape_sim(mol_a: Molecule, mol_b: Molecule) -> float:
    """Shape similarity = Gaussian-overlap shape Tanimoto of heavy-atom
    centers (GetShapeSim equivalent)."""
    return shape_tanimoto(mol_a.pos, mol_b.pos)
