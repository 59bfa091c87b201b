"""Force-field relaxation + RMSD (native equivalent of the reference's
get_rdkit_rmsd, utils/evaluation/scoring_func.py:39-63,85-133).

The reference embeds conformers and minimizes with RDKit MMFF/UFF, then
reports the RMSD between the generated geometry and its relaxed form — a
measure of how strained the generated coordinates are. RDKit is not
installable here, so the relaxation is a self-contained harmonic force
field minimized with JAX autodiff on CPU:

  * bond terms: (d_ij - d0)^2 with d0 from the empirical bond-length tables
    the eval stack already carries (chem/periodic.py BONDS1/2/3, the same
    tables the reference's stability analysis uses);
  * angle terms encoded as 1-3 distance targets from the center atom's
    hybridization (sp3 109.47°, sp2 120°, sp 180°);
  * a soft nonbonded repulsion for non-bonded pairs closer than 2.2 Å.

This is a UFF-lite, not MMFF94 — energies are NOT comparable to RDKit's,
but the relaxation RMSD serves the same strain-diagnostic purpose. The
exact RDKit path lives in chem/rdkit_compat for environments that have it.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

from shapemol_tpu.chem import periodic as pt
from shapemol_tpu.chem.mol import Molecule, infer_hybridization

_ANGLE = {"sp": 180.0, "sp2": 120.0, "sp3": 109.47}


def ideal_bond_length(sym_a: str, sym_b: str, order: int) -> float:
    table = {1: pt.BONDS1, 2: pt.BONDS2, 3: pt.BONDS3}.get(
        2 if order == 4 else order, pt.BONDS1)
    d = table.get(sym_a, {}).get(sym_b) or table.get(sym_b, {}).get(sym_a)
    if d is None:
        d = pt.BONDS1.get(sym_a, {}).get(sym_b) \
            or pt.BONDS1.get(sym_b, {}).get(sym_a)
    if d is None:
        d = 100 * (pt.covalent_radius(pt.ATOMIC_NUMBERS.get(sym_a, 6))
                   + pt.covalent_radius(pt.ATOMIC_NUMBERS.get(sym_b, 6)))
    d = d / 100.0                         # tables are in pm
    if order == 4:                        # aromatic: between single/double
        d1 = (pt.BONDS1.get(sym_a, {}).get(sym_b)
              or pt.BONDS1.get(sym_b, {}).get(sym_a) or d * 100) / 100.0
        d = 0.5 * (d + d1)
    return d


def _build_terms(mol: Molecule):
    syms = mol.symbols
    hyb = mol.hybridization or infer_hybridization(mol)
    adj = mol.neighbors()
    bonds, b0 = [], []
    for i, j, o in mol.bonds:
        bonds.append((i, j))
        b0.append(ideal_bond_length(syms[i], syms[j], o))
    pairs13, p0 = [], []
    bd = mol.bond_dict()
    for c in range(mol.num_atoms):
        theta = math.radians(_ANGLE.get(hyb[c], 109.47))
        nbrs = adj[c]
        for a_i in range(len(nbrs)):
            for b_i in range(a_i + 1, len(nbrs)):
                a, b = nbrs[a_i], nbrs[b_i]
                da = ideal_bond_length(syms[c], syms[a],
                                       bd[(min(c, a), max(c, a))])
                db = ideal_bond_length(syms[c], syms[b],
                                       bd[(min(c, b), max(c, b))])
                d13 = math.sqrt(max(da * da + db * db
                                    - 2 * da * db * math.cos(theta), 1e-6))
                pairs13.append((a, b))
                p0.append(d13)
    bonded = set(bonds) | {(min(a, b), max(a, b)) for a, b in pairs13}
    nonbonded = [(i, j) for i in range(mol.num_atoms)
                 for j in range(i + 1, mol.num_atoms)
                 if (i, j) not in bonded]
    return (np.array(bonds or np.zeros((0, 2))), np.array(b0),
            np.array(pairs13 or np.zeros((0, 2))), np.array(p0),
            np.array(nonbonded or np.zeros((0, 2))))


def ff_energy_fn(mol: Molecule):
    """Returns a jax-differentiable energy(pos (N,3)) for the molecule."""
    import jax.numpy as jnp
    bonds, b0, p13, p0, nb = _build_terms(mol)

    def energy(pos):
        e = 0.0
        if len(bonds):
            d = jnp.linalg.norm(pos[bonds[:, 0]] - pos[bonds[:, 1]] + 1e-12,
                                axis=-1)
            e = e + 10.0 * jnp.sum((d - b0) ** 2)
        if len(p13):
            d = jnp.linalg.norm(pos[p13[:, 0]] - pos[p13[:, 1]] + 1e-12,
                                axis=-1)
            e = e + 2.0 * jnp.sum((d - p0) ** 2)
        if len(nb):
            d = jnp.linalg.norm(pos[nb[:, 0]] - pos[nb[:, 1]] + 1e-12,
                                axis=-1)
            e = e + 1.0 * jnp.sum(jnp.maximum(2.2 - d, 0.0) ** 2)
        return e

    return energy


def relax_molecule(mol: Molecule, steps: int = 200, lr: float = 0.01
                   ) -> Tuple[np.ndarray, float]:
    """Gradient-descent minimization. Returns (relaxed coords, energy)."""
    import jax
    import jax.numpy as jnp
    energy = ff_energy_fn(mol)
    grad = jax.jit(jax.value_and_grad(energy))
    pos = jnp.asarray(mol.pos, jnp.float32)
    for _ in range(steps):
        e, g = grad(pos)
        pos = pos - lr * g
    return np.asarray(pos, np.float64), float(energy(pos))


def kabsch_rmsd(a: np.ndarray, b: np.ndarray) -> float:
    """Minimum RMSD between conformations after optimal rigid alignment."""
    a = a - a.mean(axis=0)
    b = b - b.mean(axis=0)
    h = a.T @ b
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    r = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
    return float(np.sqrt(np.mean(np.sum((a @ r.T - b) ** 2, axis=-1))))


def ff_relax_rmsd(mol: Molecule, steps: int = 200,
                  lr: float = 0.01) -> Optional[float]:
    """RMSD between the molecule's geometry and its FF-relaxed form — the
    strain diagnostic the reference computes as get_rdkit_rmsd
    (scoring_func.py:39-63). Returns None on minimization failure."""
    try:
        relaxed, _ = relax_molecule(mol, steps, lr)
        if not np.isfinite(relaxed).all():
            return None
        return kabsch_rmsd(mol.pos, relaxed)
    except Exception:
        return None
