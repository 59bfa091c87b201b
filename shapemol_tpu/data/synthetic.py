"""Synthetic drug-like molecule generator (host): chemically plausible 3D
graphs for tests, demos and pipeline smoke runs when no real dataset is
mounted. Produces chains/branches/rings of C/N/O/F/S with standard bond
lengths and tetrahedral-ish geometry."""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from shapemol_tpu.chem.mol import Molecule, perceive_aromaticity, infer_hybridization

_ELEMENTS = [6, 6, 6, 6, 6, 6, 7, 8, 9, 16]   # carbon-rich marginal
_BOND_LEN = {6: 1.52, 7: 1.47, 8: 1.43, 9: 1.38, 16: 1.81}


def _rand_direction(rng, prev_dir):
    """New bond direction ~109.5 degrees from the previous one."""
    while True:
        r = rng.standard_normal(3)
        r /= np.linalg.norm(r)
        # reflect to make angle with prev about 104-114 deg
        proj = r - prev_dir * (r @ prev_dir)
        n = np.linalg.norm(proj)
        if n > 1e-3:
            proj /= n
            ang = np.deg2rad(109.5 + rng.uniform(-6, 6))
            return -np.cos(ang) * prev_dir + np.sin(ang) * proj


def random_molecule(rng: Optional[np.random.Generator] = None,
                    n_atoms: Optional[int] = None,
                    ring_prob: float = 0.4) -> Molecule:
    rng = rng or np.random.default_rng()
    n = int(n_atoms or rng.integers(10, 28))

    atomic, pos, bonds = [6], [np.zeros(3)], []
    dirs = [np.array([1.0, 0, 0])]
    open_sites = [0]

    if rng.random() < ring_prob and n >= 8:
        # start from a benzene ring
        ang = np.arange(6) * np.pi / 3
        r = 1.39 / (2 * np.sin(np.pi / 6))
        ring = np.stack([r * np.cos(ang), r * np.sin(ang), np.zeros(6)], 1)
        atomic = [6] * 6
        pos = list(ring)
        bonds = [(i, (i + 1) % 6, 4) for i in range(6)]
        bonds = [(min(a, b), max(a, b), o) for a, b, o in bonds]
        open_sites = list(range(6))
        dirs = [p / np.linalg.norm(p) for p in ring]

    while len(atomic) < n and open_sites:
        site = int(rng.choice(open_sites))
        z = int(rng.choice(_ELEMENTS))
        d = _rand_direction(rng, dirs[site])
        new_pos = pos[site] + d * _BOND_LEN.get(z, 1.52)
        # reject clashes
        if min(np.linalg.norm(np.asarray(pos) - new_pos, axis=1)) < 1.1:
            open_sites.remove(site)
            continue
        idx = len(atomic)
        atomic.append(z)
        pos.append(new_pos)
        bonds.append((site, idx, 1))
        dirs.append(d)
        # terminal elements close the site; others may branch
        if z in (9,):
            pass
        else:
            open_sites.append(idx)
        if rng.random() < 0.5 and site in open_sites:
            open_sites.remove(site)

    mol = Molecule(np.asarray(atomic), np.asarray(pos),
                   [(min(a, b), max(a, b), o) for a, b, o in bonds])
    perceive_aromaticity(mol)
    infer_hybridization(mol)
    return mol


def random_dataset(n_mols: int, seed: int = 0,
                   n_atoms: Optional[int] = None) -> List[Molecule]:
    rng = np.random.default_rng(seed)
    out = []
    while len(out) < n_mols:
        try:
            out.append(random_molecule(rng, n_atoms=n_atoms))
        except Exception:
            continue
    return out
