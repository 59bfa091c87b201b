"""Atom-count prior for sampling: p(n_atoms | shape voxel count).

Functional parity target: scripts/sample_diffusion.py:28-31,218,245-253 —
the prior is a dict {voxel_count: {n_atoms: freq}}; at sampling time the
target shape's voxel count keys a +-window (200) aggregation and atom counts
are drawn from the resulting categorical. The reference ships this dict as
data/MOSES2_training_val_shape_atomnum_dict.pkl (plain-Python pickle, loadable
without torch/rdkit); it can also be rebuilt from any dataset with
`build_atomnum_prior`."""
from __future__ import annotations

import pickle
from collections import defaultdict
from typing import Dict, Optional, Sequence

import numpy as np

from shapemol_tpu.geom.voxel import voxel_count


class AtomNumPrior:
    def __init__(self, table: Dict[int, Dict[int, int]], window: int = 200):
        self.table = table
        self.window = window
        self._keys = np.asarray(sorted(table))

    @classmethod
    def load(cls, path: str, window: int = 200) -> "AtomNumPrior":
        with open(path, "rb") as f:
            return cls(pickle.load(f), window)

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(dict(self.table), f)

    def distribution(self, n_voxels: int):
        """Aggregate counts for keys within +-window of n_voxels."""
        lo, hi = n_voxels - self.window, n_voxels + self.window
        agg: Dict[int, float] = defaultdict(float)
        for k in self._keys[(self._keys >= lo) & (self._keys <= hi)]:
            for n, c in self.table[int(k)].items():
                agg[int(n)] += c
        if not agg:          # fall back to the global marginal
            for k in self._keys:
                for n, c in self.table[int(k)].items():
                    agg[int(n)] += c
        ns = np.asarray(sorted(agg))
        ps = np.asarray([agg[int(n)] for n in ns], dtype=np.float64)
        return ns, ps / ps.sum()

    def sample(self, n_voxels: int, size: int,
               rng: Optional[np.random.Generator] = None) -> np.ndarray:
        rng = rng or np.random.default_rng()
        ns, ps = self.distribution(n_voxels)
        return rng.choice(ns, size=size, p=ps)


def build_atomnum_prior(mols: Sequence, grid_resolution: float = 0.5,
                        max_dist: float = 11.0) -> AtomNumPrior:
    """Rebuild the {voxel_count: {n_atoms: freq}} table from molecules."""
    table: Dict[int, Dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for mol in mols:
        vc = voxel_count(mol.atomic_nums, mol.pos, grid_resolution, max_dist)
        heavy = int((np.asarray(mol.atomic_nums) != 1).sum())
        table[vc][heavy] += 1
    return AtomNumPrior({k: dict(v) for k, v in table.items()})
