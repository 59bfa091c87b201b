"""Bond-length and pair-distance distribution metrics (Jensen-Shannon
divergence against empirical reference distributions).

Functional parity target: utils/evaluation/eval_bond_length.py (bins,
profile construction, JSD) + eval_bond_length_config.py (frozen empirical
histograms). The reference ships its empirical MOSES2 histograms as a frozen
1019-line constants file; here the reference profiles are *built from data*
with `build_empirical_profiles` and persisted as JSON
(`save_profiles`/`load_profiles`) — same metric, reproducible provenance.
"""
from __future__ import annotations

import collections
import json
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from scipy.spatial.distance import jensenshannon

from shapemol_tpu.chem.mol import Molecule

BondType = Tuple[int, int, int]          # (z1, z2, bond_order) with z1<=z2
BondLengthData = Tuple[BondType, float]

# identical binning to the reference (eval_bond_length_config.py:5-11)
DISTANCE_BINS = np.arange(1.1, 1.7, 0.005)[:-1]
PAIR_BINS = {
    "CC_2A": np.linspace(0, 2, 100),
    "All_12A": np.linspace(0, 12, 100),
}
# the bond types tracked by the reference metric (same frozenset)
TRACKED_BOND_TYPES = frozenset(
    ((6, 6, 1), (6, 6, 2), (6, 6, 4), (6, 7, 1), (6, 7, 2), (6, 7, 4),
     (6, 8, 1), (6, 8, 2)))


def get_distribution(distances: Sequence[float],
                     bins: np.ndarray = DISTANCE_BINS) -> np.ndarray:
    counts = collections.Counter(np.searchsorted(bins, distances))
    arr = np.array([counts.get(i, 0) for i in range(len(bins) + 1)],
                   dtype=np.float64)
    return arr / max(arr.sum(), 1.0)


def _fmt(bt: BondType) -> BondType:
    a, b, o = bt
    return (b, a, o) if a > b else bt


def bond_distances_from_mol(mol: Molecule) -> List[BondLengthData]:
    out = []
    for i, j, o in mol.bonds:
        d = float(np.linalg.norm(mol.pos[i] - mol.pos[j]))
        out.append((_fmt((int(mol.atomic_nums[i]), int(mol.atomic_nums[j]),
                          int(o))), d))
    return out


def pair_distances_from_pos(pos: np.ndarray, atomic_nums: Sequence[int]
                            ) -> List[Tuple[Tuple[int, int], float]]:
    pos = np.asarray(pos)
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    out = []
    n = len(pos)
    for s in range(n):
        for e in range(s + 1, n):
            out.append(((int(atomic_nums[s]), int(atomic_nums[e])),
                        float(d[s, e])))
    return out


def get_bond_length_profile(bond_lengths: Sequence[BondLengthData]
                            ) -> Dict[BondType, np.ndarray]:
    groups = collections.defaultdict(list)
    for bt, d in bond_lengths:
        groups[_fmt(bt)].append(d)
    return {k: get_distribution(v) for k, v in groups.items()}


def get_pair_length_profile(pair_lengths) -> Dict[str, np.ndarray]:
    cc = [d for (z, d) in pair_lengths
          if tuple(sorted(z)) == (6, 6) and d < 2]
    al = [d for (_z, d) in pair_lengths if d < 12]
    return {"CC_2A": get_distribution(cc, PAIR_BINS["CC_2A"]),
            "All_12A": get_distribution(al, PAIR_BINS["All_12A"])}


def _bt_str(bt: BondType) -> str:
    return f"{bt[0]}-{bt[1]}|{bt[2]}"


def _jsd(gt: np.ndarray, profile: Optional[np.ndarray]) -> Optional[float]:
    """JSD between a reference histogram and an observed profile; None when
    the profile is missing or empty (all-zero profiles would make scipy's
    jensenshannon emit a divide-by-zero warning and return nan)."""
    if profile is None or float(np.sum(profile)) <= 0.0:
        return None
    return float(jensenshannon(gt, profile))


def eval_bond_length_profile(profile: Dict[BondType, np.ndarray],
                             reference: Dict[BondType, np.ndarray]
                             ) -> Dict[str, Optional[float]]:
    return {f"JSD_{_bt_str(bt)}": _jsd(gt, profile.get(bt))
            for bt, gt in reference.items()}


def eval_pair_length_profile(profile: Dict[str, np.ndarray],
                             reference: Dict[str, np.ndarray]
                             ) -> Dict[str, Optional[float]]:
    return {f"JSD_{k}": _jsd(gt, profile.get(k))
            for k, gt in reference.items()}


# --------------------------------------------------------------------------
# Empirical reference profiles: build from a dataset, persist as JSON
# --------------------------------------------------------------------------

def build_empirical_profiles(mols: Sequence[Molecule]):
    """Compute (bond_profile, pair_profile) over a dataset of molecules —
    the provenance-tracked replacement for the reference's frozen config."""
    bond_data: List[BondLengthData] = []
    pair_data = []
    for mol in mols:
        bond_data.extend(bond_distances_from_mol(mol))
        pair_data.extend(pair_distances_from_pos(mol.pos, mol.atomic_nums))
    bond_profile = {bt: dist for bt, dist in
                    get_bond_length_profile(bond_data).items()
                    if bt in TRACKED_BOND_TYPES}
    return bond_profile, get_pair_length_profile(pair_data)


def save_profiles(path: str, bond_profile, pair_profile) -> None:
    payload = {
        "bond": {f"{a}_{b}_{o}": dist.tolist()
                 for (a, b, o), dist in bond_profile.items()},
        "pair": {k: v.tolist() for k, v in pair_profile.items()},
    }
    with open(path, "w") as f:
        json.dump(payload, f)


def load_profiles(path: str):
    with open(path) as f:
        payload = json.load(f)
    bond = {tuple(int(x) for x in k.split("_")): np.asarray(v)
            for k, v in payload["bond"].items()}
    pair = {k: np.asarray(v) for k, v in payload["pair"].items()}
    return bond, pair
