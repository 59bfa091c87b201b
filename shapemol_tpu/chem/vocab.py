"""Atom-type vocabularies for the categorical diffusion chain and
index<->(element, aromatic, hybridization) converters.

Functional parity target: utils/transforms.py:11-111 (the three vocabularies
and converters). The 15-class 'add_aromatic' vocabulary is what the shipped
diffusion configs use (feature_dim 15)."""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

# (atomic_number, hybridization, is_aromatic) -> class index
MAP_ATOM_TYPE_FULL_TO_INDEX = {
    (1, "S", False): 0,
    (6, "SP", False): 1, (6, "SP2", False): 2, (6, "SP2", True): 3,
    (6, "SP3", False): 4,
    (7, "SP", False): 5, (7, "SP2", False): 6, (7, "SP2", True): 7,
    (7, "SP3", False): 8,
    (8, "SP2", False): 9, (8, "SP2", True): 10, (8, "SP3", False): 11,
    (9, "SP3", False): 12,
    (15, "SP2", False): 13, (15, "SP2", True): 14, (15, "SP3", False): 15,
    (15, "SP3D", False): 16,
    (16, "SP2", False): 17, (16, "SP2", True): 18, (16, "SP3", False): 19,
    (16, "SP3D", False): 20, (16, "SP3D2", False): 21,
    (17, "SP3", False): 22,
}

MAP_ATOM_TYPE_ONLY_TO_INDEX = {
    1: 0, 6: 1, 7: 2, 8: 3, 9: 4, 15: 5, 16: 6, 17: 7, 35: 8, 53: 9,
}

MAP_ATOM_TYPE_AROMATIC_TO_INDEX = {
    (1, False): 0,
    (6, False): 1, (6, True): 2,
    (7, False): 3, (7, True): 4,
    (8, False): 5, (8, True): 6,
    (9, False): 7,
    (15, False): 8, (15, True): 9,
    (16, False): 10, (16, True): 11,
    (17, False): 12,
    (35, False): 13,
    (53, False): 14,
}

MAP_INDEX_TO_ATOM_TYPE_ONLY = {v: k for k, v in MAP_ATOM_TYPE_ONLY_TO_INDEX.items()}
MAP_INDEX_TO_ATOM_TYPE_AROMATIC = {v: k for k, v in MAP_ATOM_TYPE_AROMATIC_TO_INDEX.items()}
MAP_INDEX_TO_ATOM_TYPE_FULL = {v: k for k, v in MAP_ATOM_TYPE_FULL_TO_INDEX.items()}


def feature_dim(mode: str) -> int:
    if mode == "basic":
        return len(MAP_ATOM_TYPE_ONLY_TO_INDEX)
    if mode == "add_aromatic":
        return len(MAP_ATOM_TYPE_AROMATIC_TO_INDEX)
    if mode == "full":
        return len(MAP_ATOM_TYPE_FULL_TO_INDEX)
    raise ValueError(mode)


def get_index(atomic_num: int, hybridization: Optional[str],
              is_aromatic: Optional[bool], mode: str) -> int:
    if mode == "basic":
        return MAP_ATOM_TYPE_ONLY_TO_INDEX[int(atomic_num)]
    if mode == "add_aromatic":
        return MAP_ATOM_TYPE_AROMATIC_TO_INDEX[(int(atomic_num),
                                                bool(is_aromatic))]
    return MAP_ATOM_TYPE_FULL_TO_INDEX[(int(atomic_num),
                                        str(hybridization),
                                        bool(is_aromatic))]


def get_atomic_numbers(indices: Sequence[int], mode: str) -> List[int]:
    """Class indices -> atomic numbers; unknown indices fall back to carbon
    (same fallback as the reference, utils/transforms.py:77)."""
    if mode == "basic":
        return [MAP_INDEX_TO_ATOM_TYPE_ONLY[int(i)] for i in indices]
    if mode == "add_aromatic":
        K = len(MAP_INDEX_TO_ATOM_TYPE_AROMATIC)
        return [MAP_INDEX_TO_ATOM_TYPE_AROMATIC[int(i)][0] if int(i) < K
                else 6 for i in indices]
    if mode == "full":
        return [MAP_INDEX_TO_ATOM_TYPE_FULL[int(i)][0] for i in indices]
    raise ValueError(mode)


def get_aromatic_flags(indices: Sequence[int], mode: str):
    if mode == "basic":
        return None
    if mode == "add_aromatic":
        K = len(MAP_INDEX_TO_ATOM_TYPE_AROMATIC)
        return [MAP_INDEX_TO_ATOM_TYPE_AROMATIC[int(i)][1] if int(i) < K
                else False for i in indices]
    if mode == "full":
        return [MAP_INDEX_TO_ATOM_TYPE_FULL[int(i)][2] for i in indices]
    raise ValueError(mode)


def featurize(atomic_nums: Sequence[int], aromatic: Optional[Sequence[bool]],
              hybridization: Optional[Sequence[str]],
              mode: str = "add_aromatic") -> np.ndarray:
    """Molecule -> per-atom class indices (FeaturizeLigandAtom equivalent,
    utils/transforms.py:135-159)."""
    n = len(atomic_nums)
    arom = aromatic if aromatic is not None else [False] * n
    hyb = hybridization if hybridization is not None else ["SP3"] * n
    return np.asarray([get_index(z, h, a, mode)
                       for z, h, a in zip(atomic_nums, hyb, arom)],
                      dtype=np.int32)
