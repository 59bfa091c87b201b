"""Periodic-table data used across the framework: symbols, covalent and
van-der-Waals radii, allowed valences, and empirical bond-length tables.

Sources: standard published chemistry constants (Cordero et al. covalent
radii; Bondi/Amber vdW radii). Functional parity targets in the reference:
  * ATOM_RADIUS / ATOMIC_NUMBER           — utils/shape.py:28-55
  * allowed_bonds (valence table)         — utils/evaluation/analyze.py:54-...
  * bonds1/2/3 empirical lengths + margins — utils/evaluation/analyze.py:16-52
  * covalent radii for bond perception    — OpenBabel GetCovalentRad usage at
    utils/covalent_graph.py:7-19 and utils/reconstruct.py:82-160
"""
from __future__ import annotations

SYMBOLS = {
    1: "H", 5: "B", 6: "C", 7: "N", 8: "O", 9: "F", 14: "Si", 15: "P",
    16: "S", 17: "Cl", 33: "As", 35: "Br", 53: "I", 80: "Hg", 83: "Bi",
}
ATOMIC_NUMBERS = {v: k for k, v in SYMBOLS.items()}

# van der Waals radii (Å) for shape/voxel computation (Amber-style set used
# by the reference's voxelizer, utils/shape.py:28-39)
VDW_RADIUS = {
    "C": 1.908, "F": 1.75, "Cl": 1.948, "Br": 2.22, "I": 2.35,
    "N": 1.824, "O": 1.6612, "P": 2.1, "S": 2.0, "Si": 2.2, "H": 1.2,
}

# covalent radii (Å), single-bond (Cordero 2008 / OpenBabel values)
COVALENT_RADIUS = {
    1: 0.31, 5: 0.84, 6: 0.76, 7: 0.71, 8: 0.66, 9: 0.57, 14: 1.11,
    15: 1.07, 16: 1.05, 17: 1.02, 33: 1.19, 35: 1.20, 53: 1.39,
    80: 1.32, 83: 1.48,
}

# maximum allowed valence per element; int = fixed, list = charge-dependent
# alternatives (same semantics as the reference's allowed_bonds table)
ALLOWED_VALENCES = {
    "H": 1, "C": 4, "N": 3, "O": 2, "F": 1, "B": 3, "Al": 3, "Si": 4,
    "P": [3, 5], "S": [2, 4, 6], "Cl": 1, "As": 3, "Br": 1, "I": 1,
    "Hg": [1, 2], "Bi": [3, 5],
}

# Empirical single/double/triple bond lengths (pm) between heavy-atom pairs,
# with a stability margin — the standard tables used for molecule-stability
# checks in 3D generative modeling (same data family as the reference's
# bonds1/2/3, utils/evaluation/analyze.py:16-52).
BONDS1 = {
    "H": {"H": 74, "C": 109, "N": 101, "O": 96, "F": 92, "B": 119,
          "Si": 148, "P": 144, "S": 134, "Cl": 127, "Br": 141, "I": 161},
    "C": {"H": 109, "C": 154, "N": 147, "O": 143, "F": 135, "Si": 185,
          "P": 184, "S": 182, "Cl": 177, "Br": 194, "I": 214},
    "N": {"H": 101, "C": 147, "N": 145, "O": 140, "F": 136, "Cl": 175,
          "Br": 214, "S": 168, "I": 222, "P": 177},
    "O": {"H": 96, "C": 143, "N": 140, "O": 148, "F": 142, "Br": 172,
          "S": 151, "P": 163, "Si": 163, "Cl": 164, "I": 194},
    "F": {"H": 92, "C": 135, "N": 136, "O": 142, "F": 142, "S": 158,
          "Si": 160, "Cl": 166, "Br": 178, "P": 156, "I": 187},
    "B": {"H": 119, "Cl": 175},
    "Si": {"Si": 233, "H": 148, "C": 185, "O": 163, "S": 200, "F": 160,
           "Cl": 202, "Br": 215, "I": 243},
    "Cl": {"Cl": 199, "H": 127, "C": 177, "N": 175, "O": 164, "P": 203,
           "S": 207, "B": 175, "Si": 202, "F": 166, "Br": 214},
    "S": {"H": 134, "C": 182, "N": 168, "O": 151, "S": 204, "F": 158,
          "Cl": 207, "Br": 225, "Si": 200, "P": 210, "I": 234},
    "Br": {"Br": 228, "H": 141, "C": 194, "O": 172, "N": 214, "Si": 215,
           "S": 225, "F": 178, "Cl": 214, "P": 222},
    "P": {"P": 221, "H": 144, "C": 184, "O": 163, "Cl": 203, "S": 210,
          "F": 156, "N": 177, "Br": 222},
    "I": {"H": 161, "C": 214, "Si": 243, "N": 222, "O": 194, "S": 234,
          "F": 187, "I": 266},
}
BONDS2 = {
    "C": {"C": 134, "N": 129, "O": 120, "S": 160},
    "N": {"C": 129, "N": 125, "O": 121},
    "O": {"C": 120, "N": 121, "O": 121, "P": 150},
    "P": {"O": 150, "S": 186},
    "S": {"P": 186, "C": 160},
}
BONDS3 = {
    "C": {"C": 120, "N": 116, "O": 113},
    "N": {"C": 116, "N": 110},
    "O": {"C": 113},
}
MARGIN1, MARGIN2, MARGIN3 = 10, 5, 3   # pm


def covalent_radius(z: int) -> float:
    return COVALENT_RADIUS.get(z, 0.77)


def vdw_radius_by_z(z: int) -> float:
    return VDW_RADIUS.get(SYMBOLS.get(z, "C"), 1.7)


def get_bond_order(sym_a: str, sym_b: str, distance_angstrom: float,
                   check_exists: bool = False) -> int:
    """Classify a pairwise distance into bond order 0/1/2/3 using the
    empirical tables + margins (same decision procedure as the reference's
    get_bond_order, utils/evaluation/analyze.py:249-262)."""
    d = distance_angstrom * 100.0  # pm
    if check_exists:
        if sym_a not in BONDS1 or sym_b not in BONDS1.get(sym_a, {}):
            return 0
    if sym_a in BONDS3 and sym_b in BONDS3[sym_a] and d < BONDS3[sym_a][sym_b] + MARGIN3:
        return 3
    if sym_a in BONDS2 and sym_b in BONDS2[sym_a] and d < BONDS2[sym_a][sym_b] + MARGIN2:
        return 2
    if sym_a in BONDS1 and sym_b in BONDS1[sym_a] and d < BONDS1[sym_a][sym_b] + MARGIN1:
        return 1
    return 0


def allowed_valence(sym: str):
    return ALLOWED_VALENCES.get(sym, 4)
