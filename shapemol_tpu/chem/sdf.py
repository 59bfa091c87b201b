"""SDF / MOL (V2000) reader and writer — self-contained replacement for the
RDKit/OpenBabel file I/O the reference relies on (utils/data.py:23-25
parse_sdf_file; ShaEP adapter writes mol files in
utils/evaluation/shaep_utils.py:37-46)."""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from shapemol_tpu.chem import periodic as pt
from shapemol_tpu.chem.mol import Molecule, AROMATIC

_SDF_BOND_ORDER = {1: 1, 2: 2, 3: 3, 4: AROMATIC}
_OUT_BOND_ORDER = {1: 1, 2: 2, 3: 3, AROMATIC: 4}
_CHG_CODE = {3: 1, 2: 2, 1: 3, 0: 0, -1: 5, -2: 6, -3: 7}
_CHG_DECODE = {1: 3, 2: 2, 3: 1, 0: 0, 5: -1, 6: -2, 7: -3}


def parse_molblock(block: str) -> Molecule:
    """Parse one V2000 molblock into a Molecule."""
    lines = block.splitlines()
    if len(lines) < 4:
        raise ValueError("molblock too short")
    counts = lines[3]
    n_atoms = int(counts[0:3])
    n_bonds = int(counts[3:6])
    atoms, pos = [], []
    for k in range(n_atoms):
        ln = lines[4 + k]
        x, y, z = float(ln[0:10]), float(ln[10:20]), float(ln[20:30])
        sym = ln[31:34].strip()
        atoms.append(pt.ATOMIC_NUMBERS.get(sym, 6))
        pos.append((x, y, z))
    bonds = []
    for k in range(n_bonds):
        ln = lines[4 + n_atoms + k]
        i, j = int(ln[0:3]) - 1, int(ln[3:6]) - 1
        order = _SDF_BOND_ORDER.get(int(ln[6:9]), 1)
        bonds.append((min(i, j), max(i, j), order))
    charges = np.zeros(n_atoms, dtype=np.int32)
    for ln in lines[4 + n_atoms + n_bonds:]:
        if ln.startswith("M  CHG"):
            fields = ln.split()
            cnt = int(fields[2])
            for c in range(cnt):
                idx = int(fields[3 + 2 * c]) - 1
                charges[idx] = int(fields[4 + 2 * c])
        if ln.startswith("M  END"):
            break
    return Molecule(np.asarray(atoms), np.asarray(pos), bonds,
                    charges=charges)


def read_sdf(path: str) -> List[Molecule]:
    with open(path) as f:
        text = f.read()
    mols = []
    for block in text.split("$$$$"):
        block = block.strip("\n")
        if not block.strip():
            continue
        try:
            mols.append(parse_molblock(block))
        except (ValueError, IndexError):
            continue
    return mols


def to_molblock(mol: Molecule, name: str = "") -> str:
    """Serialize to a V2000 molblock (kekulized: aromatic bonds written as
    order 4, which downstream tools accept for query files)."""
    n, m = mol.num_atoms, len(mol.bonds)
    lines = [name, "  shapemol_tpu", "",
             f"{n:>3d}{m:>3d}  0  0  0  0  0  0  0  0999 V2000"]
    syms = mol.symbols
    for a in range(n):
        x, y, z = mol.pos[a]
        lines.append(f"{x:>10.4f}{y:>10.4f}{z:>10.4f} {syms[a]:<3s}"
                     " 0  0  0  0  0  0  0  0  0  0  0  0")
    for (i, j, o) in mol.bonds:
        lines.append(f"{i + 1:>3d}{j + 1:>3d}{_OUT_BOND_ORDER[o]:>3d}  0  0  0  0")
    chg = [(a + 1, int(c)) for a, c in enumerate(mol.charges) if c != 0]
    for k in range(0, len(chg), 8):
        part = chg[k:k + 8]
        lines.append("M  CHG" + f"{len(part):>3d}" +
                     "".join(f"{i:>4d}{c:>4d}" for i, c in part))
    lines.append("M  END")
    return "\n".join(lines)


def write_sdf(path: str, mols: List[Molecule],
              names: Optional[List[str]] = None) -> None:
    with open(path, "w") as f:
        for k, mol in enumerate(mols):
            name = names[k] if names else f"mol_{k}"
            f.write(to_molblock(mol, name))
            f.write("\n$$$$\n")
