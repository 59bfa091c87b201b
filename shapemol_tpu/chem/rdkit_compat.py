"""Optional RDKit adapters. When RDKit is installed, these convert between
the framework's Molecule graphs and RDKit mols and route property scoring
(QED/SA/logP) to the exact RDKit implementations, superseding the
self-contained approximations in eval/scoring.py.

All functions raise ImportError with a clear message when RDKit is absent —
the rest of the framework never imports this module implicitly."""
from __future__ import annotations

import numpy as np

from shapemol_tpu.chem.mol import Molecule, AROMATIC


def _require_rdkit():
    try:
        from rdkit import Chem  # noqa: F401
        return True
    except ImportError as e:
        raise ImportError(
            "RDKit is not installed; use the self-contained implementations "
            "in shapemol_tpu.eval.scoring / chem.smiles instead") from e


def to_rdkit(mol: Molecule):
    """Molecule -> rdkit.Chem.Mol with a 3D conformer."""
    _require_rdkit()
    from rdkit import Chem
    from rdkit.Geometry import Point3D

    rw = Chem.RWMol()
    for z in mol.atomic_nums:
        rw.AddAtom(Chem.Atom(int(z)))
    order_map = {1: Chem.BondType.SINGLE, 2: Chem.BondType.DOUBLE,
                 3: Chem.BondType.TRIPLE, AROMATIC: Chem.BondType.AROMATIC}
    for (i, j, o) in mol.bonds:
        rw.AddBond(int(i), int(j), order_map[o])
    conf = Chem.Conformer(mol.num_atoms)
    for a in range(mol.num_atoms):
        x, y, z = (float(c) for c in mol.pos[a])
        conf.SetAtomPosition(a, Point3D(x, y, z))
    m = rw.GetMol()
    m.AddConformer(conf)
    for a in range(mol.num_atoms):
        if int(mol.charges[a]):
            m.GetAtomWithIdx(a).SetFormalCharge(int(mol.charges[a]))
    Chem.SanitizeMol(m, Chem.SANITIZE_ALL ^ Chem.SANITIZE_KEKULIZE)
    return m


def from_rdkit(rdmol) -> Molecule:
    """rdkit.Chem.Mol (with conformer) -> Molecule."""
    _require_rdkit()
    from rdkit import Chem

    conf = rdmol.GetConformer()
    n = rdmol.GetNumAtoms()
    atomic = np.array([a.GetAtomicNum() for a in rdmol.GetAtoms()])
    pos = np.array([[conf.GetAtomPosition(i).x, conf.GetAtomPosition(i).y,
                     conf.GetAtomPosition(i).z] for i in range(n)])
    rev = {Chem.BondType.SINGLE: 1, Chem.BondType.DOUBLE: 2,
           Chem.BondType.TRIPLE: 3, Chem.BondType.AROMATIC: AROMATIC}
    bonds = []
    for b in rdmol.GetBonds():
        i, j = b.GetBeginAtomIdx(), b.GetEndAtomIdx()
        bonds.append((min(i, j), max(i, j), rev.get(b.GetBondType(), 1)))
    mol = Molecule(atomic, pos, bonds,
                   charges=np.array([a.GetFormalCharge()
                                     for a in rdmol.GetAtoms()]),
                   aromatic=np.array([a.GetIsAromatic()
                                      for a in rdmol.GetAtoms()]))
    return mol


def exact_chem_scores(mol: Molecule) -> dict:
    """RDKit-exact {qed, sa, logp, lipinski} (requires rdkit + the sascorer
    contrib module)."""
    _require_rdkit()
    from rdkit.Chem import Crippen, Descriptors, Lipinski, QED
    m = to_rdkit(mol)
    out = {
        "qed": QED.qed(m),
        "logp": Crippen.MolLogP(m),
        "lipinski": int(sum([
            Descriptors.ExactMolWt(m) < 500,
            Crippen.MolLogP(m) <= 5,
            Lipinski.NumHDonors(m) <= 5,
            Lipinski.NumHAcceptors(m) <= 10,
        ])),
    }
    try:
        from rdkit.Chem import RDConfig
        import os as _os
        import sys as _sys
        _sys.path.append(_os.path.join(RDConfig.RDContribDir, "SA_Score"))
        import sascorer
        sa = sascorer.calculateScore(m)
        out["sa"] = round((10 - sa) / 9, 2)
    except Exception:
        out["sa"] = None
    return out


def canonical_smiles(mol: Molecule) -> str:
    _require_rdkit()
    from rdkit import Chem
    return Chem.MolToSmiles(to_rdkit(mol))
