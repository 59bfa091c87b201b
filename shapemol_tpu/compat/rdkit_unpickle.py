"""Torch-free, RDKit-free reader for pickled RDKit molecules.

The reference ships its 1000-molecule MOSES2 test set as a pickle of
``rdkit.Chem.rdchem.Mol`` objects (`/root/reference/data/MOSES2_test_mol.pkl`,
consumed at `scripts/sample_diffusion.py:204-208` and
`scripts/evaluate_diffusion_sim.py:100`).  RDKit is not installable in this
environment, so this module does two things natively:

1. A restricted ``pickle.Unpickler`` that resolves ``rdkit.Chem.rdchem.Mol``
   to a shim capturing the constructor's binary blob (RDKit Mols pickle via
   ``Mol.__reduce__ -> (Mol, (binary,))``) and rejects every other global.
2. A parser for RDKit's binary MolPickler stream (format version 13.0.x,
   little-endian) covering the subset these molecules use: atoms with
   property flags, bonds with order/direction/stereo, the SSSR ring block,
   and float32 conformers.  The layout was verified structurally against all
   1000 shipped molecules (every blob must parse exactly to its final byte).

The output is the framework's own ``chem.mol.Molecule`` graph type.
"""
from __future__ import annotations

import io
import pickle
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from shapemol_tpu.chem.mol import AROMATIC, Molecule

# ---------------------------------------------------------------------------
# restricted unpickler
# ---------------------------------------------------------------------------


class _ShimMol:
    """Stand-in for rdkit.Chem.rdchem.Mol: captures the binary payload."""

    def __init__(self, binary: bytes = b""):
        self.binary = binary
        self.props: Dict = {}

    def __setstate__(self, state):          # Mol pickles BUILD with ({},)
        if isinstance(state, tuple) and state and isinstance(state[0], dict):
            self.props = state[0]
        elif isinstance(state, dict):
            self.props = state


class _RestrictedUnpickler(pickle.Unpickler):
    _ALLOWED = {
        ("rdkit.Chem.rdchem", "Mol"): _ShimMol,
    }

    def find_class(self, module, name):
        try:
            return self._ALLOWED[(module, name)]
        except KeyError:
            raise pickle.UnpicklingError(
                f"global '{module}.{name}' is not allowed (this reader only "
                "loads RDKit Mol pickles)")


# ---------------------------------------------------------------------------
# binary MolPickler stream
# ---------------------------------------------------------------------------

_MAGIC = 0xDEADBEEF
# tag bytes observed in format v13 streams (names per RDKit MolPickler::Tags)
_TAG_VERSION = 0
_TAG_BEGINATOM = 1
_TAG_BEGINBOND = 11
_TAG_BEGINSSSR = 20
_TAG_ENDMOL = 22
_TAG_BEGINCONFS = 23

# RDKit HybridizationType enum -> framework strings
_HYB = {0: None, 1: "s", 2: "sp", 3: "sp2", 4: "sp3", 5: "sp3d", 6: "sp3d2"}
# RDKit BondType enum values used by MOSES chemistry
_BOND_ORDER = {1: 1, 2: 2, 3: 3, 12: AROMATIC}


class _Reader:
    def __init__(self, data: bytes):
        self.buf = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise ValueError("truncated RDKit binary mol")
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def i8(self) -> int:
        return struct.unpack("<b", self.take(1))[0]

    def i32(self) -> int:
        return struct.unpack("<i", self.take(4))[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.take(4))[0]

    def f32s(self, n: int) -> np.ndarray:
        return np.frombuffer(self.take(4 * n), dtype="<f4").copy()

    def done(self) -> bool:
        return self.pos == len(self.buf)


def parse_mol_binary(blob: bytes) -> Molecule:
    """RDKit MolPickler binary stream -> Molecule.

    Raises ValueError on structural mismatch (unknown tag, unconsumed
    bytes, query atoms) so corrupt input is loud, never silently wrong.
    """
    r = _Reader(blob)
    if r.u32() != _MAGIC:
        raise ValueError("bad endian marker (not an RDKit binary mol)")
    if r.i32() != _TAG_VERSION:
        raise ValueError("expected VERSION tag")
    major, minor, patch = r.i32(), r.i32(), r.i32()
    if not 9 <= major <= 16:
        raise ValueError(f"unsupported MolPickler major version {major}")
    num_atoms, num_bonds = r.i32(), r.i32()
    if not (0 < num_atoms < 1 << 20 and 0 <= num_bonds < 1 << 20):
        raise ValueError("implausible atom/bond counts")
    wide = num_atoms > 255          # index type: uchar below 256, int32 above
    idx = r.i32 if wide else r.u8
    _flags = r.u8()                 # bit7: has conformers

    atomic_nums = np.zeros(num_atoms, dtype=np.int32)
    aromatic = np.zeros(num_atoms, dtype=bool)
    charges = np.zeros(num_atoms, dtype=np.int32)
    hybridization: List[Optional[str]] = [None] * num_atoms
    implicit_h = np.zeros(num_atoms, dtype=np.int32)
    total_h = np.zeros(num_atoms, dtype=np.int32)
    total_valence = np.zeros(num_atoms, dtype=np.int32)
    bonds: List[Tuple[int, int, int]] = []
    pos: Optional[np.ndarray] = None
    rings: List[List[int]] = []

    if r.u8() != _TAG_BEGINATOM:
        raise ValueError("expected BEGINATOM")
    for a in range(num_atoms):
        atomic_nums[a] = r.u8()
        aflags = r.u8()
        if aflags & (1 << 4):
            raise ValueError("query atoms unsupported")
        aromatic[a] = bool(aflags & (1 << 6))
        # property-presence bitfield; each observed bit carries one byte:
        #   bit0 formal charge (signed), bit1 ? (unseen), bit2 chiral tag,
        #   bit3 hybridization, bit4 numImplicitHs, bit5 explicit+implicit
        #   valence, bit6 totalNumHs, bit7 isotope
        pflags = r.u32()
        if pflags >> 8:
            raise ValueError(f"unknown atom propFlags 0x{pflags:x}")
        if pflags & 0x01:
            charges[a] = r.i8()
        if pflags & 0x02:
            r.u8()
        if pflags & 0x04:
            r.u8()                                # chiral tag (unused here)
        if pflags & 0x08:
            hybridization[a] = _HYB.get(r.u8())
        if pflags & 0x10:
            implicit_h[a] = r.u8()
        if pflags & 0x20:
            total_valence[a] = r.u8()
        if pflags & 0x40:
            total_h[a] = r.u8()                   # totalNumHs
        if pflags & 0x80:
            r.u8()                                # isotope

    if r.u8() != _TAG_BEGINBOND:
        raise ValueError("expected BEGINBOND")
    for _ in range(num_bonds):
        i, j = idx(), idx()
        bflags = r.u8()
        if bflags & (1 << 4):
            raise ValueError("query bonds unsupported")
        order = 1
        if bflags & (1 << 3):
            bt = r.u8()
            if bt not in _BOND_ORDER:
                raise ValueError(f"unsupported bond type {bt}")
            order = _BOND_ORDER[bt]
        if bflags & (1 << 2):
            r.u8()                                # bond direction
        if bflags & (1 << 1):
            r.u8()                                # stereo descriptor
            n_ref = r.u8()
            for _ in range(n_ref):
                idx()                             # stereo atom refs
        if not (i < num_atoms and j < num_atoms and i != j):
            raise ValueError("bond index out of range")
        bonds.append((min(i, j), max(i, j), order))

    tag = r.u8()
    if tag == _TAG_BEGINSSSR:
        n_rings = r.i32()
        for _ in range(n_rings):
            size = idx()
            rings.append([idx() for _ in range(size)])
        tag = r.u8()

    if tag == _TAG_BEGINCONFS:
        block_len = r.i32()
        end = r.pos + block_len
        n_confs = r.i32()
        for c in range(n_confs):
            _is3d = r.u8()
            _conf_id = r.i32()
            n = idx()
            if n != num_atoms:
                raise ValueError("conformer atom count mismatch")
            xyz = r.f32s(3 * n).reshape(n, 3).astype(np.float64)
            if c == 0:
                pos = xyz
        if r.pos != end:
            raise ValueError("conformer block length mismatch")
        tag = r.u8()

    if tag != _TAG_ENDMOL:
        raise ValueError(f"expected ENDMOL, got tag {tag}")
    if not r.done():
        raise ValueError(f"{len(r.buf) - r.pos} trailing bytes")
    if pos is None:
        pos = np.zeros((num_atoms, 3))

    mol = Molecule(atomic_nums, pos, bonds, charges=charges,
                   aromatic=aromatic,
                   hybridization=[h or "sp3" for h in hybridization])
    # stash RDKit's own bookkeeping for validation / oracle tests
    mol.rdkit_rings = rings
    mol.rdkit_implicit_h = implicit_h
    mol.rdkit_total_h = total_h
    mol.rdkit_total_valence = total_valence
    return mol


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def load_rdkit_mol_pickle(path: str) -> List[Molecule]:
    """Load a pickle of RDKit Mol objects into framework Molecules."""
    with open(path, "rb") as f:
        shims = _RestrictedUnpickler(f).load()
    if isinstance(shims, _ShimMol):
        shims = [shims]
    out = []
    for k, s in enumerate(shims):
        if not isinstance(s, _ShimMol):
            raise ValueError(f"entry {k} is not an RDKit Mol")
        try:
            out.append(parse_mol_binary(s.binary))
        except ValueError as e:
            raise ValueError(f"molecule {k}: {e}") from e
    return out


def load_index_map(path: str) -> Dict[int, int]:
    """`data_id -> test-set index` join table (reference
    `data/index_map.txt`, consumed at evaluate_diffusion_sim.py:101-106)."""
    out: Dict[int, int] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            a, b = line.split(":")
            out[int(a)] = int(b)
    return out
