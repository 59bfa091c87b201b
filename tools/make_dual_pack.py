"""Merge two shape-conditioning packs into a dual-conditioned pack.

Round-3 finding (STATUS): voxel latents give the strongest shape adherence
(ROCS 0.733) while pointAE latents give the strongest chemical stability
(mol_stable 0.861). Both are (32, 3) vector codes over the SAME molecules,
so concatenating them along the channel axis yields a (64, 3) dual code
the denoiser consumes unchanged with `shape_dim: 64` (the invariant and
VN shape layers are channel-count-generic — models/denoiser.py:110-140).
A capability the reference lacks: its shape_type is single-source
(datasets/shape_mol_dataset.py:150-176).

Usage:
  python tools/make_dual_pack.py processed_data/moses2_train_v1.shard000_00000
  (expects <base>.npz and <base>_voxel.npz; writes <base>_dual.npz)
"""
from __future__ import annotations

import sys

import numpy as np


def merge(base: str) -> str:
    a = dict(np.load(base + ".npz", allow_pickle=True))
    b = dict(np.load(base + "_voxel.npz", allow_pickle=True))
    assert (a["smiles"] == b["smiles"]).all(), "pack order mismatch"
    assert a["shape_emb"].ndim == 3 and b["shape_emb"].ndim == 3
    a["shape_emb"] = np.concatenate([a["shape_emb"], b["shape_emb"]],
                                    axis=1).astype(np.float32)
    out = base + "_dual.npz"
    np.savez_compressed(out, **a)
    print(f"wrote {out}: shape_emb {a['shape_emb'].shape}")
    return out


if __name__ == "__main__":
    for base in sys.argv[1:]:
        merge(base.removesuffix(".npz"))
