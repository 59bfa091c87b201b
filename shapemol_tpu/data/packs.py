"""Packed-array molecule storage — the TPU-native replacement for the
reference's LMDB pickled-PyG-dict store (datasets/shape_mol_dataset.py:41-53,
datasets/shape_data.py:32-45).

A "pack" is one .npz shard holding padded dense arrays for many molecules:
  pos        (M, N_max, 3) float32
  v          (M, N_max)    int32    featurized atom-type indices
  node_mask  (M, N_max)    bool
  shape_emb  (M, S, 3)     float32  (optional)
  bounds     (M, 3, 2)     float32  (optional)
  cloud      (M, P, 3)     float32  (optional, for guidance)
  smiles     (M,)          str      (optional, provenance)
Shards are written per host in multi-host preprocessing; readers mmap lazily.
This keeps the storage layout identical to the compute layout — a batch is a
slice, no per-item unpickling or collation."""
from __future__ import annotations

import dataclasses
import glob
from typing import Dict, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class MoleculeRecord:
    pos: np.ndarray                      # (n, 3)
    v: np.ndarray                        # (n,) featurized indices
    shape_emb: Optional[np.ndarray] = None      # (S, 3)
    bounds: Optional[np.ndarray] = None         # (3, 2)
    cloud: Optional[np.ndarray] = None          # (P, 3)
    smiles: str = ""


def write_pack(path: str, records: Sequence[MoleculeRecord],
               n_max: Optional[int] = None) -> None:
    if not records:
        raise ValueError("no records")
    n_max = n_max or max(len(r.v) for r in records)
    M = len(records)
    pos = np.zeros((M, n_max, 3), np.float32)
    v = np.zeros((M, n_max), np.int32)
    mask = np.zeros((M, n_max), bool)
    arrays: Dict[str, np.ndarray] = {"pos": pos, "v": v, "node_mask": mask}
    has_shape = records[0].shape_emb is not None
    has_bounds = records[0].bounds is not None
    has_cloud = records[0].cloud is not None
    if has_shape:
        # (S, 3) vector latents from the point AE, or (z_dim,) invariant
        # latents from the voxel AE — stored verbatim
        arrays["shape_emb"] = np.zeros(
            (M,) + tuple(records[0].shape_emb.shape), np.float32)
    if has_bounds:
        arrays["bounds"] = np.zeros((M, 3, 2), np.float32)
    if has_cloud:
        P = records[0].cloud.shape[0]
        arrays["cloud"] = np.zeros((M, P, 3), np.float32)
    smiles = []
    for k, r in enumerate(records):
        n = len(r.v)
        if n > n_max:
            raise ValueError(f"molecule with {n} atoms > n_max {n_max}")
        pos[k, :n] = r.pos
        v[k, :n] = r.v
        mask[k, :n] = True
        if has_shape:
            arrays["shape_emb"][k] = r.shape_emb
        if has_bounds:
            arrays["bounds"][k] = r.bounds
        if has_cloud:
            arrays["cloud"][k] = r.cloud
        smiles.append(r.smiles)
    arrays["smiles"] = np.asarray(smiles)
    np.savez_compressed(path, **arrays)


class PackDataset:
    """Collection of pack shards with per-key decompressed caching.

    npz members are zip-compressed; indexing an NpzFile decompresses the
    WHOLE member every time, which made per-item access dominate training.
    Each (shard, key) array is decompressed once on first touch and kept as
    a plain ndarray (the dense layout is the working set anyway)."""

    def __init__(self, pattern: str):
        # comma-separated patterns train on multiple corpora at once
        # (e.g. the real pack + a self-distillation pack); shards must
        # share one schema/n_max
        paths: List[str] = []
        for part in [p.strip() for p in pattern.split(",") if p.strip()]:
            paths += glob.glob(part) if "*" in part else [part]
        self.paths = sorted(set(paths))
        if not self.paths:
            raise FileNotFoundError(pattern)
        self._shards = [np.load(p, allow_pickle=False) for p in self.paths]
        self._cache: List[Dict[str, np.ndarray]] = [{} for _ in self._shards]
        self._sizes = [self._arr(i, "pos").shape[0]
                       for i in range(len(self._shards))]
        self._offsets = np.cumsum([0] + self._sizes)
        # a glob that accidentally sweeps up re-encoded variants of the
        # same pack (e.g. *_voxel / *_dual next to the base shards) would
        # duplicate molecules and mix conditioning widths — fail loudly
        if len(self._shards) > 1 and "shape_emb" in self._shards[0]:
            widths = {self._arr(i, "shape_emb").shape[1:]
                      for i in range(len(self._shards))}
            if len(widths) > 1:
                raise ValueError(
                    f"pack shards disagree on shape_emb dims {widths} — "
                    f"the pattern {pattern!r} likely matches re-encoded "
                    f"variants of the same pack: {self.paths}")

    def _arr(self, shard: int, key: str) -> np.ndarray:
        cache = self._cache[shard]
        if key not in cache:
            cache[key] = np.asarray(self._shards[shard][key])
        return cache[key]

    def __len__(self) -> int:
        return int(self._offsets[-1])

    @property
    def n_max(self) -> int:
        return max(self._arr(i, "pos").shape[1]
                   for i in range(len(self._shards)))

    def keys(self) -> List[str]:
        return [k for k in self._shards[0].files if k != "smiles"]

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        shard = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        local = idx - self._offsets[shard]
        return {k: self._arr(shard, k)[local] for k in self.keys()}

    def gather(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        items = [self[int(i)] for i in indices]
        return {k: np.stack([it[k] for it in items]) for k in items[0]}

    def num_atoms(self) -> np.ndarray:
        return np.concatenate([self._arr(i, "node_mask").sum(axis=1)
                               for i in range(len(self._shards))]
                              ).astype(np.int64)

    def indices_from(self, substring: str) -> np.ndarray:
        """Dataset indices whose shard path contains `substring`.

        Lets callers tell corpora apart when the pattern globs several
        packs together (e.g. the real training pack vs a self-distillation
        pack) — used for importance-weighted corpus mixing."""
        out = []
        for i, p in enumerate(self.paths):
            if substring in p:
                out.append(np.arange(self._offsets[i], self._offsets[i + 1]))
        return (np.concatenate(out) if out
                else np.zeros((0,), dtype=np.int64))
