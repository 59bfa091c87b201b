"""Preprocessing pipelines: molecules -> featurized + shape-embedded packs.

Functional parity targets:
  * ShapeMolDataset._process_mose — datasets/shape_mol_dataset.py:72-125
    (Pool.imap RDKit parsing + batched shape-embedding precompute into LMDB)
  * ShapeDataset._process — datasets/shape_data.py:51-94 (stage-1 store)
  * get_shape_func — datasets/shape_mol_dataset.py:150-176

TPU-native layout: host workers do parsing/meshing/sampling; the frozen
stage-1 encoder runs as ONE jitted batched pass per chunk (replacing the
SubprocShapeAE subprocess pool); results land in dense .npz packs sharded
per host. For multi-host pods, run one preprocess per host over its shard of
the input (shard_index/num_shards)."""
from __future__ import annotations

import multiprocessing as mp

# fork() after JAX initialization deadlocks (JAX is multithreaded);
# spawn pays re-import cost but is safe - same choice the reference's
# SubprocShapeAE makes (utils/subproc_shapeAE.py forkserver/spawn)
_MP = mp.get_context("spawn")
import os
from typing import Callable, List, Optional, Sequence

import numpy as np

from shapemol_tpu.chem import vocab
from shapemol_tpu.chem.mol import Molecule, perceive_aromaticity, infer_hybridization
from shapemol_tpu.data.packs import MoleculeRecord, write_pack
from shapemol_tpu.geom import shape_emb as semb
from shapemol_tpu.chem.smiles import to_smiles


def featurize_molecule(mol: Molecule, atom_mode: str = "add_aromatic"
                       ) -> Optional[np.ndarray]:
    """Molecule -> per-atom class indices; None if outside the vocabulary."""
    if mol.aromatic is None:
        perceive_aromaticity(mol)
    if mol.hybridization is None:
        infer_hybridization(mol)
    try:
        return vocab.featurize(mol.atomic_nums, mol.aromatic,
                               mol.hybridization, atom_mode)
    except KeyError:
        return None


def _prep_one(args):
    mol, atom_mode, num_samples, seed = args
    try:
        v = featurize_molecule(mol, atom_mode)
        if v is None:
            return None
        cloud, center, bounds = semb.mol_surface_cloud(
            mol.atomic_nums, mol.pos, num_samples,
            rng=np.random.default_rng(seed))
        # positions shifted into the cloud-centered frame, like the
        # reference (shape embedding is computed on the centered cloud and
        # ligand coords are used relative to that center)
        pos = mol.pos - center
        return (pos.astype(np.float32), v, cloud.astype(np.float32),
                bounds.astype(np.float32), to_smiles(mol))
    except Exception:
        return None


def _batched_encode(encoder_fn: Callable, clouds: np.ndarray,
                    batch_size: int) -> np.ndarray:
    """Run the jitted encoder in FIXED-size batches (the tail is padded) so
    exactly one compilation serves the whole preprocess."""
    outs = []
    n = len(clouds)
    for s in range(0, n, batch_size):
        blk = clouds[s:s + batch_size]
        n_real = len(blk)
        if n_real < batch_size:
            blk = np.concatenate(
                [blk, np.repeat(blk[-1:], batch_size - n_real, axis=0)])
        outs.append(np.asarray(encoder_fn(blk))[:n_real])
    return np.concatenate(outs, axis=0)


def preprocess_molecules(mols: Sequence[Molecule], out_path: str,
                         encoder_fn: Optional[Callable] = None,
                         atom_mode: str = "add_aromatic",
                         point_cloud_samples: int = 512,
                         chunk_size: int = 2048,
                         encode_batch_size: int = 32,
                         num_workers: int = 0,
                         keep_cloud: bool = False,
                         n_max: int = 64,
                         shard_index: int = 0,
                         num_shards: int = 1,
                         seed: int = 0,
                         shape_mode: str = "pointAE") -> List[str]:
    """Full stage-2 preprocessing. Returns the list of written pack paths.

    encoder_fn: jitted stage-1 encoder — (B, P, 3) clouds -> (B, S, 3) for
    shape_mode='pointAE', or (B, G, G, G, 1) occupancy grids -> (B, z_dim)
    for shape_mode='voxelAE' (the reference's get_shape_func 'voxelAE_shape'
    branch, datasets/shape_mol_dataset.py:153-165). When None the shape_emb
    field is omitted (featurize-only mode)."""
    mols = list(mols)[shard_index::num_shards]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    paths: List[str] = []
    n_skipped = 0

    for c0 in range(0, len(mols), chunk_size):
        chunk = mols[c0:c0 + chunk_size]
        jobs = [(m, atom_mode, point_cloud_samples, seed + c0 + k)
                for k, m in enumerate(chunk)]
        if num_workers > 1:
            with _MP.Pool(num_workers) as pool:
                prepped = list(pool.imap(_prep_one, jobs, chunksize=16))
        else:
            prepped = [_prep_one(j) for j in jobs]
        good = [p for p in prepped if p is not None
                and len(p[1]) <= n_max]
        n_skipped += len(prepped) - len(good)
        if not good:
            continue

        latents = None
        if encoder_fn is not None:
            if shape_mode == "voxelAE":
                from shapemol_tpu.geom.voxel import get_voxel_shape
                from shapemol_tpu.chem import vocab as _vocab
                voxels = np.stack([
                    get_voxel_shape(_vocab.get_atomic_numbers(
                        g[1].tolist(), atom_mode), g[0])[..., None]
                    for g in good])
                latents = _batched_encode(encoder_fn, voxels,
                                          encode_batch_size)
            else:
                clouds = np.stack([g[2] for g in good])
                latents = _batched_encode(encoder_fn, clouds,
                                          encode_batch_size)

        records = []
        for k, (pos, v, cloud, bounds, smi) in enumerate(good):
            records.append(MoleculeRecord(
                pos=pos, v=v,
                shape_emb=None if latents is None else latents[k],
                bounds=bounds,
                cloud=cloud if keep_cloud else None,
                smiles=smi))
        shard_path = f"{out_path}.shard{shard_index:03d}_{c0 // chunk_size:05d}.npz"
        write_pack(shard_path, records, n_max=n_max)
        paths.append(shard_path)
    if n_skipped:
        print(f"preprocess: skipped {n_skipped} molecules "
              f"(parse/mesh/vocab failures)")
    return paths


def _prep_shape_one(args):
    mol, num_cloud, num_query, seed = args
    try:
        rng = np.random.default_rng(seed)
        cloud, center, bounds = semb.mol_surface_cloud(
            mol.atomic_nums, mol.pos, num_cloud, rng=rng)
        from shapemol_tpu.geom.surface import sample_sdf_points
        pts, sd = sample_sdf_points(mol.atomic_nums, mol.pos,
                                    cloud + center, num_query, rng=rng)
        return (cloud.astype(np.float32), (pts - center).astype(np.float32),
                sd.astype(np.float32))
    except Exception:
        return None


def preprocess_shape_dataset(mols: Sequence[Molecule], out_path: str,
                             point_cloud_samples: int = 512,
                             num_query: int = 1024,
                             chunk_size: int = 2048,
                             num_workers: int = 0,
                             shard_index: int = 0, num_shards: int = 1,
                             seed: int = 0) -> List[str]:
    """Stage-1 (shape AE) dataset: surface clouds + signed-distance query
    targets, stored as dense packs {point_cloud, query_points, values}."""
    mols = list(mols)[shard_index::num_shards]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    paths: List[str] = []
    for c0 in range(0, len(mols), chunk_size):
        chunk = mols[c0:c0 + chunk_size]
        jobs = [(m, point_cloud_samples, num_query, seed + c0 + k)
                for k, m in enumerate(chunk)]
        if num_workers > 1:
            with _MP.Pool(num_workers) as pool:
                prepped = list(pool.imap(_prep_shape_one, jobs, chunksize=8))
        else:
            prepped = [_prep_shape_one(j) for j in jobs]
        good = [p for p in prepped if p is not None]
        if not good:
            continue
        arrays = {
            "point_cloud": np.stack([g[0] for g in good]),
            "query_points": np.stack([g[1] for g in good]),
            "values": np.stack([g[2] for g in good]),
        }
        shard_path = f"{out_path}.shard{shard_index:03d}_{c0 // chunk_size:05d}.npz"
        np.savez_compressed(shard_path, **arrays)
        paths.append(shard_path)
    return paths


class ShapePackDataset:
    """Reader for stage-1 packs.

    Members are decompressed ONCE per shard and kept as plain arrays — npz
    members are zip-compressed, and indexing an NpzFile decompresses the
    whole member on every access (the same host bottleneck PackDataset
    fixed; at ~6 MB/member that made batch assembly dominate the TPU train
    step)."""

    def __init__(self, pattern: str):
        import glob
        self.paths = sorted(glob.glob(pattern)) if "*" in pattern else [pattern]
        if not self.paths:
            raise FileNotFoundError(pattern)
        self._shards = []
        for p in self.paths:
            with np.load(p) as z:
                self._shards.append({k: z[k] for k in
                                     ("point_cloud", "query_points",
                                      "values")})
        self._sizes = [s["point_cloud"].shape[0] for s in self._shards]
        self._offsets = np.cumsum([0] + self._sizes)

    def __len__(self):
        return int(self._offsets[-1])

    def batch(self, indices, point_batch_size: Optional[int] = None,
              rng: Optional[np.random.Generator] = None):
        items = []
        for idx in indices:
            shard = int(np.searchsorted(self._offsets, idx, "right") - 1)
            local = int(idx - self._offsets[shard])
            s = self._shards[shard]
            items.append({k: s[k][local] for k in
                          ("point_cloud", "query_points", "values")})
        out = {k: np.stack([it[k] for it in items]) for k in items[0]}
        if point_batch_size is not None:
            rng = rng or np.random.default_rng()
            sel = rng.choice(out["query_points"].shape[1], point_batch_size,
                             replace=False)
            out["query_points"] = out["query_points"][:, sel]
            out["values"] = out["values"][:, sel]
        return out


# ---------------------------------------------------------------------------
# Voxel shape-AE dataset (reference: shape_type 'voxel' in
# datasets/shape_data.py:121-122,189-202 feeding IM_AE)
# ---------------------------------------------------------------------------


def _prep_voxel_one(args):
    mol, grid_resolution, max_dist = args
    try:
        from shapemol_tpu.geom.voxel import get_voxel_shape
        pos = mol.pos - mol.pos.mean(axis=0)
        vox = get_voxel_shape(mol.atomic_nums, pos, grid_resolution,
                              max_dist)
        return vox.astype(np.uint8)
    except Exception:
        return None


def preprocess_voxel_dataset(mols: Sequence[Molecule], out_path: str,
                             grid_resolution: float = 0.5,
                             max_dist: float = 11.0,
                             chunk_size: int = 512,
                             num_workers: int = 0,
                             shard_index: int = 0, num_shards: int = 1
                             ) -> List[str]:
    """Voxel-AE dataset: binary occupancy grids, stored as packed uint8.
    Query points are sampled per batch at train time
    (geom.voxel.sample_grids_for_voxel), like the reference's collate."""
    mols = list(mols)[shard_index::num_shards]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    paths: List[str] = []
    for c0 in range(0, len(mols), chunk_size):
        chunk = mols[c0:c0 + chunk_size]
        jobs = [(m, grid_resolution, max_dist) for m in chunk]
        if num_workers > 1:
            with _MP.Pool(num_workers) as pool:
                prepped = list(pool.imap(_prep_voxel_one, jobs, chunksize=8))
        else:
            prepped = [_prep_voxel_one(j) for j in jobs]
        good = [p for p in prepped if p is not None]
        if not good:
            continue
        shard_path = (f"{out_path}.shard{shard_index:03d}_"
                      f"{c0 // chunk_size:05d}.npz")
        np.savez_compressed(shard_path, voxel=np.stack(good),
                            grid_resolution=grid_resolution,
                            max_dist=max_dist)
        paths.append(shard_path)
    return paths


class VoxelPackDataset:
    """Reader for voxel packs; batches sample fresh query points."""

    def __init__(self, pattern: str):
        import glob
        self.paths = (sorted(glob.glob(pattern)) if "*" in pattern
                      else [pattern])
        if not self.paths:
            raise FileNotFoundError(pattern)
        # decompress once per shard (uint8 grids; npz member indexing
        # re-decompresses the whole member on every access)
        self._shards = []
        for p in self.paths:
            with np.load(p) as z:
                self._shards.append({"voxel": z["voxel"]})
        self._sizes = [s["voxel"].shape[0] for s in self._shards]
        self._offsets = np.cumsum([0] + self._sizes)
        self.grid_size = int(self._shards[0]["voxel"].shape[1])

    def __len__(self):
        return int(self._offsets[-1])

    def batch(self, indices, num_samples: int = 1024,
              rng: Optional[np.random.Generator] = None):
        from shapemol_tpu.geom.voxel import sample_grids_for_voxel
        rng = rng or np.random.default_rng()
        voxels, points, values = [], [], []
        for idx in indices:
            shard = int(np.searchsorted(self._offsets, idx, "right") - 1)
            local = int(idx - self._offsets[shard])
            vox = self._shards[shard]["voxel"][local].astype(np.float32)
            pts, vals = sample_grids_for_voxel(vox, num_samples, rng)
            voxels.append(vox[..., None])       # channel dim
            points.append(pts)
            values.append(vals)
        return {"voxel": np.stack(voxels), "points": np.stack(points),
                "values": np.stack(values)}
