"""Voxelized molecular shapes (host side).

Functional parity targets:
  * get_atom_stamp / get_voxel_shape — utils/shape.py:57-146 (paint vdW
    spheres onto a regular grid, binarize)
  * make_grid — utils/tfbio_data.py:464-540 (coords -> grid cells)
  * the voxel COUNT keys the atom-number prior at sampling time
    (scripts/sample_diffusion.py:28-31, ±200 window)

Implemented as one vectorized distance-test per atom instead of stamp
painting — identical result (a voxel is set iff it lies within some atom's
vdW sphere), no per-voxel Python loops."""
from __future__ import annotations

import numpy as np

from shapemol_tpu.chem import periodic as pt


def get_voxel_shape(atomic_nums: np.ndarray, pos: np.ndarray,
                    grid_resolution: float = 0.5, max_dist: float = 11.0
                    ) -> np.ndarray:
    """Binary occupancy grid: voxel centers within a vdW radius of any atom.

    The grid spans [-max_dist, max_dist]^3 around the molecule's centroid
    frame (atoms are assumed roughly centered, as in the reference where
    coords come re-centered from preprocessing)."""
    n_cells = int(2 * max_dist // grid_resolution + 1)
    axes = -max_dist + grid_resolution * np.arange(n_cells)
    gx, gy, gz = np.meshgrid(axes, axes, axes, indexing="ij")
    centers = np.stack([gx, gy, gz], axis=-1)          # (G,G,G,3)

    occ = np.zeros(centers.shape[:3], dtype=bool)
    for k in range(len(pos)):
        z = int(atomic_nums[k])
        if z == 1:
            continue                                    # heavy atoms only
        r = pt.vdw_radius_by_z(z)
        d2 = np.sum((centers - pos[k]) ** 2, axis=-1)
        occ |= d2 <= r * r
    return occ.astype(np.float32)


def voxel_count(atomic_nums: np.ndarray, pos: np.ndarray,
                grid_resolution: float = 0.5, max_dist: float = 11.0) -> int:
    """Number of occupied voxels — the key into the atom-count prior."""
    pos = pos - pos.mean(axis=0)
    return int(get_voxel_shape(atomic_nums, pos, grid_resolution,
                               max_dist).sum())


def make_grid(coords: np.ndarray, max_dist: float = 11.0,
              grid_resolution: float = 0.5) -> np.ndarray:
    """World coordinates -> integer grid indices
    (utils/shape.py:148-151 get_grid_coords)."""
    g = (coords + max_dist) / grid_resolution
    return np.round(g).astype(int)


def sample_grids_for_voxel(voxel: np.ndarray, num_samples: int,
                           rng: np.random.Generator):
    """Query-point sampling for voxel-AE training (reference
    datasets/shape_data.py:189-202): half uniform-random grid cells, half
    drawn from the occupied cells, values = occupancy at those cells.

    Returns (points (T, 3) float32 grid coordinates, values (T,) float32)."""
    g = voxel.shape[0]
    n_rand = num_samples // 2
    n_occ = num_samples - n_rand
    rand_pts = rng.integers(0, g, (n_rand, 3))
    rand_vals = voxel[rand_pts[:, 0], rand_pts[:, 1], rand_pts[:, 2]]
    occ_cells = np.argwhere(voxel > 0)
    if len(occ_cells) == 0:                     # degenerate empty grid
        occ_pts = rng.integers(0, g, (n_occ, 3))
        occ_vals = voxel[occ_pts[:, 0], occ_pts[:, 1], occ_pts[:, 2]]
    else:
        occ_pts = occ_cells[rng.integers(0, len(occ_cells), n_occ)]
        occ_vals = np.ones(n_occ, dtype=voxel.dtype)
    points = np.concatenate([rand_pts, occ_pts]).astype(np.float32)
    values = np.concatenate([rand_vals, occ_vals]).astype(np.float32)
    return points, values
