"""Shape-embedding pipeline: molecule -> surface mesh -> point cloud ->
frozen stage-1 encoder -> (latent, bounds, cloud, center).

Functional parity target: get_pointAE_shape_emb (utils/shape.py:240-284) and
get_electro_shape_emb (utils/shape.py:287-298). The SubprocShapeAE worker
pool (utils/subproc_shapeAE.py) is replaced by one jit-compiled batched
encoder pass on the accelerator — no subprocess RPC needed.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from shapemol_tpu.geom import surface as srf


@dataclasses.dataclass
class ShapeEmbedding:
    latent: np.ndarray        # (S, 3) equivariant latent
    bounds: np.ndarray        # (3, 2) mesh bounding box, centered
    cloud: np.ndarray         # (P, 3) centered surface cloud
    center: np.ndarray        # (3,) original cloud centroid


def mol_surface_cloud(atomic_nums: np.ndarray, pos: np.ndarray,
                      num_samples: int = 512, probe_radius: float = 1.4,
                      spacing: float = 0.5,
                      rng: Optional[np.random.Generator] = None
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (centered cloud (P,3), center (3,), bounds (3,2))."""
    verts, faces = srf.get_mesh(atomic_nums, pos, probe_radius, spacing)
    if len(faces) == 0:
        raise ValueError("empty surface mesh")
    cloud = srf.sample_points_from_mesh(verts, faces, num_samples, rng)
    center = cloud.mean(axis=0)
    return cloud - center, center, srf.mesh_bounds(verts, center)


def batch_encode_shapes(encoder_fn: Callable, mols: Sequence,
                        num_samples: int = 512, batch_size: int = 32,
                        probe_radius: float = 1.4,
                        rng: Optional[np.random.Generator] = None
                        ) -> List[Optional[ShapeEmbedding]]:
    """Embed many molecules: host meshing/sampling feeds device encoding in
    batches. `encoder_fn(clouds (B,P,3)) -> (B,S,3)` should be a jitted
    encoder (e.g. PointCloudAE.encode bound to trained params).
    Failed molecules yield None (skip-and-count, like the reference's
    preprocessing loop)."""
    rng = rng or np.random.default_rng(0)
    prepared: List[Optional[Tuple]] = []
    for mol in mols:
        try:
            prepared.append(mol_surface_cloud(mol.atomic_nums, mol.pos,
                                              num_samples, probe_radius,
                                              rng=rng))
        except Exception:
            prepared.append(None)

    out: List[Optional[ShapeEmbedding]] = [None] * len(mols)
    good = [i for i, p in enumerate(prepared) if p is not None]
    for s in range(0, len(good), batch_size):
        idxs = good[s:s + batch_size]
        clouds = np.stack([prepared[i][0] for i in idxs]).astype(np.float32)
        latents = np.asarray(encoder_fn(clouds))
        for k, i in enumerate(idxs):
            cloud, center, bounds = prepared[i]
            out[i] = ShapeEmbedding(latent=latents[k], bounds=bounds,
                                    cloud=cloud, center=center)
    return out


def make_encoder_fn(model, variables):
    """Bind a PointCloudAE to its (frozen) params as a jitted encoder fn."""
    import jax

    @jax.jit
    def encode(clouds):
        return model.apply(variables, clouds, method=model.encode)
    return encode


def electroshape(pos: np.ndarray, charges: Optional[np.ndarray] = None,
                 charge_scale: float = 25.0) -> np.ndarray:
    """ElectroShape descriptor (Armstrong et al. 2010): 4D points
    (x, y, z, scaled charge); distances to 5 reference points (centroid,
    closest/farthest atom to centroid, and two charge-displaced points);
    first three moments (mean, std, cbrt skew) of each distance set -> 15-dim
    invariant vector. Parity target: oddt.shape.electroshape via
    get_electro_shape_emb (utils/shape.py:287-298); charges default to zero
    when no charge model is available."""
    n = len(pos)
    q = np.zeros(n) if charges is None else np.asarray(charges)
    pts = np.concatenate([pos, (charge_scale * q)[:, None]], axis=1)

    c1 = pts.mean(axis=0)
    d1 = np.linalg.norm(pts - c1, axis=1)
    c2 = pts[np.argmax(d1)]                       # farthest from centroid
    d2 = np.linalg.norm(pts - c2, axis=1)
    c3 = pts[np.argmax(d2)]                       # farthest from c2
    a = c2 - c1
    b_ = c3 - c1
    cross = np.cross(a[:3], b_[:3])
    nrm = np.linalg.norm(cross)
    if nrm < 1e-9:
        c4 = c1 + np.array([0, 0, 0, max(np.abs(q).max() * charge_scale, 1.0)])
        c5 = c1 - (c4 - c1)
    else:
        disp = np.linalg.norm(a) / 2.0 * cross / nrm
        c4 = c1 + np.concatenate([disp, [np.abs(q * charge_scale).max()]])
        c5 = c1 + np.concatenate([disp, [-np.abs(q * charge_scale).max()]])

    feats = []
    for c in (c1, c2, c3, c4, c5):
        d = np.linalg.norm(pts - c, axis=1)
        mean = d.mean()
        std = d.std()
        skew = np.cbrt(np.mean((d - mean) ** 3))
        feats.extend([mean, std, skew])
    return np.asarray(feats, dtype=np.float32)


def sdf_grid_for_guidance(atomic_nums: np.ndarray, pos: np.ndarray,
                          spacing: float = 0.5, padding: float = 4.0,
                          probe_radius: float = 1.4, size: int = 64
                          ) -> Tuple[np.ndarray, np.ndarray, float]:
    """Fixed-size signed-distance grid for the on-device mesh guidance
    (sample/sampler.py mesh_sdf_guidance). Returns (grid (G,G,G),
    origin (3,), spacing)."""
    center = pos.mean(axis=0)
    half = size * spacing / 2
    origin = center - half
    axes = [origin[k] + spacing * np.arange(size) for k in range(3)]
    pts = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    f = srf.mol_field(atomic_nums, pos, probe_radius)
    grid = f(pts).reshape(size, size, size).astype(np.float32)
    return grid, origin.astype(np.float32), spacing
