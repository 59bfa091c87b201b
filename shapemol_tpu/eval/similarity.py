"""2D and 3D molecular similarity.

Functional parity targets:
  * tanimoto_sim / tanimoto_sim_N_pairwise — utils/evaluation/similarity.py:8-31
    (RDKit topological fingerprints -> here: hashed ECFP-style circular
    fingerprints over the framework's own graph; Tanimoto semantics intact)
  * analytic first-order Gaussian shape overlap (ROCS) —
    utils/evaluation/shaep_utils.py:59-83 (prefactor 0.8, alpha 0.81)
  * ShaEP alignment — shaep_utils.py:37-57 shells out to an external C++
    binary; the TPU-native replacement `align_by_overlap` maximizes the
    Gaussian overlap directly: PCA initialization x 4 axis flips + gradient
    refinement of a quaternion, all under jit. The external-binary adapter
    is kept in eval/shaep_adapter.py for users who have ShaEP installed.
"""
from __future__ import annotations

from typing import Sequence, Set, Tuple

import numpy as np

from shapemol_tpu.chem.mol import Molecule

# --------------------------------------------------------------------------
# Circular (Morgan/ECFP-style) fingerprints + Tanimoto
# --------------------------------------------------------------------------


def morgan_fingerprint(mol: Molecule, radius: int = 2,
                       n_bits: int = 2048) -> Set[int]:
    """Hashed circular substructure identifiers up to `radius` bond hops."""
    adj = mol.neighbors()
    orders = mol.bond_dict()
    arom = mol.aromatic if mol.aromatic is not None \
        else np.zeros(mol.num_atoms, bool)
    # initial atom invariants
    ids = [hash((int(mol.atomic_nums[a]), len(adj[a]),
                 int(mol.charges[a]), bool(arom[a]))) & 0xFFFFFFFF
           for a in range(mol.num_atoms)]
    bits: Set[int] = set(i % n_bits for i in ids)
    for _ in range(radius):
        new_ids = []
        for a in range(mol.num_atoms):
            env = sorted((orders[(min(a, b), max(a, b))], ids[b])
                         for b in adj[a])
            h = hash((ids[a], tuple(env))) & 0xFFFFFFFF
            new_ids.append(h)
            bits.add(h % n_bits)
        ids = new_ids
    return bits


def tanimoto_sim(mol_a: Molecule, mol_b: Molecule) -> float:
    fa, fb = morgan_fingerprint(mol_a), morgan_fingerprint(mol_b)
    union = len(fa | fb)
    return len(fa & fb) / union if union else 0.0


def tanimoto_sim_pairwise(mols: Sequence[Molecule]) -> np.ndarray:
    """Full pairwise similarity matrix (diagonal = 1)."""
    fps = [morgan_fingerprint(m) for m in mols]
    n = len(fps)
    out = np.eye(n)
    for i in range(n):
        for j in range(i + 1, n):
            union = len(fps[i] | fps[j])
            s = len(fps[i] & fps[j]) / union if union else 0.0
            out[i, j] = out[j, i] = s
    return out


def average_pairwise_diversity(mols: Sequence[Molecule]) -> float:
    """Mean off-diagonal pairwise Tanimoto (the reference reports the mean
    pairwise similarity of each target's samples)."""
    if len(mols) < 2:
        return 0.0
    m = tanimoto_sim_pairwise(mols)
    n = len(mols)
    return float((m.sum() - n) / (n * (n - 1)))


# --------------------------------------------------------------------------
# Analytic Gaussian-overlap shape similarity (ROCS)
# --------------------------------------------------------------------------

def gaussian_overlap(centers_1: np.ndarray, centers_2: np.ndarray,
                     alpha: float = 0.81, prefactor: float = 0.8) -> float:
    """V_AB = sum_ij pi^1.5 p_i p_j exp(-a_i a_j/(a_i+a_j) r_ij^2) /
    (a_i+a_j)^1.5 with uniform alphas/prefactors."""
    r2 = np.sum((centers_1[:, None, :] - centers_2[None, :, :]) ** 2, -1)
    aa = alpha * alpha / (alpha + alpha)
    return float(np.sum(np.pi ** 1.5 * prefactor * prefactor
                        * np.exp(-aa * r2) / (alpha + alpha) ** 1.5))


def shape_tanimoto(centers_1: np.ndarray, centers_2: np.ndarray,
                   alpha: float = 0.81, prefactor: float = 0.8) -> float:
    vaa = gaussian_overlap(centers_1, centers_1, alpha, prefactor)
    vbb = gaussian_overlap(centers_2, centers_2, alpha, prefactor)
    vab = gaussian_overlap(centers_1, centers_2, alpha, prefactor)
    return vab / (vaa + vbb - vab)


def get_rocs(centers_1: np.ndarray, centers_2: np.ndarray,
             prefactor: float = 0.8, alpha: float = 0.81) -> float:
    """Shape Tanimoto of two heavy-atom point sets (reference get_ROCS)."""
    return shape_tanimoto(np.asarray(centers_1, dtype=np.float64),
                          np.asarray(centers_2, dtype=np.float64),
                          alpha, prefactor)


# --------------------------------------------------------------------------
# Overlap-maximizing alignment (ShaEP replacement)
# --------------------------------------------------------------------------

def _principal_frame(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    c = x.mean(axis=0)
    xc = x - c
    # full_matrices=True keeps vt square (3,3) even for degenerate inputs
    # with fewer than 3 points
    _, _, vt = np.linalg.svd(xc, full_matrices=True)
    r = vt.T
    if np.linalg.det(r) < 0:
        r[:, -1] = -r[:, -1]
    return c, r


_FLIPS = [np.diag(f) for f in
          ((1, 1, 1), (1, -1, -1), (-1, 1, -1), (-1, -1, 1))]


def align_by_overlap(ref: np.ndarray, query: np.ndarray,
                     refine_steps: int = 60, lr: float = 0.05
                     ) -> Tuple[np.ndarray, float]:
    """Rigidly align `query` onto `ref` to maximize Gaussian shape overlap.

    PCA frames give 4 proper-rotation hypotheses (axis flips); the best is
    refined by gradient ascent on a quaternion + translation (numpy/JAX-free
    implementation using finite analytic gradients via JAX when available).
    Returns (aligned query coords, shape tanimoto after alignment)."""
    ref = np.asarray(ref, dtype=np.float64)
    query = np.asarray(query, dtype=np.float64)
    c_r, R_r = _principal_frame(ref)
    c_q, R_q = _principal_frame(query)

    best, best_t = None, -1.0
    for flip in _FLIPS:
        R = R_r @ flip @ R_q.T
        cand = (query - c_q) @ R.T + c_r
        t = shape_tanimoto(cand, ref)
        if t > best_t:
            best_t, best = t, cand

    # closed-form numpy gradient refinement. (The former JAX version
    # re-jitted per (n_ref, n_query) shape pair inside every eval worker —
    # hundreds of CPU compiles made the 5000-sample eval crawl; the
    # analytic gradient below is exact and compile-free.)
    refined, t_ref = _refine_overlap_numpy(ref, best, refine_steps, lr)
    if t_ref > best_t:
        return refined, t_ref
    return best, best_t


def _quat_rot(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def _d_quat_rot(q: np.ndarray):
    """dR/dq_k for the UNNORMALIZED quaternion entries of _quat_rot's
    normalized form, via chain rule through u = q/|q|."""
    n = np.linalg.norm(q)
    u = q / n
    w, x, y, z = u
    dR_du = np.array([
        # dR/dw
        [[0, -2 * z, 2 * y], [2 * z, 0, -2 * x], [-2 * y, 2 * x, 0]],
        # dR/dx
        [[0, 2 * y, 2 * z], [2 * y, -4 * x, -2 * w], [2 * z, 2 * w, -4 * x]],
        # dR/dy
        [[-4 * y, 2 * x, 2 * w], [2 * x, 0, 2 * z], [-2 * w, 2 * z, -4 * y]],
        # dR/dz
        [[-4 * z, -2 * w, 2 * x], [2 * w, -4 * z, 2 * y], [2 * x, 2 * y, 0]],
    ])
    # du_j/dq_k = (delta_jk - u_j u_k) / n
    J = (np.eye(4) - np.outer(u, u)) / n           # (4, 4): rows j, cols k
    # dR/dq_k = sum_j dR/du_j * du_j/dq_k
    return np.einsum("jab,jk->kab", dR_du, J)


def _refine_overlap_numpy(ref: np.ndarray, q0: np.ndarray,
                          steps: int, lr: float):
    """Gradient ascent on Gaussian overlap over (quaternion, translation)."""
    a = 0.81
    cen = q0.mean(axis=0)
    p0 = q0 - cen
    params = np.array([1.0, 0, 0, 0, 0, 0, 0])
    for _ in range(steps):
        q, t = params[:4], params[4:]
        R = _quat_rot(q)
        pts = p0 @ R.T + cen + t
        diff = pts[:, None] - ref[None]            # (N, M, 3)
        e = np.exp(-(a / 2) * np.sum(diff * diff, -1))
        g_pts = -a * np.einsum("nm,nmc->nc", e, diff)   # d(vab)/d(pts)
        g_t = g_pts.sum(axis=0)
        dR = _d_quat_rot(q)                        # (4, 3, 3)
        g_q = np.einsum("nc,kcd,nd->k", g_pts, dR, p0)
        grad = np.concatenate([g_q, g_t])          # ascent direction
        params = params + lr * grad
    R = _quat_rot(params[:4])
    refined = p0 @ R.T + cen + params[4:]
    return refined, shape_tanimoto(refined, ref)


def aligned_rocs(ref: np.ndarray, query: np.ndarray) -> float:
    """Align then score — the calculate_shaep_shape_sim equivalent
    (utils/evaluation/similarity.py:33-45) without the external binary."""
    _, t = align_by_overlap(ref, query)
    return t
