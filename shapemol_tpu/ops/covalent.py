"""Covalent-radius graph construction on-device.

Functional parity target: utils/covalent_graph.py:7-19 (edges where pairwise
distance < r_cov(i) + r_cov(j) + 0.2, radii from OpenBabel) and the
denoiser's cutoff_mode='cov_radius' path (uni_transformer.py:449-473).

Dense formulation: per-atom covalent radii come from a class-index lookup
table baked per atom vocabulary; the ragged edge list becomes a fixed-width
(B, N, K_cov) neighbor tensor (nearest covalent partners, masked)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from shapemol_tpu.chem import periodic as pt
from shapemol_tpu.chem import vocab
from shapemol_tpu.ops.knn import pairwise_sqdist

Array = jax.Array
_BIG = 1e10
COV_MARGIN = 0.2


def class_covalent_radii(atom_mode: str = "add_aromatic") -> np.ndarray:
    """(num_classes,) covalent radius per atom-type class index."""
    K = vocab.feature_dim(atom_mode)
    zs = vocab.get_atomic_numbers(list(range(K)), atom_mode)
    return np.array([pt.covalent_radius(z) for z in zs], dtype=np.float32)


def covalent_knn(pos: Array, v: Array, node_mask: Array, radii_table: Array,
                 k: int = 6):
    """Nearest covalent partners of each atom.

    pos (B,N,3); v (B,N) class indices; radii_table (num_classes,).
    Returns (idx (B,N,K), nbr_mask (B,N,K)): neighbor j is valid when
    dist(i,j) < r_cov(i) + r_cov(j) + 0.2 and both atoms are real."""
    B, N, _ = pos.shape
    r = radii_table[v]                                  # (B,N)
    thresh = r[:, :, None] + r[:, None, :] + COV_MARGIN
    d2 = pairwise_sqdist(pos)
    eye = jnp.eye(N, dtype=bool)[None]
    invalid = (~node_mask[:, None, :]) | (~node_mask[:, :, None]) | eye
    covalent = (d2 < thresh * thresh) & (~invalid)
    d2 = jnp.where(covalent, d2, _BIG)
    neg, idx = jax.lax.top_k(-d2, k)
    return idx.astype(jnp.int32), neg > -_BIG / 2
