"""Masked k-nearest-neighbor graph construction for padded molecule batches.

TPU-native replacement for torch_cluster.knn_graph (used per denoiser block in
the reference, models/uni_transformer.py:466-468): instead of ragged edge
lists we produce fixed-shape (B, N, K) neighbor-index tensors plus a validity
mask. All downstream message passing is permutation-invariant (masked softmax
+ masked sum), so the edge *ordering* difference vs torch_cluster is
irrelevant; the neighbor *sets* are identical for distinct distances.

Self-loops are excluded (torch_cluster default loop=False). Molecules with
fewer than k+1 atoms get fewer valid neighbors, flagged by nbr_mask — the
masked softmax then matches the reference's ragged behavior exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_BIG = 1e10


def pairwise_sqdist(pos: Array) -> Array:
    """(B, N, 3) -> (B, N, N) squared Euclidean distances (one matmul)."""
    inner = jnp.einsum("bnd,bmd->bnm", pos, pos,
                       preferred_element_type=jnp.float32)
    sq = jnp.sum(pos * pos, axis=-1)
    d2 = sq[:, :, None] - 2 * inner + sq[:, None, :]
    return jnp.maximum(d2, 0.0)


def masked_knn(pos: Array, mask: Array, k: int) -> tuple[Array, Array]:
    """k nearest *valid* neighbors of each node, excluding self.

    pos:  (B, N, 3) positions (padded entries arbitrary)
    mask: (B, N) bool, True = real atom
    Returns (idx, nbr_mask): idx (B, N, K) int32 neighbor indices (source j
    for destination i), nbr_mask (B, N, K) bool validity.
    """
    idx, nbr_mask, _ = masked_knn_d(pos, mask, k)
    return idx, nbr_mask


def masked_knn_d(pos: Array, mask: Array, k: int
                 ) -> tuple[Array, Array, Array]:
    """masked_knn that ALSO returns the neighbor distances for free.

    Each argmin round's `dmin` IS the selected neighbor's squared distance,
    so the (B, N, K) distance tensor costs one sqrt — no (B, N, K, 3)
    position gather + difference-norm (the global edge-weight MLP consumed
    exactly that recomputed geometry, reference uni_transformer.py:475-481;
    VERDICT r3 item 5). Invalid slots carry sqrt(_BIG)=1e5 — downstream
    e_w values there are don't-cares (the masked softmax zeroes those
    edges).

    Returns (idx, nbr_mask, dist) with dist (B, N, K) float32.
    """
    B, N, _ = pos.shape
    d2 = pairwise_sqdist(pos)
    eye = jnp.eye(N, dtype=bool)
    invalid = (~mask[:, None, :]) | (~mask[:, :, None]) | eye[None]
    d2 = jnp.where(invalid, _BIG, d2)
    # k iterative masked-argmin rounds instead of lax.top_k: the bitonic
    # sort over the lane axis costs more than k lane-min reduces at every
    # batch size measured (0.163 vs 0.186 ms at B=100, 0.34 vs 0.53 at
    # B=1024 — STATUS r3). Lowest-index tie-break == the stable sort's
    # selection, so neighbor sets AND ordering are bit-identical.
    iota = jnp.arange(N, dtype=jnp.int32)
    idxs, masks, dmins = [], [], []
    for _ in range(k):
        dmin = jnp.min(d2, axis=-1, keepdims=True)               # (B,N,1)
        j_star = jnp.min(jnp.where(d2 == dmin, iota, N), axis=-1,
                         keepdims=True)
        masks.append(dmin[..., 0] < _BIG / 2)
        idxs.append(jnp.where(j_star == N, 0, j_star)[..., 0])
        dmins.append(dmin[..., 0])
        d2 = jnp.where(iota == j_star, _BIG, d2)
    idx = jnp.stack(idxs, axis=-1).astype(jnp.int32)             # (B,N,K)
    nbr_mask = jnp.stack(masks, axis=-1)
    dist = jnp.sqrt(jnp.maximum(jnp.stack(dmins, axis=-1), 0.0))
    return idx, nbr_mask, dist


def masked_knn_d_rank(pos: Array, mask: Array, k: int
                      ) -> tuple[Array, Array, Array]:
    """Rank-based masked kNN: same outputs/tie-break as masked_knn_d, but
    with NO serial dependency between the k selections.

    The k iterative argmin rounds form a serial chain of ~4 VPU ops each;
    here every candidate's rank is computed in ONE comparison pass
    (rank_ij = #{j': d2_ij' < d2_ij} + index tie-break), then the k
    selections are independent reduces over a (B, N, N, k) one-hot —
    trading serial latency for parallel width. Selection (including
    lowest-index tie-break) is bit-identical to masked_knn_d at every
    VALID slot (nbr_mask True). At INVALID slots the two variants differ
    (argmin yields idx 0, rank yields the invalid candidate's own index):
    idx must never be consumed without applying nbr_mask.
    """
    B, N, _ = pos.shape
    d2 = pairwise_sqdist(pos)
    eye = jnp.eye(N, dtype=bool)
    invalid = (~mask[:, None, :]) | (~mask[:, :, None]) | eye[None]
    d2 = jnp.where(invalid, _BIG, d2)
    iota = jnp.arange(N, dtype=jnp.int32)
    # rank over candidates j (axis -1 indexes the compared-against j')
    lt = d2[:, :, None, :] < d2[:, :, :, None]            # (B,N,j,j')
    eq = ((d2[:, :, None, :] == d2[:, :, :, None])
          & (iota[None, None, None, :] < iota[None, None, :, None]))
    rank = jnp.sum((lt | eq).astype(jnp.int32), axis=-1)  # (B,N,N)
    sel = rank[..., None] == jnp.arange(k, dtype=jnp.int32)  # (B,N,N,k)
    idx = jnp.min(jnp.where(sel, iota[None, None, :, None], N), axis=2)
    d2_sel = jnp.sum(jnp.where(sel, d2[..., None], 0.0), axis=2)
    nbr_mask = (idx < N) & (d2_sel < _BIG / 2)
    idx = jnp.where(idx == N, 0, idx).astype(jnp.int32)
    dist = jnp.sqrt(jnp.maximum(d2_sel, 0.0))
    return idx, nbr_mask, dist


def gather_neighbors(x: Array, idx: Array) -> Array:
    """Gather per-node features at neighbor indices.

    x: (B, N, ...); idx: (B, N, K) -> (B, N, K, ...).
    """
    return jax.vmap(lambda xb, ib: xb[ib])(x, idx)
