"""Pallas TPU kernel for masked k-nearest-neighbor graph construction.

**Measured verdict (round 3): NOT wired into the hot path.** On the real
v5e chip this kernel is exact (bit-identical neighbor selection vs
`lax.top_k`, tests/test_knn_kernel.py) but SLOWER than the XLA
composition it was built to replace: 0.56 vs 0.19 ms at batch 100 and
4.4 vs 0.53 ms at batch 1024. The K unrolled argmin rounds serialize ~3
cross-lane reduce + column->lane broadcast relayouts each, and that VPU
relayout chain costs more than XLA's bitonic sort. A tiled pure-XLA
variant ((G, TN, TN) Gram + block-diagonal mask + top_k over TN lanes)
was also measured and is ~equal-to-slightly-slower than the baseline
(0.19 / 0.61 ms), so `ops.knn.masked_knn` stands as the production path;
the kNN block is ~7% of the sampling step (STATUS breakdown). Kept, with
tests, for re-measurement on future Mosaic toolchains.

Design (for that re-measurement): tile T molecules into one (TN, TN)
program at proper (8, 128) tiling — the Gram matrix is one MXU pass,
molecule/self/pad masking is iota arithmetic, and the top-k is K unrolled
masked-min rounds with lowest-index tie-breaking, bit-identical to the
stable-sorted `lax.top_k`.

Reference behavior matched: torch_cluster.knn_graph with loop=False per
denoiser block (reference models/uni_transformer.py:466-468) — see
ops/knn.py for the set-semantics argument.

The argmin ordering uses the row-constant-invariance of per-destination
minimisation: key_ij = |x_j|^2 - 2 x_i.x_j orders neighbors j of a fixed
destination i identically to the true squared distance, so the |x_i|^2
term is only added back when emitting the true distances.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BIG = 1e10


def _knn_kernel(x_ref, mask_ref, idx_ref, nbr_ref, dist_ref, *,
                N: int, K: int):
    f32 = jnp.float32
    x = x_ref[0].astype(f32)                       # (TN, 3)
    m = mask_ref[0]                                # (TN, 1) {0,1} f32
    TN = x.shape[0]

    inner = jax.lax.dot(x, x.T, preferred_element_type=f32)    # (TN, TN)
    sq = jnp.sum(x * x, axis=-1, keepdims=True)                # (TN, 1)

    rows = jax.lax.broadcasted_iota(jnp.int32, (TN, TN), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TN, TN), 1)
    same_mol = (rows // N) == (cols // N)
    not_self = rows != cols
    # column (source) validity: m is (TN, 1); m_j needs the same values on
    # the lane axis — a (TN,1)->(1,TN) relayout then a row broadcast
    m_j = jnp.broadcast_to(m.reshape(1, TN), (TN, TN))
    valid = (same_mol & not_self & (m_j > 0.5) & (m > 0.5))    # (TN, TN)

    sq_j = jnp.broadcast_to(sq.reshape(1, TN), (TN, TN))
    key = jnp.where(valid, sq_j - 2.0 * inner, _BIG)

    base = (jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0) // N) * N
    idx_cols = []
    nbr_cols = []
    dist_cols = []
    for _ in range(K):
        kmin = jnp.min(key, axis=-1, keepdims=True)            # (TN, 1)
        is_min = key == kmin
        # lowest index among ties == stable-sort (lax.top_k) order
        j_star = jnp.min(jnp.where(is_min, cols, TN), axis=-1,
                         keepdims=True)                        # (TN, 1)
        ok = kmin < _BIG / 2
        idx_cols.append(jnp.where(ok, j_star - base, 0))
        nbr_cols.append(ok.astype(f32))
        d2 = jnp.maximum(kmin + sq, 0.0)                       # true |xi-xj|^2
        dist_cols.append(jnp.where(ok, jnp.sqrt(d2), 0.0))
        key = jnp.where(cols == j_star, _BIG, key)
    idx_ref[0] = jnp.concatenate(idx_cols, axis=-1).astype(jnp.int32)
    nbr_ref[0] = jnp.concatenate(nbr_cols, axis=-1)
    dist_ref[0] = jnp.concatenate(dist_cols, axis=-1)


def _pick_tile(B: int, N: int) -> int:
    for t in (4, 8, 2, 1):
        if B % t == 0 and t * N <= 512:
            return t
    return 0


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _masked_knn_pallas(pos: Array, mask: Array, k: int,
                       interpret: bool = False):
    B, N, _ = pos.shape
    T = _pick_tile(B, N)
    G, TN = B // T, T * N
    x2 = jax.lax.stop_gradient(pos).reshape(G, TN, 3)
    m2 = mask.reshape(G, TN, 1).astype(jnp.float32)
    vm = lambda shape, imap: pl.BlockSpec(shape, imap,
                                          memory_space=pltpu.VMEM)
    bmap = lambda b: (b, 0, 0)
    idx, nbr, dist = pl.pallas_call(
        functools.partial(_knn_kernel, N=N, K=k),
        grid=(G,),
        in_specs=[vm((1, TN, 3), bmap), vm((1, TN, 1), bmap)],
        out_specs=(vm((1, TN, k), bmap), vm((1, TN, k), bmap),
                   vm((1, TN, k), bmap)),
        out_shape=(jax.ShapeDtypeStruct((G, TN, k), jnp.int32),
                   jax.ShapeDtypeStruct((G, TN, k), jnp.float32),
                   jax.ShapeDtypeStruct((G, TN, k), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2, m2)
    return (idx.reshape(B, N, k), nbr.reshape(B, N, k) > 0.5,
            dist.reshape(B, N, k))


def masked_knn_with_dist(pos: Array, mask: Array, k: int,
                         use_pallas: bool = False,
                         interpret: bool = False
                         ) -> Tuple[Array, Array, Array]:
    """(idx, nbr_mask, dist): like ops.knn.masked_knn but also returns the
    true neighbor distances. use_pallas defaults to False per the measured
    verdict in the module docstring (the XLA path wins on current
    toolchains); pass True to re-measure the kernel."""
    B, N, _ = pos.shape
    on_tpu = jax.default_backend() == "tpu" or interpret
    if use_pallas and on_tpu and _pick_tile(B, N) > 0:
        return _masked_knn_pallas(pos, mask, k, interpret=interpret)
    from shapemol_tpu.ops.knn import gather_neighbors, masked_knn
    idx, nbr_mask = masked_knn(pos, mask, k)
    nbr = gather_neighbors(pos, idx)
    d = jnp.linalg.norm(pos[:, :, None, :] - nbr + 1e-12, axis=-1)
    return idx, nbr_mask, jnp.where(nbr_mask, d, 0.0)
