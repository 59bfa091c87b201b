"""Parity of the Pallas kNN kernel vs the XLA top_k composition.

The kernel must reproduce lax.top_k's stable ordering exactly (ascending
distance, ties broken by lowest source index), the same validity mask,
and true Euclidean neighbor distances."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapemol_tpu.kernels.knn import _masked_knn_pallas, masked_knn_with_dist
from shapemol_tpu.ops.knn import gather_neighbors, masked_knn


def _case(B, N, seed, dup=False, empty_rows=False):
    rng = np.random.default_rng(seed)
    pos = rng.standard_normal((B, N, 3)).astype(np.float32) * 2
    if dup:
        # exact duplicate positions force distance ties
        pos[:, 1] = pos[:, 0]
        pos[:, 3] = pos[:, 0]
    counts = rng.integers(3 if not empty_rows else 0, N + 1, B)
    mask = np.arange(N)[None, :] < counts[:, None]
    return jnp.asarray(pos), jnp.asarray(mask)


@pytest.mark.parametrize("B,N,seed,dup", [
    (8, 32, 0, False),
    (8, 32, 1, True),
    (4, 24, 2, False),
    (16, 16, 3, False),
    (2, 48, 4, True),
])
def test_pallas_knn_matches_topk(B, N, seed, dup):
    pos, mask = _case(B, N, seed, dup)
    k = 8
    ref_idx, ref_nbr = masked_knn(pos, mask, k)
    got_idx, got_nbr, got_d = _masked_knn_pallas(pos, mask, k,
                                                 interpret=True)
    assert bool(jnp.all(got_nbr == ref_nbr))
    # exact ordering parity on valid slots (stable tie-break)
    same = jnp.where(ref_nbr, got_idx == ref_idx, True)
    assert bool(jnp.all(same)), (np.asarray(got_idx)[~np.asarray(same)],
                                 np.asarray(ref_idx)[~np.asarray(same)])
    # distances match the gather+norm path
    nbr = gather_neighbors(pos, ref_idx)
    d_ref = jnp.linalg.norm(pos[:, :, None, :] - nbr + 1e-12, axis=-1)
    err = jnp.where(ref_nbr, jnp.abs(got_d - d_ref), 0.0)
    assert float(jnp.max(err)) < 1e-4


def test_empty_and_tiny_molecules():
    pos, mask = _case(6, 32, 5, empty_rows=True)
    got_idx, got_nbr, got_d = _masked_knn_pallas(pos, mask, 8,
                                                 interpret=True)
    _, ref_nbr = masked_knn(pos, mask, 8)
    assert bool(jnp.all(got_nbr == ref_nbr))
    # invalid slots carry a harmless in-range index and zero distance
    assert int(jnp.min(got_idx)) >= 0 and int(jnp.max(got_idx)) < 32
    assert bool(jnp.all(jnp.where(got_nbr, True, got_d == 0.0)))


def test_dispatch_fallback_matches():
    # off-TPU (CPU test env), the wrapper must take the XLA path and agree
    pos, mask = _case(5, 20, 6)          # B=5: no tile divides it anyway
    idx, nbr, d = masked_knn_with_dist(pos, mask, 8, use_pallas=True)
    ref_idx, ref_nbr = masked_knn(pos, mask, 8)
    assert bool(jnp.all(idx == ref_idx)) and bool(jnp.all(nbr == ref_nbr))


def test_grad_transparent():
    # idx/nbr are integer/bool; the op must not break jax.grad over pos
    pos, mask = _case(4, 16, 7)

    def loss(p):
        idx, nbr, d = masked_knn_with_dist(p, mask, 4, use_pallas=False)
        return jnp.sum(jnp.where(nbr, d, 0.0))

    g = jax.grad(loss)(pos)
    assert np.isfinite(np.asarray(g)).all()
