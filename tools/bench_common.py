"""Shared pieces for the step benchmarks so bench_knn_step.py and
bench_step_split.py measure the SAME approximation of the production
global edge-weight path (rbf(20) -> dense 128 -> LN -> relu -> dense 1 ->
sigmoid, models/denoiser.py e_w at hidden_dim=128 / num_r_gaussian=20)."""
from __future__ import annotations

import numpy as np


def make_ew_params(rng: np.random.Generator, num_gaussian: int = 20,
                   hidden: int = 128):
    import jax.numpy as jnp
    w0 = jnp.asarray(rng.standard_normal((num_gaussian, hidden)) * 0.1,
                     jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((hidden, 1)) * 0.1, jnp.float32)
    offs = jnp.linspace(0.0, 10.0, num_gaussian)
    return w0, w1, offs


def ew_mlp(d, w0, w1, offs):
    """d: (..., k) neighbor distances -> (..., k) edge weights."""
    import jax
    import jax.numpy as jnp
    rbf = jnp.exp(-0.5 * (d[..., None] - offs) ** 2 / 0.25)
    h = rbf @ w0
    h = (h - h.mean(-1, keepdims=True)) / (h.std(-1, keepdims=True) + 1e-5)
    return jax.nn.sigmoid(jax.nn.relu(h) @ w1)[..., 0]
