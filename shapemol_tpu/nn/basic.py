"""Scalar NN primitives: MLP, Gaussian radial basis, shifted softplus,
sinusoidal time embedding, generalized outer product.

Functional parity targets (reference file:line):
  * MLP               — models/common.py:47-67
  * GaussianSmearing  — models/common.py:11-28 (incl. the fixed-offset quirk)
  * ShiftedSoftplus   — models/common.py:39-45
  * SinusoidalPosEmb  — models/molopt_score_model.py:154-166
  * outer_product     — models/common.py:70-77
"""
from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# The reference's GaussianSmearing ignores its (start, stop, num_gaussians)
# arguments and always uses this 20-entry non-uniform offset table spanning
# 0..10 Å with coeff derived from the first gap (models/common.py:19-20).
# We keep that behavior under offsets="fixed" (the trained configs rely on it)
# and provide a proper linspace mode as well.
FIXED_RBF_OFFSETS = np.array(
    [0, 1, 1.25, 1.5, 1.75, 2, 2.25, 2.5, 2.75, 3,
     3.5, 4, 4.5, 5, 5.5, 6, 7, 8, 9, 10], dtype=np.float32)


def shifted_softplus(x: Array) -> Array:
    return jax.nn.softplus(x) - float(np.log(2.0))


def outer_product(*vectors: Array) -> Array:
    """Iterated outer product over trailing feature axes, flattened.

    outer_product(a (..., M), b (..., N)) -> (..., M*N) where
    out[..., i*N + j] = a[..., i] * b[..., j]. With a == ones((..., 1)) this
    is the identity on b, which is how the shipped configs use it
    (edge_feat_dim=0 -> one-class one-hot edge attr).
    """
    out = vectors[0][..., :, None]            # (..., M, 1)
    for v in vectors[1:]:
        out = out * v[..., None, :]            # (..., M, N)
        out = out.reshape(*out.shape[:-2], -1)[..., :, None]
    return jnp.squeeze(out, axis=-1)


class GaussianSmearing(nn.Module):
    """Radial basis expansion of distances.

    offsets="fixed"   : the reference's hard-coded 20-center table (coeff -0.5)
    offsets="linspace": standard evenly spaced centers on [start, stop]
    Input (...,) distances -> output (..., num_gaussians).
    """
    start: float = 0.0
    stop: float = 10.0
    num_gaussians: int = 20
    offsets: str = "fixed"

    @nn.compact
    def __call__(self, dist: Array) -> Array:
        if self.offsets == "fixed":
            centers = jnp.asarray(FIXED_RBF_OFFSETS)
            coeff = -0.5 / float(FIXED_RBF_OFFSETS[1] - FIXED_RBF_OFFSETS[0]) ** 2
        else:
            centers = jnp.linspace(self.start, self.stop, self.num_gaussians)
            gap = (self.stop - self.start) / max(self.num_gaussians - 1, 1)
            coeff = -0.5 / gap ** 2
        diff = dist[..., None] - centers
        return jnp.exp(coeff * diff * diff)


class MLP(nn.Module):
    """Dense stack with a shared hidden width; LayerNorm+act between layers.

    Layer l output gets LayerNorm+activation unless it is the last layer
    (and act_last is False) — same wiring as the reference MLP.
    """
    out_dim: int
    hidden_dim: int
    num_layer: int = 2
    norm: bool = True
    act_fn: str = "relu"
    act_last: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = {"relu": jax.nn.relu, "silu": jax.nn.silu, "tanh": jnp.tanh,
               "elu": jax.nn.elu, "softplus": jax.nn.softplus}[self.act_fn]
        for layer_idx in range(self.num_layer):
            feats = self.out_dim if layer_idx == self.num_layer - 1 else self.hidden_dim
            x = nn.Dense(feats, dtype=self.dtype, name=f"dense_{layer_idx}")(x)
            if layer_idx < self.num_layer - 1 or self.act_last:
                if self.norm:
                    x = nn.LayerNorm(dtype=self.dtype, name=f"ln_{layer_idx}")(x)
                x = act(x)
        return x


class SinusoidalPosEmb(nn.Module):
    """Transformer-style sinusoidal embedding of (integer) timesteps."""
    dim: int

    def __call__(self, t: Array) -> Array:
        half_dim = self.dim // 2
        freq = np.log(10000.0) / (half_dim - 1)
        freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -freq)
        ang = t.astype(jnp.float32)[..., None] * freqs
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class TimeEmbedding(nn.Module):
    """SinusoidalPosEmb -> Dense(2d) -> SiLU -> Dense(d)
    (reference molopt_score_model.py:247-252)."""
    dim: int

    @nn.compact
    def __call__(self, t: Array) -> Array:
        x = SinusoidalPosEmb(self.dim)(t)
        x = nn.Dense(self.dim * 2)(x)
        x = jax.nn.silu(x)
        return nn.Dense(self.dim)(x)
