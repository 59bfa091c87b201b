"""Vector-Neuron (VN) layers — rotation-equivariant primitives over channels
of 3-vectors.

Layout convention (TPU-first): VN feature tensors are `(..., C, 3)` with the
channel axis at -2 and the vector axis at -1. Leading axes are free (batch,
points, neighbors). This differs from the reference's `(B, C, 3, N, K)`
layout (models/shape_vn_layers.py) but is mathematically identical and lets
every linear map hit the MXU as a plain trailing-axes matmul.

Functional parity targets (reference file:line):
  * VNLinear            — models/shape_vn_layers.py:9-19
  * VNLeakyReLU         — models/shape_vn_layers.py:21-39
  * VNBatchNorm         — models/shape_vn_layers.py:41-61 (masked variant added)
  * VNLinearLeakyReLU   — models/shape_vn_layers.py:79-110
  * VNResnetBlockFC     — models/shape_vn_layers.py:113-156
  * ResnetBlockFC       — models/shape_vn_layers.py:210-252
  * mean_pool           — models/shape_vn_layers.py:254-255
  * get_graph_feature_cross / knn — models/shape_vn_layers.py:257-292
    (the dense pairwise-matmul knn is already the TPU-right algorithm; here it
    runs batched under jit with lax.top_k)
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array
EPS = 1e-6


class VNLinear(nn.Module):
    """Channel-mixing linear map: out[..., e, :] = sum_c W[e, c] x[..., c, :]."""
    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = nn.Dense(self.features, use_bias=False, name="map_to_feat")
        return w(x.swapaxes(-1, -2)).swapaxes(-1, -2)


def _vn_leaky(p: Array, d: Array, negative_slope: float) -> Array:
    """Direction-gated leaky ReLU on 3-vector channels.

    p: features (..., C, 3); d: learned directions (..., C, 3).
    Where <p, d> >= 0 keep p; otherwise remove the component of p along d;
    blend with slope.
    """
    dotprod = jnp.sum(p * d, axis=-1, keepdims=True)
    mask = (dotprod >= 0).astype(p.dtype)
    d_norm_sq = jnp.sum(d * d, axis=-1, keepdims=True)
    proj = (dotprod / (d_norm_sq + EPS)) * d
    return (negative_slope * p
            + (1 - negative_slope) * (mask * p + (1 - mask) * (p - proj)))


class VNLeakyReLU(nn.Module):
    features: int            # input channel count (directions are square map)
    share_nonlinearity: bool = False
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dir_feats = 1 if self.share_nonlinearity else self.features
        d = nn.Dense(dir_feats, use_bias=False, name="map_to_dir")(
            x.swapaxes(-1, -2)).swapaxes(-1, -2)
        return _vn_leaky(x, d, self.negative_slope)


class VNBatchNorm(nn.Module):
    """BatchNorm over vector magnitudes: x <- x / ||x|| * BN(||x||).

    Statistics are per channel over all leading axes; `mask` (broadcastable to
    the leading axes) restricts statistics to valid entries — needed for
    padded node batches, where the reference's ragged layout had no padding.
    Running stats live in the 'batch_stats' collection (torch momentum 0.1).
    """
    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, mask: Array | None = None,
                 use_running_average: bool = False) -> Array:
        norm = jnp.linalg.norm(x, axis=-1) + EPS            # (..., C)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(norm.ndim - 1))
            if mask is None:
                mean = jnp.mean(norm, axis=reduce_axes)
                var = jnp.mean((norm - mean) ** 2, axis=reduce_axes)
                count = jnp.asarray(norm.size / norm.shape[-1], jnp.float32)
            else:
                # mask covers the leading axes; broadcast to (..., 1)
                m = mask.astype(norm.dtype)
                while m.ndim < norm.ndim:
                    m = m[..., None]
                m = jnp.broadcast_to(m, norm.shape[:-1] + (1,))
                count = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(norm * m, axis=reduce_axes) / count
                var = jnp.sum(((norm - mean) ** 2) * m, axis=reduce_axes) / count
            if not self.is_initializing():
                # torch updates running_var with the unbiased estimate
                unbias = count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var * unbias
        norm_bn = (norm - mean) / jnp.sqrt(var + self.epsilon) * scale + bias
        return x / norm[..., None] * norm_bn[..., None]


class VNLinearLeakyReLU(nn.Module):
    """VNLinear -> (VNBatchNorm) -> direction-gated leaky ReLU.

    NOTE (parity): the gating direction is computed from the layer *input* x,
    while the gated features are the (normed) linear output p — exactly as the
    reference (shape_vn_layers.py:100-109).
    """
    in_features: int
    out_features: int
    share_nonlinearity: bool = False
    negative_slope: float = 0.2
    use_batchnorm: bool = True

    @nn.compact
    def __call__(self, x: Array, mask: Array | None = None,
                 use_running_average: bool = False) -> Array:
        p = nn.Dense(self.out_features, use_bias=False, name="map_to_feat")(
            x.swapaxes(-1, -2)).swapaxes(-1, -2)
        if self.use_batchnorm:
            p = VNBatchNorm(self.out_features, name="batchnorm")(
                p, mask=mask, use_running_average=use_running_average)
        dir_feats = 1 if self.share_nonlinearity else self.out_features
        d = nn.Dense(dir_feats, use_bias=False, name="map_to_dir")(
            x.swapaxes(-1, -2)).swapaxes(-1, -2)
        return _vn_leaky(p, d, self.negative_slope)


class VNStdFeature(nn.Module):
    """Learned invariant frame: two VN layers predict 3 direction channels
    z0; features are projected onto them (x @ z0), optionally after
    Gram-Schmidt orthonormalization of the frame
    (reference VNStdFeature, shape_vn_layers.py:159-206 — imported by the
    reference's uni_transformer but unused there; part of the layer zoo).

    Input (..., C, 3) -> (invariant features (..., C, 3'), frame (..., 3, 3))
    where 3' = 3 (or the 2-vector frame completed by a cross product when
    normalize_frame=True)."""
    in_channels: int
    normalize_frame: bool = False
    share_nonlinearity: bool = False
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: Array):
        z0 = VNLinearLeakyReLU(self.in_channels, self.in_channels // 2,
                               share_nonlinearity=self.share_nonlinearity,
                               negative_slope=self.negative_slope,
                               use_batchnorm=False, name="vn1")(x)
        z0 = VNLinearLeakyReLU(self.in_channels // 2, self.in_channels // 4,
                               share_nonlinearity=self.share_nonlinearity,
                               negative_slope=self.negative_slope,
                               use_batchnorm=False, name="vn2")(z0)
        n_dirs = 2 if self.normalize_frame else 3
        z0 = nn.Dense(n_dirs, use_bias=False, name="vn_lin")(
            z0.swapaxes(-1, -2)).swapaxes(-1, -2)          # (..., n_dirs, 3)
        if self.normalize_frame:
            v1 = z0[..., 0, :]
            u1 = v1 / (jnp.linalg.norm(v1, axis=-1, keepdims=True) + EPS)
            v2 = z0[..., 1, :]
            v2 = v2 - jnp.sum(v2 * u1, axis=-1, keepdims=True) * u1
            u2 = v2 / (jnp.linalg.norm(v2, axis=-1, keepdims=True) + EPS)
            u3 = jnp.cross(u1, u2)
            frame = jnp.stack([u1, u2, u3], axis=-2)       # (..., 3, 3)
        else:
            frame = z0
        # invariants: project features onto the (learned, equivariant) frame
        x_std = jnp.einsum("...cd,...ed->...ce", x, frame,
                           preferred_element_type=jnp.float32)
        return x_std, frame


class VNResnetBlockFC(nn.Module):
    """VN residual block; fc_1 zero-initialized so the block starts as a
    (possibly projected) identity — mirrors the reference init."""
    size_in: int
    size_out: int | None = None
    size_h: int | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        size_out = self.size_out or self.size_in
        size_h = self.size_h or min(self.size_in, size_out)
        a0 = VNLeakyReLU(self.size_in, negative_slope=0.0, name="actvn_0")(x)
        net = VNLinear(size_h, name="fc_0")(a0)
        a1 = VNLeakyReLU(size_h, negative_slope=0.0, name="actvn_1")(net)
        dx = nn.Dense(size_out, use_bias=False, name="fc_1",
                      kernel_init=nn.initializers.zeros)(
            a1.swapaxes(-1, -2)).swapaxes(-1, -2)
        if self.size_in == size_out:
            x_s = x
        else:
            x_s = VNLinear(size_out, name="shortcut")(x)
        return x_s + dx


class ResnetBlockFC(nn.Module):
    """Plain scalar residual block (relu pre-activation, zero-init fc_1)."""
    size_in: int
    size_out: int | None = None
    size_h: int | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        size_out = self.size_out or self.size_in
        size_h = self.size_h or min(self.size_in, size_out)
        net = nn.Dense(size_h, name="fc_0")(jax.nn.relu(x))
        dx = nn.Dense(size_out, name="fc_1",
                      kernel_init=nn.initializers.zeros)(jax.nn.relu(net))
        if self.size_in == size_out:
            x_s = x
        else:
            x_s = nn.Dense(size_out, use_bias=False, name="shortcut")(x)
        return x_s + dx


def mean_pool(x: Array, axis: int = -1, keepdims: bool = False) -> Array:
    return jnp.mean(x, axis=axis, keepdims=keepdims)


def knn_indices(x_flat: Array, k: int) -> Array:
    """Dense kNN over flattened point features.

    x_flat: (B, N, D). Returns idx (B, N, K) of the K nearest points by
    Euclidean distance in D-space, *including self* (distance 0) — matching
    the reference DGCNN knn (shape_vn_layers.py:286-292). Built on one big
    matmul + lax.top_k: the TPU-native formulation.
    """
    inner = jnp.einsum("bnd,bmd->bnm", x_flat, x_flat,
                       preferred_element_type=jnp.float32)
    sq = jnp.sum(x_flat * x_flat, axis=-1)
    neg_d2 = 2 * inner - sq[:, :, None] - sq[:, None, :]
    _, idx = jax.lax.top_k(neg_d2, k)
    return idx


def get_graph_feature_cross(x: Array, k: int, if_cross: bool = False) -> Array:
    """DGCNN edge features on VN tensors.

    x: (B, N, C, 3) -> (B, N, K, F, 3) with F = 2C (or 3C with cross terms):
    concat over channels of (x_j - x_i, x_i [, x_j × x_i]).
    kNN is computed on the flattened (B, N, 3C) representation, like the
    reference (shape_vn_layers.py:257-284).
    """
    B, N, C, _ = x.shape
    idx = knn_indices(x.reshape(B, N, C * 3), k)            # (B, N, K)
    feature = jax.vmap(lambda xb, ib: xb[ib])(x, idx)       # (B, N, K, C, 3)
    xi = jnp.broadcast_to(x[:, :, None], (B, N, k, C, 3))
    if if_cross:
        cross = jnp.cross(feature, xi)
        return jnp.concatenate([feature - xi, xi, cross], axis=-2)
    return jnp.concatenate([feature - xi, xi], axis=-2)
