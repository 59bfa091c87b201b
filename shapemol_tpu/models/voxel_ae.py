"""Voxel-based shape autoencoder (legacy alternative to the point-cloud AE).

Functional parity target: IM_AE (reference models/shape_modelAE.py:102-164):
  * encoder: 4x strided Conv3D (instance norm, leaky relu 0.02) -> sigmoid
    latent z (invariant vector, NOT rotation-equivariant — that's why the
    point-cloud AE superseded it)
  * generator: 6-layer MLP on (query point, z) with the custom leaky output
    clamp max(min(x, 0.01x + 0.99), 0.01x)
  * train loss: MSE on voxel occupancy at query points
  * val: reconstruction accuracy over the full grid

The reference's get_reconstruct_voxel contains a dead typo path
(`torch.tednsor`, line 158); the reimplementation is a vectorized dense-grid
decode."""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class VoxelAEConfig:
    ef_dim: int = 32
    gf_dim: int = 128
    z_dim: int = 128
    point_dim: int = 3


class VoxelEncoder(nn.Module):
    ef_dim: int
    z_dim: int

    @nn.compact
    def __call__(self, voxels: Array) -> Array:
        """voxels: (B, G, G, G, 1) -> (B, z_dim) in (0, 1)."""
        def block(x, feats, name, norm=True, padding=1, bias=False):
            x = nn.Conv(feats, (4, 4, 4), strides=(2, 2, 2),
                        padding=[(padding, padding)] * 3, use_bias=bias,
                        name=name)(x)
            if norm:
                # InstanceNorm3d: normalize over spatial dims per channel
                mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
                var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
                x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
            return nn.leaky_relu(x, 0.02)

        x = block(voxels, self.ef_dim, "conv_1")
        x = block(x, self.ef_dim * 2, "conv_2")
        x = block(x, self.ef_dim * 4, "conv_3")
        x = nn.Conv(self.z_dim, (4, 4, 4), strides=(2, 2, 2),
                    padding="VALID", use_bias=True, name="conv_4")(x)
        x = jnp.mean(x, axis=(1, 2, 3)) if x.shape[1] > 1 \
            else x.reshape(x.shape[0], -1)[:, :self.z_dim]
        return jax.nn.sigmoid(x)


class VoxelGenerator(nn.Module):
    z_dim: int
    gf_dim: int

    @nn.compact
    def __call__(self, points: Array, z: Array) -> Array:
        """points (B, T, 3), z (B, z_dim) -> occupancy (B, T)."""
        zs = jnp.broadcast_to(z[:, None, :],
                              (points.shape[0], points.shape[1], z.shape[-1]))
        x = jnp.concatenate([points, zs], axis=-1)
        init = nn.initializers.normal(0.02)
        for k, feats in enumerate([self.gf_dim * 8, self.gf_dim * 8,
                                   self.gf_dim * 4, self.gf_dim * 2,
                                   self.gf_dim]):
            x = nn.Dense(feats, kernel_init=init, name=f"linear_{k + 1}")(x)
            x = nn.leaky_relu(x, 0.02)
        x = nn.Dense(1, kernel_init=init, name="linear_6")(x)
        # custom soft clamp to ~[0, 1] with 0.01 leak (reference line 63)
        x = jnp.maximum(jnp.minimum(x, x * 0.01 + 0.99), x * 0.01)
        return jnp.squeeze(x, -1)


class VoxelAE(nn.Module):
    config: VoxelAEConfig

    def setup(self):
        cfg = self.config
        self.encoder = VoxelEncoder(cfg.ef_dim, cfg.z_dim)
        self.generator = VoxelGenerator(cfg.z_dim, cfg.gf_dim)

    def __call__(self, voxels: Array, points: Array):
        z = self.encoder(voxels)
        return z, self.generator(points, z)

    def encode(self, voxels: Array) -> Array:
        return self.encoder(voxels)

    def decode(self, points: Array, z: Array) -> Array:
        return self.generator(points, z)


def voxel_ae_train_loss(model: VoxelAE, variables, voxels, points, values):
    _, pred = model.apply(variables, voxels, points)
    return jnp.mean((pred - values) ** 2)


def reconstruct_voxel_grid(model: VoxelAE, variables, z: Array,
                           grid_size: int) -> Array:
    """Dense decode of the full grid (vectorized replacement for the
    reference's triple Python loop)."""
    g = jnp.arange(grid_size, dtype=jnp.float32)
    pts = jnp.stack(jnp.meshgrid(g, g, g, indexing="ij"), -1).reshape(1, -1, 3)
    pts = jnp.broadcast_to(pts, (z.shape[0], pts.shape[1], 3))
    occ = model.apply(variables, pts, z, method=model.decode)
    return (occ > 0.5).astype(jnp.int32).reshape(
        z.shape[0], grid_size, grid_size, grid_size)
