"""Stage-1 shape autoencoder: rotation-equivariant VN-DGCNN point-cloud
encoder + invariant implicit-function decoder (signed distance / occupancy).

Functional parity targets (reference file:line):
  * DecoderInner        — models/shape_pointcloud_modelAE.py:21-103
  * PointCloud_AE       — models/shape_pointcloud_modelAE.py:105-150
  * VN_DGCNN_Encoder    — models/shape_pointcloud_modelAE.py:207-255
  * VN_Resnet_Encoder   — models/shape_pointcloud_modelAE.py:153-204

Design deltas vs the reference (deliberate):
  * All residual blocks are registered parameters. The reference kept them in
    plain Python lists so they were never trained or checkpointed (SURVEY
    §2.2 Q1); we train the full architecture.
  * Layout is (B, N, C, 3) channels-last-but-one (see nn/vn.py); the encoder
    is one fused batched graph-conv stack that XLA maps onto the MXU.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from shapemol_tpu.nn.vn import (VNLinear, VNLeakyReLU, VNLinearLeakyReLU,
                                VNResnetBlockFC, ResnetBlockFC, mean_pool,
                                get_graph_feature_cross)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ShapeAEConfig:
    encoder: str = "VN_DGCNN"            # VN_DGCNN | VN_Resnet
    hidden_dim: int = 128
    latent_dim: int = 32
    point_dim: int = 3
    layer_num: int = 4
    num_k: int = 20
    loss_type: str = "signed_distance"   # signed_distance | occupancy


class _VNKernel(nn.Module):
    """Bare kernel holder so decomposed layers keep the exact parameter path
    of an nn.Dense submodule ({name}/kernel) — the torch importer and any
    checkpoints stay valid."""
    shape: tuple

    @nn.compact
    def __call__(self) -> Array:
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class DecomposedVNEdgeConv(nn.Module):
    """VNLinearLeakyReLU over DGCNN edge features cat(x_j - x_i, x_i),
    with the channel matmuls DECOMPOSED to node level.

    A VN linear over the concat is W1·(x_j - x_i) + W2·x_i
    = (W1·x)_j  +  ((W2 - W1)·x)_i, so both the feature and the direction
    projections run once per NODE and are gathered per edge — ~K-fold fewer
    matmul FLOPs and a C-wide (not 2C-wide) edge gather, numerically
    identical to get_graph_feature_cross + VNLinearLeakyReLU
    (reference shape_pointcloud_modelAE.py:241-250). BatchNorm and the
    direction gating stay per-edge; output mean-pooled over K."""
    in_channels: int           # C (edge input is 2C wide)
    out_channels: int
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: Array, idx: Array, train: bool = False) -> Array:
        """x (B,N,C,3); idx (B,N,K) neighbor indices -> (B,N,C',3)."""
        from shapemol_tpu.nn.vn import VNBatchNorm, _vn_leaky
        C, O = self.in_channels, self.out_channels
        w_feat = _VNKernel((2 * C, O), name="map_to_feat")()
        w_dir = _VNKernel((2 * C, O), name="map_to_dir")()

        def project(w):
            a = jnp.einsum("bncd,co->bnod", x, w[:C],
                           preferred_element_type=jnp.float32)
            b = jnp.einsum("bncd,co->bnod", x, w[C:] - w[:C],
                           preferred_element_type=jnp.float32)
            a_j = jax.vmap(lambda ab, ib: ab[ib])(a, idx)   # (B,N,K,O,3)
            return a_j + b[:, :, None]

        p = project(w_feat)
        p = VNBatchNorm(O, name="batchnorm")(
            p, use_running_average=not train)
        d = project(w_dir)
        gated = _vn_leaky(p, d, self.negative_slope)
        return jnp.mean(gated, axis=2)                      # pool K


class VNDGCNNEncoder(nn.Module):
    """(B, N, 3) point cloud -> (B, latent, 3) equivariant latent."""
    hidden_dim: int
    latent_dim: int
    layer_num: int
    num_k: int

    @nn.compact
    def __call__(self, points: Array, train: bool = False) -> Array:
        from shapemol_tpu.nn.vn import knn_indices
        x = points[:, :, None, :]                                   # (B,N,1,3)
        idx = knn_indices(points, self.num_k)
        hidden = DecomposedVNEdgeConv(1, self.hidden_dim,
                                      name="conv_pos")(x, idx, train=train)
        hiddens = []
        for i in range(self.layer_num):
            B, N, C, _ = hidden.shape
            idx = knn_indices(hidden.reshape(B, N, C * 3), self.num_k)
            hidden = DecomposedVNEdgeConv(self.hidden_dim, self.hidden_dim,
                                          name=f"block_{i}")(
                hidden, idx, train=train)
            hiddens.append(hidden)
        cat = jnp.concatenate(hiddens, axis=-2)                     # (B,N,4H,3)
        latent = VNLinearLeakyReLU(self.layer_num * self.hidden_dim,
                                   self.latent_dim, share_nonlinearity=True,
                                   name="conv_c")(
            cat, use_running_average=not train)                     # (B,N,L,3)
        return jnp.mean(latent, axis=1)                             # (B,L,3)


class VNResnetEncoder(nn.Module):
    """Alternative encoder (reference VN_Resnet_Encoder)."""
    hidden_dim: int
    latent_dim: int
    layer_num: int
    num_k: int

    @nn.compact
    def __call__(self, points: Array, train: bool = False) -> Array:
        x = points[:, :, None, :]
        feat = get_graph_feature_cross(x, k=self.num_k, if_cross=True)
        hidden = VNLinearLeakyReLU(3, self.hidden_dim, use_batchnorm=False,
                                   name="conv_pos")(feat)
        hidden = mean_pool(hidden, axis=2)                          # (B,N,H,3)
        hidden = VNLinear(2 * self.hidden_dim, name="fc_pos")(hidden)
        for i in range(self.layer_num):
            hidden = VNResnetBlockFC(2 * self.hidden_dim, self.hidden_dim,
                                     name=f"block_{i}")(hidden)     # (B,N,H,3)
            pooled = jnp.broadcast_to(jnp.mean(hidden, axis=1, keepdims=True),
                                      hidden.shape)
            if i < self.layer_num - 1:
                hidden = jnp.concatenate([hidden, pooled], axis=-2)
            else:
                hidden = pooled
        hidden = jnp.mean(hidden, axis=1)                           # (B,H,3)
        act = VNLeakyReLU(self.hidden_dim, negative_slope=0.2,
                          name="actvn_c")(hidden)
        return VNLinear(self.latent_dim, name="fc_c")(act)


class DecoderInner(nn.Module):
    """Implicit decoder: rotation-invariant features of (query p, latent z)
    -> signed distance / occupancy at p."""
    latent_dim: int
    hidden_dim: int
    layer_num: int
    loss_type: str = "signed_distance"

    @nn.compact
    def __call__(self, p: Array, z: Array) -> Array:
        """p: (B, T, 3) query points; z: (B, L, 3) latent. -> (B, T)."""
        net = jnp.sum(p * p, axis=-1, keepdims=True)                # <p,p>
        net_z = jnp.einsum("bti,bli->btl", p, z,
                           preferred_element_type=jnp.float32)      # p·z_l
        z_dir = VNLinear(self.latent_dim, name="z_in")(z)
        z_inv = jnp.sum(z * z_dir, axis=-1)                         # (B,L)
        z_inv = jnp.broadcast_to(z_inv[:, None, :],
                                 net_z.shape)                       # (B,T,L)
        net = jnp.concatenate([net, net_z, z_inv], axis=-1)
        net = nn.Dense(self.hidden_dim, name="fc_in")(net)
        for i in range(self.layer_num):
            net = ResnetBlockFC(self.hidden_dim, name=f"block_{i}")(net)
        out = nn.Dense(1, name="fc_out")(jax.nn.relu(net))
        out = jnp.squeeze(out, axis=-1)
        if self.loss_type == "occupancy":
            out = jax.nn.sigmoid(out)
        return out


class PointCloudAE(nn.Module):
    """Full stage-1 autoencoder."""
    config: ShapeAEConfig

    def setup(self):
        cfg = self.config
        if cfg.encoder == "VN_DGCNN":
            self.encoder = VNDGCNNEncoder(cfg.hidden_dim, cfg.latent_dim,
                                          cfg.layer_num, cfg.num_k)
        elif cfg.encoder == "VN_Resnet":
            self.encoder = VNResnetEncoder(cfg.hidden_dim, cfg.latent_dim,
                                           cfg.layer_num, cfg.num_k)
        else:
            raise ValueError(cfg.encoder)
        self.generator = DecoderInner(cfg.latent_dim, cfg.hidden_dim,
                                      cfg.layer_num, cfg.loss_type)

    def __call__(self, point_clouds: Array, query_points: Array,
                 train: bool = False) -> tuple[Array, Array]:
        z = self.encoder(point_clouds, train=train)
        out = self.generator(query_points, z)
        return z, out

    def encode(self, point_clouds: Array, train: bool = False) -> Array:
        return self.encoder(point_clouds, train=train)

    def decode(self, query_points: Array, z: Array) -> Array:
        return self.generator(query_points, z)


def shape_ae_train_loss(model: PointCloudAE, variables, rng, point_clouds,
                        query_points, values, train: bool = True):
    """MSE on predicted signed distance / occupancy
    (reference get_train_loss, shape_pointcloud_modelAE.py:146-150)."""
    mutable = ["batch_stats"] if train else []
    out, updates = model.apply(variables, point_clouds, query_points,
                               train=train, mutable=mutable)
    _, pred = out
    loss = jnp.mean((pred - values) ** 2)
    return loss, (pred, updates)


def shape_ae_val_metrics(pred: Array, values: Array):
    """Accuracy / recall of the sign at 0.5 threshold
    (reference get_val_loss, shape_pointcloud_modelAE.py:134-144)."""
    loss = jnp.mean((pred - values) ** 2)
    pred_cls = (pred > 0.5).astype(jnp.int32)
    val_cls = values.astype(jnp.int32)
    acc = jnp.mean((pred_cls == val_cls).astype(jnp.float32))
    occ = (val_cls == 1).astype(jnp.float32)
    rec = jnp.sum((pred_cls == val_cls) * occ) / jnp.maximum(jnp.sum(occ), 1.0)
    return loss, acc, rec
