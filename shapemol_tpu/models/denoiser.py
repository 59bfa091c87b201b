"""Shape-conditioned SE(3)-equivariant graph transformer denoiser
("UniTransformer") — TPU-native dense formulation.

Functional parity targets (reference file:line):
  * BaseX2HAttLayer                     — models/uni_transformer.py:16-90
  * BaseH2XAttLayer                     — models/uni_transformer.py:93-162
  * InvariantShapeEmbLayer              — models/uni_transformer.py:176-189
  * EquivariantShapeEmbLayer            — models/uni_transformer.py:165-174
    (constructed but never used by the reference forward — Q3 in SURVEY;
    gated off by default here)
  * AttentionLayerO2TwoUpdateNodeGeneral — models/uni_transformer.py:242-333
  * UniTransformerO2TwoUpdateGeneral    — models/uni_transformer.py:336-540

Architecture redesign (not a translation):
  * PyG ragged edge lists + torch_scatter become fixed-shape (B, N, K)
    neighborhood tensors from `ops.knn.masked_knn`; scatter_softmax becomes a
    masked softmax over the K axis; scatter_sum becomes a masked sum. All ops
    are batched dense matmuls/reductions that XLA tiles onto the MXU, and the
    whole forward is valid inside `lax.scan` (static shapes).
  * The per-block kNN graph rebuild (reference line 499) is one batched
    pairwise-distance matmul + lax.top_k.
  * Masked-softmax rows with zero valid neighbors produce exactly zero
    messages (single-atom molecules / padding), matching the reference's
    ragged semantics.

Shipped-config semantics preserved: edge_feat_dim=0 (one-class edge one-hot
=> outer_product(r_feat, ones) == r_feat), topology layers off
(topo_emb_type='None' — Q4), x2h shape_mode='attention' (shape feature in
keys/values), h2x shape_mode='attention_residue' (VN residual on Δx).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from shapemol_tpu.nn.basic import MLP, GaussianSmearing
from shapemol_tpu.nn.vn import VNLinearLeakyReLU
from shapemol_tpu.ops.knn import masked_knn, gather_neighbors

Array = jax.Array
EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class DenoiserConfig:
    num_blocks: int = 1
    num_layers: int = 8
    hidden_dim: int = 128
    n_heads: int = 16
    knn: int = 8
    num_r_gaussian: int = 20
    edge_feat_dim: int = 0
    num_node_types: int = 8
    act_fn: str = "relu"
    norm: bool = True
    cutoff_mode: str = "knn"            # only knn supported on-device
    ew_net_type: str = "global"         # global | none
    num_x2h: int = 1
    num_h2x: int = 1
    r_max: float = 10.0
    x2h_out_fc: bool = False
    sync_twoup: bool = False
    shape_dim: int = 32
    shape_latent_dim: int = 32
    use_equivariant_shape_layer: bool = False   # reference builds it, never calls it (Q3)
    dtype: str = "float32"              # compute dtype for the hot MLPs


def masked_softmax_k(logits: Array, nbr_mask: Array) -> Array:
    """Softmax over the K (neighbor) axis=2 with invalid entries removed.

    Rows with no valid neighbor yield all-zero weights (zero message), the
    dense analog of scatter_softmax over an empty segment.
    logits: (B, N, K, ...); nbr_mask: (B, N, K) bool.
    """
    m = nbr_mask
    while m.ndim < logits.ndim:
        m = m[..., None]
    neg = jnp.finfo(logits.dtype).min
    masked = jnp.where(m, logits, neg)
    masked = masked - jax.lax.stop_gradient(jnp.max(masked, axis=2, keepdims=True))
    expd = jnp.exp(masked) * m.astype(logits.dtype)
    denom = jnp.sum(expd, axis=2, keepdims=True)
    return expd / jnp.maximum(denom, 1e-20)


class InvariantShapeEmb(nn.Module):
    """Rotation-invariant per-graph shape code: dot products of the latent
    vectors against the (inverse-square-normalized) mean latent direction,
    then an MLP (reference uni_transformer.py:176-189, incl. the
    divide-by-squared-norm quirk)."""
    shape_dim: int
    shape_latent_dim: int
    act_fn: str = "relu"
    norm: bool = True

    @nn.compact
    def __call__(self, shape_h: Array) -> Array:
        """shape_h: (B, S, 3) -> (B, latent)."""
        shape_mean = jnp.mean(shape_h, axis=1)                       # (B,3)
        sq = jnp.sum(shape_mean * shape_mean, axis=-1, keepdims=True)
        direction = shape_mean / (sq + EPS)
        inv = jnp.einsum("bsj,bj->bs", shape_h, direction,
                         preferred_element_type=jnp.float32)
        return MLP(self.shape_latent_dim, self.shape_dim, norm=self.norm,
                   act_fn=self.act_fn, name="hidden_layer")(inv)


class EquivariantShapeEmb(nn.Module):
    """VN map over latent channels (reference uni_transformer.py:165-174).
    Unused by the shipped forward pass; provided for parity/extension."""
    out_channels: int

    @nn.compact
    def __call__(self, shape_h: Array) -> Array:
        return VNLinearLeakyReLU(shape_h.shape[-2], self.out_channels,
                                 name="hidden_layer")(shape_h)


class X2HAttLayer(nn.Module):
    """Scalar-feature update via masked multi-head edge attention."""
    cfg: DenoiserConfig

    @nn.compact
    def __call__(self, h, r_feat, nbr_h, invar_shape, e_w, nbr_mask):
        """h (B,N,H); r_feat (B,N,K,R); nbr_h (B,N,K,H);
        invar_shape (B,N,S'); e_w (B,N,K,1); nbr_mask (B,N,K)."""
        cfg = self.cfg
        B, N, K, _ = r_feat.shape
        heads, hd = cfg.n_heads, cfg.hidden_dim
        d_head = hd // heads

        hi = jnp.broadcast_to(h[:, :, None, :], nbr_h.shape)
        kv_in = jnp.concatenate(
            [r_feat, hi, nbr_h,
             jnp.broadcast_to(invar_shape[:, :, None, :],
                              (B, N, K, invar_shape.shape[-1]))], axis=-1)

        k = MLP(hd, hd, norm=cfg.norm, act_fn=cfg.act_fn, name="hk_func")(kv_in)
        v = MLP(hd, hd, norm=cfg.norm, act_fn=cfg.act_fn, name="hv_func")(kv_in)
        v = v * e_w
        q = MLP(hd, hd, norm=cfg.norm, act_fn=cfg.act_fn, name="hq_func")(h)

        k = k.reshape(B, N, K, heads, d_head)
        v = v.reshape(B, N, K, heads, d_head)
        q = q.reshape(B, N, 1, heads, d_head)

        logits = jnp.sum(q * k, axis=-1) / np.sqrt(d_head)   # (B,N,K,heads)
        alpha = masked_softmax_k(logits, nbr_mask)
        msg = jnp.sum(alpha[..., None] * v, axis=2)          # (B,N,heads,dh)
        msg = msg.reshape(B, N, hd)

        out = jnp.concatenate([msg, h], axis=-1)
        out = MLP(hd, hd, norm=cfg.norm, act_fn=cfg.act_fn,
                  name="node_output")(out)
        return out + h


class H2XAttLayer(nn.Module):
    """Equivariant position update: per-head scalar gates × rel_x, plus a VN
    shape residual over cat(x, messages, shape latent)."""
    cfg: DenoiserConfig

    @nn.compact
    def __call__(self, h, x, rel_x, r_feat, nbr_h, invar_shape, shape_emb,
                 e_w, nbr_mask, node_mask, train: bool):
        cfg = self.cfg
        B, N, K, _ = r_feat.shape
        heads, hd = cfg.n_heads, cfg.hidden_dim
        d_head = hd // heads

        hi = jnp.broadcast_to(h[:, :, None, :], nbr_h.shape)
        kv_in = jnp.concatenate(
            [r_feat, hi, nbr_h,
             jnp.broadcast_to(invar_shape[:, :, None, :],
                              (B, N, K, invar_shape.shape[-1]))], axis=-1)

        k = MLP(hd, hd, norm=cfg.norm, act_fn=cfg.act_fn, name="xk_func")(kv_in)
        v = MLP(heads, hd, norm=cfg.norm, act_fn=cfg.act_fn, name="xv_func")(kv_in)
        v = v * e_w                                            # (B,N,K,heads)
        vv = v[..., None] * rel_x[:, :, :, None, :]            # (B,N,K,heads,3)

        q = MLP(hd, hd, norm=cfg.norm, act_fn=cfg.act_fn, name="xq_func")(h)
        k = k.reshape(B, N, K, heads, d_head)
        q = q.reshape(B, N, 1, heads, d_head)
        logits = jnp.sum(q * k, axis=-1) / np.sqrt(d_head)
        alpha = masked_softmax_k(logits, nbr_mask)
        msg = jnp.sum(alpha[..., None] * vv, axis=2)           # (B,N,heads,3)

        # attention_residue: VN mix of (x, messages, shape latent)
        shp = jnp.broadcast_to(shape_emb[:, None, :, :],
                               (B, N, shape_emb.shape[-2], 3))
        tmp = jnp.concatenate([x[:, :, None, :], msg, shp], axis=-2)
        res = VNLinearLeakyReLU(heads + cfg.shape_dim + 1, heads,
                                name="shape_linear")(
            tmp, mask=node_mask, use_running_average=not train)
        delta = jnp.mean(msg, axis=-2) + jnp.mean(res, axis=-2)  # (B,N,3)
        return delta


class AttentionBlockLayer(nn.Module):
    """One x2h + h2x layer pair with per-layer distance re-expansion
    (reference AttentionLayerO2TwoUpdateNodeGeneral.forward)."""
    cfg: DenoiserConfig

    @nn.compact
    def __call__(self, h, x, idx, nbr_mask, invar_shape, shape_emb, e_w,
                 node_mask, train: bool):
        cfg = self.cfg
        rbf = GaussianSmearing(0.0, cfg.r_max,
                               num_gaussians=cfg.num_r_gaussian,
                               name="distance_expansion")

        nbr_x = gather_neighbors(x, idx)
        rel_x = x[:, :, None, :] - nbr_x                        # dst - src
        dist = jnp.linalg.norm(rel_x + 1e-12, axis=-1)
        nbr_h = gather_neighbors(h, idx)

        h_in = h
        for i in range(cfg.num_x2h):
            r_feat = rbf(dist)
            h_in = X2HAttLayer(cfg, name=f"x2h_{i}")(
                h_in, r_feat, nbr_h if i == 0 else gather_neighbors(h_in, idx),
                invar_shape, e_w, nbr_mask)
        x2h_out = h_in

        new_h = h if cfg.sync_twoup else x2h_out
        nbr_new_h = gather_neighbors(new_h, idx)
        for i in range(cfg.num_h2x):
            r_feat = rbf(dist)
            delta = H2XAttLayer(cfg, name=f"h2x_{i}")(
                new_h, x, rel_x, r_feat, nbr_new_h, invar_shape, shape_emb,
                e_w, nbr_mask, node_mask, train)
            x = x + delta * node_mask[..., None].astype(x.dtype)
            nbr_x = gather_neighbors(x, idx)
            rel_x = x[:, :, None, :] - nbr_x
            dist = jnp.linalg.norm(rel_x + 1e-12, axis=-1)
        return x2h_out, x


class UniTransformer(nn.Module):
    """Full denoiser: per-block kNN rebuild + global edge weights + stacked
    two-update attention layers, with invariant + vector shape conditioning."""
    cfg: DenoiserConfig

    @nn.compact
    def __call__(self, h: Array, x: Array, node_mask: Array,
                 ligand_shape: Array, train: bool = False):
        """h (B,N,H) initial node scalars; x (B,N,3) positions;
        node_mask (B,N) bool; ligand_shape (B,S,3) frozen stage-1 latent.
        Returns (h_final, x_final)."""
        cfg = self.cfg

        invar = InvariantShapeEmb(cfg.shape_dim, cfg.shape_latent_dim,
                                  act_fn=cfg.act_fn, norm=cfg.norm,
                                  name="invariant_shape_layer")(ligand_shape)
        invar = jnp.broadcast_to(invar[:, None, :],
                                 (x.shape[0], x.shape[1], invar.shape[-1]))
        if cfg.use_equivariant_shape_layer:
            _ = EquivariantShapeEmb(cfg.shape_latent_dim // 3,
                                    name="equivariant_shape_layer")(ligand_shape)

        rbf = GaussianSmearing(0.0, cfg.r_max,
                               num_gaussians=cfg.num_r_gaussian,
                               name="distance_expansion")
        # One shared layer stack reused across blocks (the reference's
        # base_block is built once and iterated per block —
        # uni_transformer.py:378,528-529).
        layers = [AttentionBlockLayer(cfg, name=f"layer_{l}")
                  for l in range(cfg.num_layers)]
        edge_pred = (MLP(1, cfg.hidden_dim, name="edge_pred_layer")
                     if cfg.ew_net_type == "global" else None)

        for _b_idx in range(cfg.num_blocks):
            idx, nbr_mask = masked_knn(x, node_mask, cfg.knn)
            if edge_pred is not None:
                nbr_x = gather_neighbors(x, idx)
                dist = jnp.linalg.norm(x[:, :, None, :] - nbr_x + 1e-12,
                                       axis=-1)
                e_w = jax.nn.sigmoid(edge_pred(rbf(dist)))      # (B,N,K,1)
            else:
                e_w = jnp.ones((*idx.shape, 1), x.dtype)
            for layer in layers:
                h, x = layer(h, x, idx, nbr_mask, invar, ligand_shape, e_w,
                             node_mask, train)
        return h, x
