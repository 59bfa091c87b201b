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
from shapemol_tpu.ops.knn import (masked_knn, masked_knn_d,
                                  masked_knn_d_rank, gather_neighbors)

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
    # topology (covalent-graph) conditioning. The reference's topo path is
    # dead code (constructor TypeError + 'None'-string config, SURVEY Q3/Q4);
    # here it is implemented working: num_topo attention layers over the
    # covalent-radius graph produce per-node features appended to the edge
    # keys/values.
    topo_emb_type: str = "none"         # none | topo_layer
    num_topo: int = 1
    cov_k: int = 6                      # max covalent partners per atom
    atom_enc_mode: str = "add_aromatic"
    dtype: str = "float32"              # compute dtype for the hot MLPs
    use_pallas_attention: bool = True   # fused VMEM attention core on TPU
    fuse_layer: bool = True             # whole-layer mega-kernel (applies
                                        # when num_x2h == num_h2x == 1 and
                                        # topology conditioning is off)
    knn_impl: str = "rank"              # rank | argmin: parallel rank-
                                        # select vs serial masked-argmin
                                        # rounds (ops/knn.py, identical
                                        # outputs). rank measured faster
                                        # on-chip: 0.045 vs 0.050 ms/call,
                                        # 1.950 vs 1.973 ms full step
                                        # (tools/bench_knn_step.py, r4)
    attention_impl: str = "indicator"   # indicator | dense. The dense
                                        # masked N x N formulation
                                        # (kernels/dense_layer.py) measured
                                        # SLOWER than the indicator kernel
                                        # (the N^2 row blowup quadruples the
                                        # VPU-bound elementwise work —
                                        # STATUS round 3); kept as an
                                        # ablation/benchmark path


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


def _cdtype(cfg: DenoiserConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def _make_edge_params(mod: nn.Module, d_in: int, hidden: int, r_dim: int,
                      out_v: int, edge_dim: int = 0):
    """Declare the fused edge-block parameter set (layout consumed by
    kernels/edge_block.py; initializers match nn.Dense/LayerNorm defaults).
    edge_dim > 0 adds the per-edge-feature weights (reference
    edge_feat_dim path, uni_transformer.py:31,107)."""
    lecun = nn.initializers.lecun_normal()
    zeros = nn.initializers.zeros
    ones = nn.initializers.ones
    extra = ({"w_edge": mod.param("w_edge", lecun, (edge_dim, 2 * hidden))}
             if edge_dim > 0 else {})
    return {
        **extra,
        "w_dst": mod.param("w_dst", lecun, (d_in, 2 * hidden)),
        "b_dst": mod.param("b_dst", zeros, (2 * hidden,)),
        "w_src": mod.param("w_src", lecun, (hidden, 2 * hidden)),
        "w_rbf": mod.param("w_rbf", lecun, (r_dim, 2 * hidden)),
        "ln_k_scale": mod.param("ln_k_scale", ones, (hidden,)),
        "ln_k_bias": mod.param("ln_k_bias", zeros, (hidden,)),
        "ln_v_scale": mod.param("ln_v_scale", ones, (hidden,)),
        "ln_v_bias": mod.param("ln_v_bias", zeros, (hidden,)),
        "w_out_k": mod.param("w_out_k", lecun, (hidden, hidden)),
        "b_out_k": mod.param("b_out_k", zeros, (hidden,)),
        "w_out_v": mod.param("w_out_v", lecun, (hidden, out_v)),
        "b_out_v": mod.param("b_out_v", zeros, (out_v,)),
    }


class X2HAttLayer(nn.Module):
    """Scalar-feature update via masked multi-head edge attention, executed
    as ONE fused Pallas edge-block kernel on TPU (kernels/edge_block.py)."""
    cfg: DenoiserConfig

    @nn.compact
    def __call__(self, h, x, idx, invar_shape, e_w, nbr_mask,
                 topo=None, edge_attr=None):
        """h (B,N,H); x (B,N,3) positions; idx (B,N,K) neighbor indices;
        invar_shape (B,N,S'); e_w (B,N,K,1); nbr_mask (B,N,K);
        topo (B,N,H) optional per-node topology features;
        edge_attr (B,N,K,E) optional per-edge features."""
        cfg = self.cfg
        heads, hd = cfg.n_heads, cfg.hidden_dim
        dt = _cdtype(cfg)

        dst_parts = [h] + ([topo] if topo is not None else []) + [invar_shape]
        dst_feats = jnp.concatenate(dst_parts, axis=-1)
        params = _make_edge_params(self, dst_feats.shape[-1], hd,
                                   cfg.num_r_gaussian, hd,
                                   edge_dim=cfg.edge_feat_dim)
        q = MLP(hd, hd, norm=cfg.norm, act_fn=cfg.act_fn, dtype=dt,
                name="hq_func")(h.astype(dt)).astype(jnp.float32)

        from shapemol_tpu.kernels.edge_block import edge_block
        msg = edge_block(params, x, dst_feats, h, q, idx, e_w,
                         nbr_mask, heads, "x2h",
                         num_rbf=cfg.num_r_gaussian, r_max=cfg.r_max,
                         use_pallas=cfg.use_pallas_attention,
                         mm_dtype=cfg.dtype, edge_attr=edge_attr)

        out = jnp.concatenate([msg.astype(dt), h.astype(dt)], axis=-1)
        out = MLP(hd, hd, norm=cfg.norm, act_fn=cfg.act_fn, dtype=dt,
                  name="node_output")(out)
        return out.astype(jnp.float32) + h


class H2XAttLayer(nn.Module):
    """Equivariant position update: per-head scalar gates × rel_x, plus a VN
    shape residual over cat(x, messages, shape latent)."""
    cfg: DenoiserConfig

    @nn.compact
    def __call__(self, h, x, idx, invar_shape, shape_emb,
                 e_w, nbr_mask, node_mask, train: bool, topo=None,
                 edge_attr=None):
        cfg = self.cfg
        B, N = h.shape[:2]
        heads, hd = cfg.n_heads, cfg.hidden_dim
        dt = _cdtype(cfg)

        dst_parts = [h] + ([topo] if topo is not None else []) + [invar_shape]
        dst_feats = jnp.concatenate(dst_parts, axis=-1)
        params = _make_edge_params(self, dst_feats.shape[-1], hd,
                                   cfg.num_r_gaussian, heads,
                                   edge_dim=cfg.edge_feat_dim)
        q = MLP(hd, hd, norm=cfg.norm, act_fn=cfg.act_fn, dtype=dt,
                name="xq_func")(h.astype(dt)).astype(jnp.float32)

        # one fused kernel: geometry/RBF, edge MLP, softmax, the narrow
        # per-head gates and the rel_x contraction all stay on-chip
        from shapemol_tpu.kernels.edge_block import edge_block
        msg = edge_block(params, x, dst_feats, h, q, idx, e_w,
                         nbr_mask, heads, "h2x",
                         num_rbf=cfg.num_r_gaussian, r_max=cfg.r_max,
                         use_pallas=cfg.use_pallas_attention,
                         mm_dtype=cfg.dtype, edge_attr=edge_attr)
        # (B,N,heads,3) float32

        # attention_residue: VN mix of (x, messages, shape latent)
        shp = jnp.broadcast_to(shape_emb[:, None, :, :],
                               (B, N, shape_emb.shape[-2], 3))
        tmp = jnp.concatenate([x[:, :, None, :], msg, shp], axis=-2)
        res = VNLinearLeakyReLU(heads + cfg.shape_dim + 1, heads,
                                name="shape_linear")(
            tmp, mask=node_mask, use_running_average=not train)
        delta = jnp.mean(msg, axis=-2) + jnp.mean(res, axis=-2)  # (B,N,3)
        return delta


class TopoLayer(nn.Module):
    """Covalent-graph attention producing per-node topology features
    (reference BaseTopoLayer, uni_transformer.py:191-240: k/v from edge
    features, masked softmax over covalent partners, output MLP on
    cat(msg, h) — no residual)."""
    cfg: DenoiserConfig

    @nn.compact
    def __call__(self, h, x, idx, e_w, nbr_mask):
        cfg = self.cfg
        heads, hd = cfg.n_heads, cfg.hidden_dim
        dt = _cdtype(cfg)

        params = _make_edge_params(self, hd, hd, cfg.num_r_gaussian, hd)
        q = MLP(hd, hd, norm=cfg.norm, act_fn=cfg.act_fn, dtype=dt,
                name="xq_func")(h.astype(dt)).astype(jnp.float32)
        from shapemol_tpu.kernels.edge_block import edge_block
        msg = edge_block(params, x, h, h, q, idx, e_w, nbr_mask,
                         heads, "x2h", num_rbf=cfg.num_r_gaussian,
                         r_max=cfg.r_max,
                         use_pallas=cfg.use_pallas_attention,
                         mm_dtype=cfg.dtype)
        out = jnp.concatenate([msg.astype(dt), h.astype(dt)], axis=-1)
        out = MLP(hd, hd, norm=cfg.norm, act_fn=cfg.act_fn, dtype=dt,
                  name="topo_output")(out)
        return out.astype(jnp.float32)


class _EdgeParamHolder(nn.Module):
    """Scopes one fused edge-block parameter set under this module's name."""
    d_in: int
    hidden: int
    r_dim: int
    out_v: int

    @nn.compact
    def __call__(self):
        return _make_edge_params(self, self.d_in, self.hidden, self.r_dim,
                                 self.out_v)


class _MLPParamHolder(nn.Module):
    """Raw params of a 2-layer MLP (dense -> LN -> relu -> dense), layout
    consumed by kernels/fused_layer.py."""
    d_in: int
    hidden: int
    d_out: int

    @nn.compact
    def __call__(self):
        lecun = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros
        ones = nn.initializers.ones
        return {
            "w0": self.param("w0", lecun, (self.d_in, self.hidden)),
            "b0": self.param("b0", zeros, (self.hidden,)),
            "ln_s": self.param("ln_s", ones, (self.hidden,)),
            "ln_b": self.param("ln_b", zeros, (self.hidden,)),
            "w1": self.param("w1", lecun, (self.hidden, self.d_out)),
            "b1": self.param("b1", zeros, (self.d_out,)),
        }


class FusedAttentionLayer(nn.Module):
    """Whole-layer path: x2h attention + node MLP + residual + h2x attention
    in ONE Pallas kernel (kernels/fused_layer.py); only the VN shape
    residual of the position update runs outside."""
    cfg: DenoiserConfig

    @nn.compact
    def __call__(self, h, x, idx, nbr_mask, invar_shape, shape_emb, e_w,
                 node_mask, train: bool):
        cfg = self.cfg
        heads, hd = cfg.n_heads, cfg.hidden_dim
        B, N = h.shape[:2]
        d_dst = hd + invar_shape.shape[-1]
        params = {
            "hq": _MLPParamHolder(hd, hd, hd, name="hq_func")(),
            "x2h": _EdgeParamHolder(d_dst, hd, cfg.num_r_gaussian, hd,
                                    name="x2h_0")(),
            "node_output": _MLPParamHolder(2 * hd, hd, hd,
                                           name="node_output")(),
            "xq": _MLPParamHolder(hd, hd, hd, name="xq_func")(),
            "h2x": _EdgeParamHolder(d_dst, hd, cfg.num_r_gaussian, heads,
                                    name="h2x_0")(),
        }
        if cfg.attention_impl == "dense":
            from shapemol_tpu.kernels.dense_layer import dense_layer as _fl
        else:
            from shapemol_tpu.kernels.fused_layer import fused_layer as _fl
        h_new, msg = _fl(params, x, h, invar_shape, idx, e_w,
                         nbr_mask, heads,
                         num_rbf=cfg.num_r_gaussian, r_max=cfg.r_max,
                         mm_dtype=cfg.dtype,
                         use_pallas=cfg.use_pallas_attention)

        # attention_residue: VN mix of (x, messages, shape latent)
        shp = jnp.broadcast_to(shape_emb[:, None, :, :],
                               (B, N, shape_emb.shape[-2], 3))
        tmp = jnp.concatenate([x[:, :, None, :], msg, shp], axis=-2)
        res = VNLinearLeakyReLU(heads + cfg.shape_dim + 1, heads,
                                name="shape_linear")(
            tmp, mask=node_mask, use_running_average=not train)
        delta = jnp.mean(msg, axis=-2) + jnp.mean(res, axis=-2)
        x = x + delta * node_mask[..., None].astype(x.dtype)
        return h_new, x


class AttentionBlockLayer(nn.Module):
    """One x2h + h2x layer pair with per-layer distance re-expansion
    (reference AttentionLayerO2TwoUpdateNodeGeneral.forward)."""
    cfg: DenoiserConfig

    @nn.compact
    def __call__(self, h, x, idx, nbr_mask, invar_shape, shape_emb, e_w,
                 node_mask, train: bool, topo=None, edge_attr=None):
        # neighbor geometry + RBF expansion happen INSIDE the fused edge
        # kernels (kernels/edge_block.py) from (x, idx); x is constant
        # through the x2h stack and entering the first h2x iteration, and
        # each layer recomputes rel_x from the current x exactly like the
        # reference (uni_transformer.py:301,328)
        cfg = self.cfg
        if (cfg.fuse_layer and cfg.num_x2h == 1 and cfg.num_h2x == 1
                and topo is None and edge_attr is None
                and not cfg.sync_twoup):
            return FusedAttentionLayer(cfg, name="fused")(
                h, x, idx, nbr_mask, invar_shape, shape_emb, e_w,
                node_mask, train)
        h_in = h
        for i in range(cfg.num_x2h):
            h_in = X2HAttLayer(cfg, name=f"x2h_{i}")(
                h_in, x, idx, invar_shape, e_w, nbr_mask, topo=topo,
                edge_attr=edge_attr)
        x2h_out = h_in

        new_h = h if cfg.sync_twoup else x2h_out
        for i in range(cfg.num_h2x):
            delta = H2XAttLayer(cfg, name=f"h2x_{i}")(
                new_h, x, idx, invar_shape, shape_emb,
                e_w, nbr_mask, node_mask, train, topo=topo,
                edge_attr=edge_attr)
            x = x + delta * node_mask[..., None].astype(x.dtype)
        return x2h_out, x


class UniTransformer(nn.Module):
    """Full denoiser: per-block kNN rebuild + global edge weights + stacked
    two-update attention layers, with invariant + vector shape conditioning."""
    cfg: DenoiserConfig

    @nn.compact
    def __call__(self, h: Array, x: Array, node_mask: Array,
                 ligand_shape: Array, train: bool = False,
                 v: Array | None = None):
        """h (B,N,H) initial node scalars; x (B,N,3) positions;
        node_mask (B,N) bool; ligand_shape (B,S,3) frozen stage-1 latent;
        v (B,N) atom-type class indices — required for the covalent-radius
        graph (cutoff_mode='cov_radius' / topo_emb_type='topo_layer').
        Returns (h_final, x_final)."""
        cfg = self.cfg
        needs_cov = (cfg.cutoff_mode == "cov_radius"
                     or cfg.topo_emb_type == "topo_layer"
                     or (cfg.edge_feat_dim > 1
                         and cfg.topo_emb_type == "topo_attr"))
        if needs_cov and v is None:
            raise ValueError("covalent graph requires atom-type indices v")
        radii_table = None
        if needs_cov:
            from shapemol_tpu.ops.covalent import (class_covalent_radii,
                                                   covalent_knn)
            radii_table = jnp.asarray(
                class_covalent_radii(cfg.atom_enc_mode))

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
        topo_layers = [TopoLayer(cfg, name=f"topo_{l}")
                       for l in range(cfg.num_topo)] \
            if cfg.topo_emb_type == "topo_layer" else []

        def pred_ew(x_, idx_, d_=None):
            if edge_pred is None:
                return jnp.ones((*idx_.shape, 1), x_.dtype)
            if d_ is None:
                nbr = gather_neighbors(x_, idx_)
                d_ = jnp.linalg.norm(x_[:, :, None, :] - nbr + 1e-12,
                                     axis=-1)
            return jax.nn.sigmoid(edge_pred(rbf(d_)))

        for _b_idx in range(cfg.num_blocks):
            if cfg.cutoff_mode == "knn":
                # masked_knn_d returns the selected-neighbor distances as a
                # byproduct of the argmin rounds, so the global edge-weight
                # MLP skips its (B,N,K,3) gather + difference-norm
                # (reference recomputes that geometry at
                # uni_transformer.py:475-481 — VERDICT r3 item 5)
                knn_fn = (masked_knn_d_rank if cfg.knn_impl == "rank"
                          else masked_knn_d)
                idx, nbr_mask, d_sel = knn_fn(x, node_mask, cfg.knn)
            elif cfg.cutoff_mode == "cov_radius":
                idx, nbr_mask = covalent_knn(x, v, node_mask, radii_table,
                                             cfg.cov_k)
                d_sel = None
            else:
                raise ValueError(f"unsupported cutoff_mode: {cfg.cutoff_mode}")
            e_w = pred_ew(x, idx, d_sel)

            edge_attr = None
            if cfg.edge_feat_dim > 0:
                # reference _build_edge_type (uni_transformer.py:426-434):
                # one-hot(1) constant normally; with topo_emb_type
                # 'topo_attr', class 1 marks kNN edges that are also
                # covalent (distance < r_cov_i + r_cov_j + 0.2 Å —
                # utils/covalent_graph.py:7-19)
                if cfg.edge_feat_dim == 1:
                    edge_attr = jnp.ones((*idx.shape, 1), x.dtype)
                else:
                    r_at = radii_table[v]                       # (B,N)
                    nbr_x = gather_neighbors(x, idx)
                    d = jnp.linalg.norm(x[:, :, None, :] - nbr_x + 1e-12,
                                        axis=-1)
                    r_j = jnp.take_along_axis(r_at[:, None, :].repeat(
                        idx.shape[1], 1), idx, axis=2)
                    cov = ((d < r_at[:, :, None] + r_j + 0.2)
                           & nbr_mask).astype(jnp.int32)
                    edge_attr = jax.nn.one_hot(cov, cfg.edge_feat_dim,
                                               dtype=x.dtype)

            topo = None
            if topo_layers:
                cov_idx, cov_mask = covalent_knn(x, v, node_mask,
                                                 radii_table, cfg.cov_k)
                cov_ew = pred_ew(x, cov_idx)
                t_in = h
                for tl in topo_layers:
                    t_in = tl(t_in, x, cov_idx, cov_ew, cov_mask)
                topo = t_in

            for layer in layers:
                h, x = layer(h, x, idx, nbr_mask, invar, ligand_shape, e_w,
                             node_mask, train, topo=topo,
                             edge_attr=edge_attr)
        return h, x
