"""Shape-conditioned joint diffusion model over atom positions (Gaussian) and
atom types (categorical), denoised by the UniTransformer.

Functional parity target: ScorePosNet3D (reference
models/molopt_score_model.py:169-531): time embedding + atom embedding +
refine net + v_inference head; x0-parameterization ('C0'); SNR-clipped
position loss weights; categorical KL loss with decoder-NLL at t=0;
classifier-free-guidance conditioning dropout.

Dense-batch layout everywhere: pos (B,N,3), v (B,N) int, node_mask (B,N),
ligand_shape (B,S,3), t (B,).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from shapemol_tpu.models import diffusion as dfn
from shapemol_tpu.models.denoiser import DenoiserConfig, UniTransformer
from shapemol_tpu.nn.basic import TimeEmbedding, shifted_softplus

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ScoreModelConfig:
    # diffusion
    num_diffusion_timesteps: int = 1000
    schedule_pos: Dict[str, Any] = dataclasses.field(default_factory=lambda: dict(
        beta_schedule="sigmoid", beta_start=1e-7, beta_end=0.01, s=6))
    schedule_v: Dict[str, Any] = dataclasses.field(default_factory=lambda: dict(
        beta_schedule="cosine", s=0.01))
    v_mode: str = "uniform"              # uniform | tomask
    loss_v_weight: float = 100.0
    loss_weight_type: str = "noise_level"  # noise_level | uniform
    # auxiliary bonded-distance loss (geometry shaping; 0 = off). Goes
    # beyond the reference's noise_level|uniform weighting
    # (molopt_score_model.py:196-198,504-515) to attack the
    # stability<->geometry tension measured in r4 (STATUS_r4).
    loss_geom_weight: float = 0.0
    geom_weight_mode: str = "alpha_bar"  # alpha_bar | uniform
    loss_pos_min_weight: float = 0.0
    loss_pos_max_weight: float = 10.0
    sample_time_method: str = "symmetric"
    center_pos_mode: str = "none"        # none | center
    cond_mask_prob: float = 0.0
    # network
    num_classes: int = 15                # add_aromatic vocabulary
    time_emb_dim: int = 8
    hidden_dim: int = 128
    v_net_type: str = "mlp"
    denoiser: DenoiserConfig = dataclasses.field(default_factory=DenoiserConfig)

    @property
    def num_net_classes(self) -> int:
        """Input/output class count (adds the mask class for tomask)."""
        return self.num_classes + int(self.v_mode == "tomask")

    def make_schedule(self) -> dfn.DiffusionSchedule:
        return dfn.make_schedule(
            self.schedule_pos, self.schedule_v, self.num_diffusion_timesteps,
            num_classes=self.num_classes, v_mode=self.v_mode,
            loss_pos_min_weight=self.loss_pos_min_weight,
            loss_pos_max_weight=self.loss_pos_max_weight)


class ShapeDiffusionNet(nn.Module):
    """The neural denoiser f(x_t, v_t, t, shape) -> (x0_pred, v0_logits)."""
    cfg: ScoreModelConfig

    @nn.compact
    def __call__(self, pos_t: Array, v_t: Array, node_mask: Array,
                 ligand_shape: Array, t: Array, train: bool = False):
        cfg = self.cfg
        K = cfg.num_net_classes
        v_onehot = jax.nn.one_hot(v_t, K, dtype=jnp.float32)   # (B,N,K)

        if cfg.time_emb_dim > 0:
            time_feat = TimeEmbedding(cfg.time_emb_dim, name="time_emb")(t)
            time_feat = jnp.broadcast_to(
                time_feat[:, None, :],
                (*v_onehot.shape[:2], cfg.time_emb_dim))
            feat = jnp.concatenate([v_onehot, time_feat], axis=-1)
        else:
            feat = v_onehot
        h = nn.Dense(cfg.hidden_dim, name="ligand_atom_emb")(feat)
        h = h * node_mask[..., None].astype(h.dtype)

        h_final, x_final = UniTransformer(cfg.denoiser, name="refine_net")(
            h, pos_t, node_mask, ligand_shape, train=train, v=v_t)

        if cfg.v_net_type == "mlp":
            v = nn.Dense(cfg.hidden_dim, name="v_inf_0")(h_final)
            v = shifted_softplus(v)
            v_logits = nn.Dense(K, name="v_inf_1")(v)
        elif cfg.v_net_type == "attention":
            # Attention read-out head (reference molopt_score_model.py:
            # 267-280 constructs vk/vv/vq + a 2*hidden head but its forward
            # never wires them — another dead path; implemented working
            # here): one more masked edge-attention pass over the FINAL
            # geometry, context concatenated with h before the classifier.
            from shapemol_tpu.kernels.edge_attention import x2h_attention
            from shapemol_tpu.nn.basic import MLP, GaussianSmearing
            from shapemol_tpu.ops.knn import masked_knn, gather_neighbors
            dcfg = cfg.denoiser
            idx, nbr_mask = masked_knn(x_final, node_mask, dcfg.knn)
            nbr_x = gather_neighbors(x_final, idx)
            dist = jnp.linalg.norm(x_final[:, :, None, :] - nbr_x + 1e-12,
                                   axis=-1)
            rbf = GaussianSmearing(0.0, 10.0,
                                   num_gaussians=dcfg.num_r_gaussian,
                                   name="v_distance_expansion")(dist)
            hi = jnp.broadcast_to(h_final[:, :, None, :],
                                  (*idx.shape, cfg.hidden_dim))
            hj = gather_neighbors(h_final, idx)
            kv_in = jnp.concatenate([rbf, hi, hj], axis=-1)
            k_att = MLP(cfg.hidden_dim, cfg.hidden_dim, name="vk_func")(kv_in)
            v_att = MLP(cfg.hidden_dim, cfg.hidden_dim, name="vv_func")(kv_in)
            q_att = MLP(cfg.hidden_dim, cfg.hidden_dim,
                        name="vq_func")(h_final)
            e_w1 = jnp.ones((*idx.shape, 1), h_final.dtype)
            ctx = x2h_attention(q_att, k_att, v_att, e_w1, nbr_mask,
                                n_heads=16,
                                use_pallas=dcfg.use_pallas_attention)
            v = nn.Dense(cfg.hidden_dim, name="v_inf_0")(
                jnp.concatenate([ctx, h_final], axis=-1))
            v = shifted_softplus(v)
            v_logits = nn.Dense(K, name="v_inf_1")(v)
        else:
            raise NotImplementedError(cfg.v_net_type)

        return {"pred_ligand_pos": x_final, "pred_ligand_v": v_logits,
                "pred_ligand_h": h_final}


def center_pos(pos: Array, node_mask: Array, mode: str):
    """Optionally center each molecule at its masked centroid
    (reference molopt_score_model.py:52-60)."""
    if mode == "none":
        return pos, jnp.zeros((pos.shape[0], 3), pos.dtype)
    if mode == "center":
        m = node_mask[..., None].astype(pos.dtype)
        offset = jnp.sum(pos * m, axis=1) / jnp.maximum(
            jnp.sum(m, axis=1), 1.0)
        return pos - offset[:, None, :], offset
    raise NotImplementedError(mode)


def masked_graph_mean(x: Array, node_mask: Array) -> Array:
    """Per-graph mean over valid nodes: (B, N) -> (B,). Dense analog of
    scatter_mean over the batch index vector."""
    m = node_mask.astype(x.dtype)
    return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


def diffusion_loss(net: ShapeDiffusionNet, sched: dfn.DiffusionSchedule,
                   variables, rng: Array, pos0: Array, v0: Array,
                   node_mask: Array, ligand_shape: Array,
                   t: Array | None = None, train: bool = True,
                   cond_mask_prob: float | None = None):
    """Joint diffusion loss (reference get_diffusion_loss,
    molopt_score_model.py:447-531).

    Returns (loss, aux) where aux carries the components and any mutated
    batch_stats. All reductions are masked per-graph means, matching the
    reference's scatter_mean-per-graph + mean-over-graphs structure.
    """
    cfg = net.cfg
    B = pos0.shape[0]
    rng_t, rng_pos, rng_v, rng_cond = jax.random.split(rng, 4)

    pos0, _ = center_pos(pos0, node_mask, cfg.center_pos_mode)

    if t is None:
        t = dfn.sample_time_symmetric(rng_t, B, sched.num_timesteps)

    # perturb positions
    pos_t, _ = dfn.q_pos_sample(sched, rng_pos, pos0, t)
    # perturb types
    Knet = cfg.num_net_classes
    log_v0 = dfn.index_to_log_onehot(v0, Knet)
    v_t, log_vt = dfn.q_v_sample(sched, rng_v, log_v0, t, Knet)

    # CFG conditioning dropout (zero out the shape latent per graph)
    p_drop = cfg.cond_mask_prob if cond_mask_prob is None else cond_mask_prob
    if train and p_drop > 0:
        keep = jax.random.bernoulli(rng_cond, 1.0 - p_drop, (B, 1, 1))
        ligand_shape = ligand_shape * keep.astype(ligand_shape.dtype)

    mutable = ["batch_stats"] if train else []
    preds, updates = net.apply(variables, pos_t, v_t, node_mask, ligand_shape,
                               t, train=train, mutable=mutable)

    pred_pos, pred_v = preds["pred_ligand_pos"], preds["pred_ligand_v"]

    # ---- type loss: KL(q(v_{t-1}|v_t,v0) || p(v_{t-1}|v_t)) with decoder
    # NLL at t=0 (compute_v_Lt, reference 438-445)
    log_v_recon = jax.nn.log_softmax(pred_v, axis=-1)
    log_v_model_prob = dfn.q_v_posterior(sched, log_v_recon, log_vt, t)
    log_v_true_prob = dfn.q_v_posterior(sched, log_v0, log_vt, t)
    kl_v = dfn.categorical_kl(log_v_true_prob, log_v_model_prob)   # (B,N)
    nll_v = -dfn.log_categorical(log_v0, log_v_model_prob)
    t0_mask = (t == 0).astype(jnp.float32)[:, None]
    loss_v_graph = masked_graph_mean(t0_mask * nll_v + (1 - t0_mask) * kl_v,
                                     node_mask)
    loss_v = jnp.mean(loss_v_graph)

    # ---- position loss: per-graph mean squared distance, SNR-weighted
    sq = jnp.sum((pred_pos - pos0) ** 2, axis=-1)                  # (B,N)
    loss_pos_graph = masked_graph_mean(sq, node_mask)
    if cfg.loss_weight_type == "noise_level":
        w = sched.loss_pos_step_weight[t]
        loss_pos = jnp.mean(w * loss_pos_graph)
    else:
        loss_pos = jnp.mean(loss_pos_graph)

    loss = loss_pos + loss_v * cfg.loss_v_weight

    # ---- auxiliary bonded-distance loss (train-time geometry shaping).
    # Penalizes the PREDICTED length of each covalent bond of the clean
    # molecule against its true length. The pairwise-distance form is
    # invariant to the global-frame wobble that inflates plain x0 MSE, so
    # it targets exactly the stiff local geometry the CC-2A JSD measures
    # without smoothing the whole coordinate distribution (the shared
    # failure mode of the r4 data-side levers). alpha_bar weighting
    # concentrates the term at low noise, where bond lengths are decided.
    loss_geom = None
    if cfg.loss_geom_weight > 0:
        from shapemol_tpu.ops.covalent import COV_MARGIN, class_covalent_radii
        from shapemol_tpu.ops.knn import pairwise_sqdist
        radii = jnp.asarray(class_covalent_radii(cfg.denoiser.atom_enc_mode))
        r = radii[jnp.clip(v0, 0, radii.shape[0] - 1)]        # (B,N)
        thresh = r[:, :, None] + r[:, None, :] + COV_MARGIN
        N = pos0.shape[1]
        eye = jnp.eye(N, dtype=bool)[None]
        nm = node_mask.astype(bool)
        valid = nm[:, :, None] & nm[:, None, :] & ~eye
        d0_sq = pairwise_sqdist(pos0)
        bonded = ((d0_sq < thresh * thresh) & valid).astype(pos0.dtype)
        eps = 1e-12
        d0 = jnp.sqrt(d0_sq + eps)
        dp = jnp.sqrt(pairwise_sqdist(pred_pos) + eps)
        err = (dp - d0) ** 2 * bonded
        geom_graph = (jnp.sum(err, axis=(1, 2))
                      / jnp.maximum(jnp.sum(bonded, axis=(1, 2)), 1.0))
        if cfg.geom_weight_mode == "alpha_bar":
            geom_graph = sched.alphas_cumprod[t] * geom_graph
        elif cfg.geom_weight_mode != "uniform":
            raise NotImplementedError(cfg.geom_weight_mode)
        loss_geom = jnp.mean(geom_graph)
        loss = loss + cfg.loss_geom_weight * loss_geom

    aux = {"loss_pos": loss_pos, "loss_v": loss_v, "loss": loss,
           "t": t, "pred_ligand_pos": pred_pos, "pred_ligand_v": pred_v,
           "updates": updates}
    if loss_geom is not None:
        aux["loss_geom"] = loss_geom
    return loss, aux


# --------------------------------------------------------------------------
# Variational-bound terms (reference molopt_score_model.py:387-445):
# the shipped configs train with the simple MSE objective above, but the
# KL formulation (loss_pos_type='kl') and the prior terms are part of the
# reference API surface.
# --------------------------------------------------------------------------

def compute_pos_Lt(sched: dfn.DiffusionSchedule, pos_model_mean, x0, xt, t,
                   node_mask):
    """Per-graph KL(q(x_{t-1}|x_t,x_0) || p) in bits, with the decoder NLL
    at t=0 (reference compute_pos_Lt, molopt_score_model.py:424-436)."""
    logvar = dfn.extract(sched.posterior_logvar, t, x0.ndim)
    true_mean = dfn.q_pos_posterior(sched, x0, xt, t)
    kl = dfn.normal_kl(true_mean, logvar, pos_model_mean, logvar) / jnp.log(2.0)
    var = jnp.exp(logvar)
    log_prob = (-((x0 - pos_model_mean) ** 2) / (2 * var)
                - 0.5 * logvar - 0.5 * jnp.log(2 * jnp.pi))
    nll = -log_prob.sum(-1)
    t0 = (t == 0).astype(jnp.float32)[:, None]
    return masked_graph_mean(t0 * nll + (1 - t0) * kl, node_mask)


def kl_pos_prior(sched: dfn.DiffusionSchedule, rng, pos0, node_mask):
    """Terminal-prior mismatch for positions (reference kl_pos_prior,
    molopt_score_model.py:406-414)."""
    T = sched.num_timesteps
    t = jnp.full((pos0.shape[0],), T - 1, jnp.int32)
    r1, r2 = jax.random.split(rng)
    pos_T, _ = dfn.q_pos_sample(sched, r1, pos0, t)
    prior = jax.random.normal(r2, pos_T.shape)
    sq = jnp.sum((pos_T - prior) ** 2, axis=-1)
    return jnp.mean(masked_graph_mean(sq, node_mask)) / 3.0


def kl_v_prior(sched: dfn.DiffusionSchedule, log_v0, node_mask):
    """KL between q(v_T|v_0) and the uniform terminal distribution
    (reference kl_v_prior, molopt_score_model.py:387-393)."""
    T = sched.num_timesteps
    t = jnp.full((log_v0.shape[0],), T - 1, jnp.int32)
    log_qvT = dfn.q_v_pred(sched, log_v0, t)
    log_uniform = jnp.full_like(log_qvT, -jnp.log(float(sched.num_classes)))
    kl = dfn.categorical_kl(log_qvT, log_uniform)
    return masked_graph_mean(kl, node_mask)
