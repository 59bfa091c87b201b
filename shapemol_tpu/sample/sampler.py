"""Ancestral sampling for the shape-conditioned diffusion model.

The entire reverse process runs as ONE `lax.scan` under a single `jit` —
including classifier-free guidance, thresholding, bound clamping and shape
guidance. The reference executes a 1000-iteration Python loop with per-step
device-to-host copies and host-side KDTree guidance
(molopt_score_model.py:533-697,699-775); here every step stays on-chip.

Functional parity targets:
  * sample_diffusion            — molopt_score_model.py:533-697
  * threshold_CFG + variants    — molopt_score_model.py:117-151
  * pointcloud_shape_guidance   — molopt_score_model.py:699-740 (on-device
    brute-force kNN against the 512-point conditioning cloud)
  * mesh_shape_guidance         — molopt_score_model.py:742-775, reformulated
    as a signed-distance-grid projection (host trimesh.contains round-trips
    are replaced by trilinear SDF lookups — a deliberate TPU-native redesign)

The reference's CFG branch calls the network with nonexistent kwargs and is
dead in the shipped configs (SURVEY Q3); this implementation is the corrected
two-pass CFG.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from shapemol_tpu.models import diffusion as dfn

Array = jax.Array


# --------------------------------------------------------------------------
# Thresholding (reference molopt_score_model.py:117-151)
# --------------------------------------------------------------------------

def dynamic_threshold(x0: Array, p: float) -> Array:
    s = jnp.quantile(x0, p)
    return jnp.clip(x0, -s, s)


def reference_threshold(x0: Array, x0_cond: Array, p: float) -> Array:
    s = jnp.max(jnp.abs(x0_cond)) * p
    return jnp.clip(x0, -s, s)


def rescale(x0: Array, x0_cond: Array, p: float) -> Array:
    ratio = jnp.std(x0_cond) / jnp.std(x0)
    return p * (x0 * ratio) + (1 - p) * x0


def threshold_cfg(x0: Array, x0_cond: Array, threshold_type: Optional[str],
                  threshold_args: Optional[Dict[str, Any]],
                  bounds: Optional[Array] = None) -> Array:
    """Apply a CFG thresholding strategy, then per-coordinate bound clamping.

    bounds: (B, 3, 2) per-graph [min, max] per coordinate (from the mesh
    bounding box), or None. Statistics are global over the batch tensor,
    matching the reference.
    """
    args = threshold_args or {}
    if threshold_type == "reference_threshold":
        x0 = reference_threshold(x0, x0_cond, args.get("p", 1.1))
    elif threshold_type == "dynamic_threshold":
        x0 = dynamic_threshold(x0, args.get("p", 0.995))
    elif threshold_type == "rescale":
        x0 = rescale(x0, x0_cond, args.get("p", 0.7))
    elif threshold_type is not None:
        raise ValueError(f"undefined thresholding strategy: {threshold_type}")
    if bounds is not None:
        lo = bounds[:, None, :, 0]          # (B,1,3)
        hi = bounds[:, None, :, 1]
        x0 = jnp.clip(x0, lo, hi)
    return x0


# --------------------------------------------------------------------------
# On-device shape guidance
# --------------------------------------------------------------------------

def pointcloud_guidance(rng: Array, pred_pos: Array, cloud: Array,
                        node_mask: Array, radius: float, k: int = 3,
                        ratio: float = 0.2, num_iters: int = 5) -> Array:
    """Pull atoms that drifted off the conditioning surface back toward it.

    pred_pos: (B, N, 3); cloud: (B, P, 3) surface point cloud. An atom is
    "far" when the mean distance to its k nearest cloud points exceeds
    `radius`; it is moved a random fraction of the way toward the mean of
    those points, iterating up to num_iters (statically unrolled). After the
    final iteration, still-far atoms keep their last proposed move — exactly
    the reference's j==5 fallback (molopt_score_model.py:733-735).
    """
    def knn_mean(pos):
        d2 = (jnp.sum(pos * pos, axis=-1, keepdims=True)
              - 2 * jnp.einsum("bnd,bpd->bnp", pos, cloud,
                               preferred_element_type=jnp.float32)
              + jnp.sum(cloud * cloud, axis=-1)[:, None, :])
        # k iterative masked-argmin rounds instead of lax.top_k + gather:
        # the sort over P(~960) lanes and the (B,N,k,3) gather dominate the
        # guided-step cost; each round here is a lane-min reduce plus a
        # onehot @ cloud batched matmul (MXU). Lowest-index tie-break ==
        # stable-sort top_k selection.
        P = d2.shape[-1]
        iota = jnp.arange(P, dtype=jnp.int32)
        d_sum = 0.0
        near_sum = 0.0
        denom = 0.0
        dd = d2
        # finite sentinel (not jnp.inf): if k >= P every entry would become
        # inf and dmin/near_mean would silently go inf/NaN; with _BIG the
        # `ok` guard drops exhausted rounds from the averages instead
        # (same construction as ops/knn.py).
        _BIG = 1e10
        for r in range(k):
            dmin = jnp.min(dd, axis=-1, keepdims=True)            # (B,N,1)
            ok = (dmin[..., 0] < _BIG / 2).astype(jnp.float32)     # (B,N)
            # Round 0 always counts: nothing has been masked yet, so dmin
            # is the atom's true nearest-point distance. Gating it on
            # magnitude would classify a wildly diverged atom (d^2 >=
            # _BIG/2) as mean_d=0 "converged" and freeze it instead of
            # pulling it back toward the cloud.
            if r == 0:
                ok = jnp.ones_like(ok)
            j_star = jnp.min(jnp.where(dd == dmin, iota, P), axis=-1,
                             keepdims=True)                        # (B,N,1)
            onehot = ((iota == j_star).astype(jnp.float32)
                      * ok[..., None])                             # (B,N,P)
            d_sum += ok * jnp.sqrt(jnp.maximum(dmin[..., 0], 0.0))
            near_sum += jnp.einsum("bnp,bpd->bnd", onehot, cloud,
                                   preferred_element_type=jnp.float32)
            denom += ok
            dd = jnp.where(onehot > 0, _BIG, dd)
        denom = jnp.maximum(denom, 1.0)
        return d_sum / denom, near_sum / denom[..., None]

    # one kNN evaluation per iteration, exactly the reference's loop
    # structure (molopt_score_model.py:715-731): each move uses the
    # neighbor set from the PREVIOUS query, and the post-move query both
    # checks convergence and supplies the next move's neighbors (was
    # 2 evals/iter + 1 = 11; now num_iters + 1 = 6 — the guidance cost
    # is ~all kNN, so this is ~45% off the guided-step overhead).
    pos = pred_pos
    mean_d, nearest_mean = knn_mean(pos)
    far = (mean_d > radius) & node_mask                                # (B,N)
    for it in range(num_iters):
        rng, sub = jax.random.split(rng)
        scal = jax.random.uniform(sub, mean_d.shape) * (0.8 - ratio) + ratio
        proposal = pos - scal[..., None] * (pos - nearest_mean)
        pos = jnp.where(far[..., None], proposal, pos)
        mean_d, nearest_mean = knn_mean(pos)
        far = far & (mean_d > radius)      # converged atoms stop moving
    return pos


def sdf_trilinear(sdf_grid: Array, origin: Array, spacing: float,
                  points: Array) -> Array:
    """Trilinear interpolation of a signed-distance grid at world points.

    sdf_grid: (B, G, G, G); origin: (B, 3) world coordinate of voxel (0,0,0);
    points: (B, N, 3). Outside the grid, values clamp to the border (which is
    positive = outside for any sane grid).
    """
    G = sdf_grid.shape[-1]
    u = (points - origin[:, None, :]) / spacing
    u = jnp.clip(u, 0.0, G - 1.0 - 1e-4)
    i0 = jnp.floor(u).astype(jnp.int32)
    f = u - i0
    def at(ix, iy, iz):
        return jax.vmap(lambda g, a, b, c: g[a, b, c])(
            sdf_grid, ix, iy, iz)
    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = x0 + 1, y0 + 1, z0 + 1
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    c000 = at(x0, y0, z0); c100 = at(x1, y0, z0)
    c010 = at(x0, y1, z0); c110 = at(x1, y1, z0)
    c001 = at(x0, y0, z1); c101 = at(x1, y0, z1)
    c011 = at(x0, y1, z1); c111 = at(x1, y1, z1)
    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def mesh_sdf_guidance(rng: Array, pred_pos: Array, sdf_grid: Array,
                      origin: Array, spacing: float, node_mask: Array,
                      margin: float = 0.2, num_iters: int = 5) -> Array:
    """SDF-grid reformulation of the reference's mesh containment guidance.

    Atoms outside the surface (sdf > 0) or within `margin` of it are pushed
    along -grad(sdf) by a random fraction of their signed distance, iterated
    num_iters times. Equivalent intent to mesh_shape_guidance
    (molopt_score_model.py:742-775) without per-step host round-trips.
    """
    def grad_sdf(p):
        eps = spacing * 0.5
        gx = (sdf_trilinear(sdf_grid, origin, spacing, p + jnp.array([eps, 0, 0]))
              - sdf_trilinear(sdf_grid, origin, spacing, p - jnp.array([eps, 0, 0])))
        gy = (sdf_trilinear(sdf_grid, origin, spacing, p + jnp.array([0, eps, 0]))
              - sdf_trilinear(sdf_grid, origin, spacing, p - jnp.array([0, eps, 0])))
        gz = (sdf_trilinear(sdf_grid, origin, spacing, p + jnp.array([0, 0, eps]))
              - sdf_trilinear(sdf_grid, origin, spacing, p - jnp.array([0, 0, eps])))
        g = jnp.stack([gx, gy, gz], axis=-1) / (2 * eps)
        return g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-6)

    pos = pred_pos
    for _ in range(num_iters):
        rng, sub = jax.random.split(rng)
        d = sdf_trilinear(sdf_grid, origin, spacing, pos)       # (B,N)
        bad = ((d > -margin) & node_mask)
        step = (d + margin) * (jax.random.uniform(sub, d.shape) * 0.8 + 0.2)
        proposal = pos - step[..., None] * grad_sdf(pos)
        pos = jnp.where(bad[..., None], proposal, pos)
    return pos


# --------------------------------------------------------------------------
# Sampler
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    num_steps: int = 1000
    center_pos_mode: str = "none"
    guide_stren: float = 0.0
    threshold_type: Optional[str] = None
    threshold_args: Optional[Dict[str, Any]] = None
    guidance: str = "none"               # none | pointcloud | mesh_sdf
    grad_step: int = 0                   # guidance active only for t > grad_step
    pointcloud_radius: float = 0.2
    mesh_margin: float = 0.2
    record_traj: bool = False


def sample_diffusion(net, sched: dfn.DiffusionSchedule, variables,
                     rng: Array, init_pos: Array, init_v: Array,
                     node_mask: Array, ligand_shape: Array,
                     cfg: SamplerConfig,
                     bounds: Optional[Array] = None,
                     cloud: Optional[Array] = None,
                     sdf_grid: Optional[Array] = None,
                     sdf_origin: Optional[Array] = None,
                     sdf_spacing: float = 0.5):
    """Run the reverse diffusion chain; returns dict with final pos/v (+
    optional trajectories). Jit-compatible; call under jax.jit with `net`,
    `sched`, `cfg` static.
    """
    model_cfg = net.cfg
    T = sched.num_timesteps
    if cfg.num_steps > T:
        raise ValueError(f"num_steps={cfg.num_steps} exceeds the schedule's "
                         f"{T} timesteps")
    time_seq = jnp.arange(T - 1, T - cfg.num_steps - 1, -1)

    pos, offset = center_pos_init(init_pos, node_mask, cfg.center_pos_mode)
    Knet = model_cfg.num_net_classes

    def apply_net(p, v, t_vec, shape):
        return net.apply(variables, p, v, node_mask, shape, t_vec,
                         train=False)

    def step(carry, i):
        pos, v, rng = carry
        rng, r_noise, r_cat, r_guide = jax.random.split(rng, 4)
        t_vec = jnp.full((pos.shape[0],), i, dtype=jnp.int32)

        preds_cond = apply_net(pos, v, t_vec, ligand_shape)
        pred_pos = preds_cond["pred_ligand_pos"]
        pred_v = preds_cond["pred_ligand_v"]

        # shape guidance on the predicted x0 (active while t > grad_step)
        if cfg.guidance == "pointcloud":
            guided = pointcloud_guidance(r_guide, pred_pos, cloud, node_mask,
                                         cfg.pointcloud_radius)
            pred_pos = jnp.where(i > cfg.grad_step, guided, pred_pos)
        elif cfg.guidance == "mesh_sdf":
            guided = mesh_sdf_guidance(r_guide, pred_pos, sdf_grid,
                                       sdf_origin, sdf_spacing, node_mask,
                                       margin=cfg.mesh_margin)
            pred_pos = jnp.where(i > cfg.grad_step, guided, pred_pos)

        # classifier-free guidance (corrected two-pass version)
        if cfg.guide_stren > 0.0:
            preds_uncond = apply_net(pos, v, t_vec,
                                     jnp.zeros_like(ligand_shape))
            g = cfg.guide_stren
            mix_pos = (1 + g) * pred_pos - g * preds_uncond["pred_ligand_pos"]
            mix_v = (1 + g) * pred_v - g * preds_uncond["pred_ligand_v"]
            pred_pos = threshold_cfg(mix_pos, pred_pos, cfg.threshold_type,
                                     cfg.threshold_args, bounds=bounds)
            pred_v = threshold_cfg(mix_v, pred_v, cfg.threshold_type,
                                   cfg.threshold_args, bounds=None)
        elif bounds is not None:
            # standalone bounds clamp (decoupled from CFG — the reference
            # only reaches its clamp inside the CFG branch,
            # molopt_score_model.py:616-642, but it is useful on its own)
            pred_pos = threshold_cfg(pred_pos, pred_pos, None, {},
                                     bounds=bounds)

        if model_cfg.v_mode == "tomask":
            pred_v = pred_v.at[..., -1].set(-1e5)

        # position posterior step
        pos_mean = dfn.q_pos_posterior(sched, pred_pos, pos, t_vec)
        pos_logvar = dfn.extract(sched.posterior_logvar, t_vec, pos.ndim)
        nonzero = (i != 0).astype(pos.dtype)
        noise = jax.random.normal(r_noise, pos.shape, pos.dtype)
        pos_next = pos_mean + nonzero * jnp.exp(0.5 * pos_logvar) * noise
        pos_next = jnp.where(node_mask[..., None], pos_next, pos)

        # type posterior step
        log_v_recon = jax.nn.log_softmax(pred_v, axis=-1)
        log_v = dfn.index_to_log_onehot(v, Knet)
        log_model_prob = dfn.q_v_posterior(sched, log_v_recon, log_v, t_vec)
        v_next = dfn.log_sample_categorical(r_cat, log_model_prob)
        v_next = jnp.where(node_mask, v_next, v)

        out = (pos_next, v_next) if cfg.record_traj else None
        return (pos_next, v_next, rng), out

    (pos, v, _), traj = jax.lax.scan(step, (pos, init_v, rng), time_seq)

    if cfg.center_pos_mode != "none":
        pos = pos + offset[:, None, :]

    result = {"pos": pos, "v": v}
    if cfg.record_traj:
        result["pos_traj"], result["v_traj"] = traj
    return result


def center_pos_init(pos: Array, node_mask: Array, mode: str):
    from shapemol_tpu.models.score_model import center_pos
    return center_pos(pos, node_mask, mode)


def make_init_state(rng: Array, batch_size: int, max_atoms: int,
                    num_atoms: Array, num_net_classes: int):
    """Random initial state: pos ~ N(0,1), v ~ uniform Gumbel sample,
    node_mask from per-graph atom counts (reference
    scripts/sample_diffusion.py:82-93)."""
    r_pos, r_v = jax.random.split(rng)
    pos = jax.random.normal(r_pos, (batch_size, max_atoms, 3), jnp.float32)
    uniform_logits = jnp.zeros((batch_size, max_atoms, num_net_classes))
    v = dfn.log_sample_categorical(r_v, uniform_logits)
    node_mask = (jnp.arange(max_atoms)[None, :]
                 < num_atoms[:, None])
    return pos, v.astype(jnp.int32), node_mask
