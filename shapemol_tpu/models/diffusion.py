"""Diffusion-process math: noise schedules, Gaussian position diffusion and
categorical atom-type diffusion in log space.

Pure functions over a precomputed `DiffusionSchedule` pytree so everything is
trivially jittable/scannable. Semantics mirror the reference implementation
(reference: models/diffusion.py:4-48, models/molopt_score_model.py:63-445)
but are written for padded dense batches:

  * positions  pos:  (B, N, 3)
  * types      v:    (B, N) int32            (categorical, K classes)
  * node mask  mask: (B, N) bool             (True = real atom)
  * timesteps  t:    (B,)   int32            (one per graph)

All schedule constants are computed in float64 numpy at construction time and
stored as float32 jnp arrays (the reference builds them the same way —
molopt_score_model.py:188-234).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# --------------------------------------------------------------------------
# Beta schedules (reference: models/diffusion.py:4-48)
# --------------------------------------------------------------------------

def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine schedule from Nichol & Dhariwal (improved DDPM)."""
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def get_beta_schedule(beta_schedule: str, num_diffusion_timesteps: int,
                      **kwargs: Any) -> np.ndarray:
    """Build a beta schedule; kinds: quad | linear | sigmoid | cosine."""
    kwargs = {k: float(v) for k, v in kwargs.items()}
    T = num_diffusion_timesteps
    if beta_schedule == "quad":
        betas = np.linspace(kwargs["beta_start"] ** 0.5,
                            kwargs["beta_end"] ** 0.5, T,
                            dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(kwargs["beta_start"], kwargs["beta_end"], T,
                            dtype=np.float64)
    elif beta_schedule == "sigmoid":
        s = kwargs.get("s", 3.0)
        grid = np.linspace(-s, s, T)
        sig = 1.0 / (1.0 + np.exp(-grid))
        betas = sig * (kwargs["beta_end"] - kwargs["beta_start"]) + kwargs["beta_start"]
    elif beta_schedule == "cosine":
        betas = cosine_beta_schedule(T, s=kwargs.get("s", 0.008))
    else:
        raise NotImplementedError(beta_schedule)
    assert betas.shape == (T,)
    return betas


def _log_1_min_a(a: np.ndarray) -> np.ndarray:
    return np.log(1 - np.exp(a) + 1e-40)


# --------------------------------------------------------------------------
# Schedule container
# --------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All derived constants for both the Gaussian position chain and the
    categorical type chain. Shapes are all (T,)."""
    # position (Gaussian) chain
    betas: Array
    alphas_cumprod: Array
    alphas_cumprod_prev: Array
    sqrt_alphas_cumprod: Array
    sqrt_one_minus_alphas_cumprod: Array
    sqrt_recip_alphas_cumprod: Array
    sqrt_recipm1_alphas_cumprod: Array
    posterior_mean_c0_coef: Array
    posterior_mean_ct_coef: Array
    posterior_var: Array
    posterior_logvar: Array
    loss_pos_step_weight: Array
    # atom-type (categorical) chain, log space
    log_alphas_v: Array
    log_one_minus_alphas_v: Array
    log_alphas_cumprod_v: Array
    log_one_minus_alphas_cumprod_v: Array
    # static
    num_timesteps: int = dataclasses.field(metadata=dict(static=True))
    num_classes: int = dataclasses.field(metadata=dict(static=True))
    v_mode: str = dataclasses.field(metadata=dict(static=True))


def make_schedule(schedule_pos: Dict[str, Any], schedule_v: Dict[str, Any],
                  num_timesteps: int, num_classes: int,
                  v_mode: str = "uniform",
                  loss_pos_min_weight: float = 0.0,
                  loss_pos_max_weight: float = 10.0) -> DiffusionSchedule:
    """Precompute every schedule constant (float64 → float32).

    Mirrors reference molopt_score_model.py:188-234 (position chain),
    222-234 (type chain) and 196-198 (SNR loss weights).
    """
    betas = get_beta_schedule(num_diffusion_timesteps=num_timesteps, **schedule_pos)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

    snr = alphas_cumprod / (1 - alphas_cumprod)
    loss_pos_step_weight = np.clip(loss_pos_min_weight + snr, None, loss_pos_max_weight)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_mean_c0_coef = betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_mean_ct_coef = (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
    # variance at t=0 is 0; clamp the log by reusing var[1] (reference line 220)
    posterior_logvar = np.log(np.append(posterior_variance[1], posterior_variance[1:]))

    betas_v = get_beta_schedule(num_diffusion_timesteps=num_timesteps, **schedule_v)
    log_alphas_v = np.log(1.0 - betas_v)
    log_alphas_cumprod_v = np.cumsum(log_alphas_v)

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_mean_c0_coef=f32(posterior_mean_c0_coef),
        posterior_mean_ct_coef=f32(posterior_mean_ct_coef),
        posterior_var=f32(posterior_variance),
        posterior_logvar=f32(posterior_logvar),
        loss_pos_step_weight=f32(loss_pos_step_weight),
        log_alphas_v=f32(log_alphas_v),
        log_one_minus_alphas_v=f32(_log_1_min_a(log_alphas_v)),
        log_alphas_cumprod_v=f32(log_alphas_cumprod_v),
        log_one_minus_alphas_cumprod_v=f32(_log_1_min_a(log_alphas_cumprod_v)),
        num_timesteps=int(num_timesteps),
        num_classes=int(num_classes),
        v_mode=v_mode,
    )


# --------------------------------------------------------------------------
# Log-space categorical helpers (reference: molopt_score_model.py:63-113)
# --------------------------------------------------------------------------

def index_to_log_onehot(x: Array, num_classes: int) -> Array:
    """(..., ) int -> (..., K) log-one-hot with log(0) clamped to log(1e-30)."""
    onehot = jax.nn.one_hot(x, num_classes, dtype=jnp.float32)
    return jnp.log(jnp.clip(onehot, min=1e-30))


def log_onehot_to_index(log_x: Array) -> Array:
    return jnp.argmax(log_x, axis=-1)


def categorical_kl(log_prob1: Array, log_prob2: Array) -> Array:
    """KL(p1 || p2) over the last axis."""
    return (jnp.exp(log_prob1) * (log_prob1 - log_prob2)).sum(axis=-1)


def log_categorical(log_x_start: Array, log_prob: Array) -> Array:
    return (jnp.exp(log_x_start) * log_prob).sum(axis=-1)


def normal_kl(mean1: Array, logvar1: Array, mean2: Array, logvar2: Array) -> Array:
    kl = 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                + (mean1 - mean2) ** 2 * jnp.exp(-logvar2))
    return kl.sum(axis=-1)


def log_add_exp(a: Array, b: Array) -> Array:
    maximum = jnp.maximum(a, b)
    return maximum + jnp.log(jnp.exp(a - maximum) + jnp.exp(b - maximum))


def log_sample_categorical(rng: Array, logits: Array) -> Array:
    """Gumbel-max sample over the last axis (matches reference's
    -log(-log(u+eps)+eps) construction, molopt_score_model.py:98-104)."""
    uniform = jax.random.uniform(rng, logits.shape)
    gumbel = -jnp.log(-jnp.log(uniform + 1e-30) + 1e-30)
    return jnp.argmax(gumbel + logits, axis=-1)


# --------------------------------------------------------------------------
# Per-graph coefficient broadcast
# --------------------------------------------------------------------------

def extract(coef: Array, t: Array, ndim: int) -> Array:
    """coef[t] with trailing singleton dims so it broadcasts over node axes.

    `t` has shape (B,); result has shape (B, 1, ..., 1) with `ndim` total dims.
    Dense-batch analog of the reference's coef[t][batch] gather
    (molopt_score_model.py:777-779).
    """
    out = coef[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


# --------------------------------------------------------------------------
# Gaussian position chain
# --------------------------------------------------------------------------

def q_pos_sample(sched: DiffusionSchedule, rng: Array, pos0: Array,
                 t: Array) -> tuple[Array, Array]:
    """Forward-noise positions: x_t = sqrt(a_bar) x_0 + sqrt(1-a_bar) eps."""
    a = extract(sched.alphas_cumprod, t, pos0.ndim)
    noise = jax.random.normal(rng, pos0.shape, dtype=pos0.dtype)
    pos_t = jnp.sqrt(a) * pos0 + jnp.sqrt(1.0 - a) * noise
    return pos_t, noise


def predict_x0_from_eps(sched: DiffusionSchedule, xt: Array, eps: Array,
                        t: Array) -> Array:
    return (extract(sched.sqrt_recip_alphas_cumprod, t, xt.ndim) * xt
            - extract(sched.sqrt_recipm1_alphas_cumprod, t, xt.ndim) * eps)


def q_pos_posterior(sched: DiffusionSchedule, x0: Array, xt: Array,
                    t: Array) -> Array:
    """Mean of q(x_{t-1} | x_t, x_0)."""
    return (extract(sched.posterior_mean_c0_coef, t, x0.ndim) * x0
            + extract(sched.posterior_mean_ct_coef, t, x0.ndim) * xt)


# --------------------------------------------------------------------------
# Categorical type chain (uniform / tomask transition kernels)
# --------------------------------------------------------------------------

def q_v_pred_one_timestep(sched: DiffusionSchedule, log_vt_1: Array,
                          t: Array) -> Array:
    """log q(v_t | v_{t-1}).  log_vt_1: (B, N, K); t: (B,)."""
    log_alpha_t = extract(sched.log_alphas_v, t, log_vt_1.ndim)
    log_1_min_alpha_t = extract(sched.log_one_minus_alphas_v, t, log_vt_1.ndim)
    if sched.v_mode == "uniform":
        return log_add_exp(log_vt_1 + log_alpha_t,
                           log_1_min_alpha_t - np.log(sched.num_classes))
    elif sched.v_mode == "tomask":
        log_probs = log_vt_1 + log_alpha_t
        return log_probs.at[..., -1].set(jnp.squeeze(log_1_min_alpha_t, -1))
    raise ValueError(f"undefined v_mode: {sched.v_mode}")


def q_v_pred(sched: DiffusionSchedule, log_v0: Array, t: Array) -> Array:
    """log q(v_t | v_0)."""
    log_cum = extract(sched.log_alphas_cumprod_v, t, log_v0.ndim)
    log_1_min_cum = extract(sched.log_one_minus_alphas_cumprod_v, t, log_v0.ndim)
    if sched.v_mode == "uniform":
        return log_add_exp(log_v0 + log_cum,
                           log_1_min_cum - np.log(sched.num_classes))
    elif sched.v_mode == "tomask":
        log_probs = log_v0 + log_cum
        return log_probs.at[..., -1].set(jnp.squeeze(log_1_min_cum, -1))
    raise ValueError(f"undefined v_mode: {sched.v_mode}")


def q_v_sample(sched: DiffusionSchedule, rng: Array, log_v0: Array,
               t: Array, num_classes: int) -> tuple[Array, Array]:
    """Sample v_t ~ q(v_t | v_0); returns (indices, log-one-hot)."""
    log_qvt_v0 = q_v_pred(sched, log_v0, t)
    idx = log_sample_categorical(rng, log_qvt_v0)
    return idx, index_to_log_onehot(idx, num_classes)


def q_v_posterior(sched: DiffusionSchedule, log_v0: Array, log_vt: Array,
                  t: Array) -> Array:
    """log q(v_{t-1} | v_t, v_0), normalized over the class axis."""
    t_minus_1 = jnp.maximum(t - 1, 0)
    log_qvt1_v0 = q_v_pred(sched, log_v0, t_minus_1)
    unnormed = log_qvt1_v0 + q_v_pred_one_timestep(sched, log_vt, t)
    return unnormed - jax.nn.logsumexp(unnormed, axis=-1, keepdims=True)


# --------------------------------------------------------------------------
# Time sampling (symmetric antithetic — reference molopt_score_model.py:416-422)
# --------------------------------------------------------------------------

def sample_time_symmetric(rng: Array, num_graphs: int,
                          num_timesteps: int) -> Array:
    half = jax.random.randint(rng, (num_graphs // 2 + 1,), 0, num_timesteps)
    t = jnp.concatenate([half, num_timesteps - half - 1])[:num_graphs]
    return t
