"""Pallas TPU kernel: an ENTIRE denoiser layer (x2h edge attention +
node-output MLP + residual + xq projection + h2x edge attention) in one
VMEM-resident kernel per molecule tile.

Builds on edge_block.py (same indicator-matmul formulation for gather /
broadcast / per-head reductions / group softmax); additionally the q
projections and the node-output MLP run in-kernel, so between layers only
h (TN, H) and the h2x vector messages (TN, heads*3) touch HBM, and the
P/G/G^T indicator matrices and neighbor geometry are built ONCE per layer
instead of once per attention block.

The VN shape residual of the position update stays outside (narrow
(..., C, 3) tensors; cheap node-level XLA). The XLA composition below is the
CPU fallback and numerics reference; autodiff uses custom VJP (Pallas
forward, XLA backward) like edge_block."""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shapemol_tpu.kernels.edge_block import (_indicator, _ln, _ln_stats_mxu,
                                             _rbf_centers_coeff, _tile, NEG)

Array = jax.Array

# flat operand order for the weight bundle (built by _flatten_params)
_MLP_KEYS = ("w0", "b0", "ln_s", "ln_b", "w1", "b1")
_EDGE_KEYS = ("w_dst", "b_dst", "w_src", "w_rbf", "ln_k_scale", "ln_k_bias",
              "ln_v_scale", "ln_v_bias", "w_out_k", "b_out_k", "w_out_v",
              "b_out_v")
_GROUPS = (("hq", _MLP_KEYS), ("x2h", _EDGE_KEYS),
           ("node_output", _MLP_KEYS), ("xq", _MLP_KEYS),
           ("h2x", _EDGE_KEYS))


def _flatten_params(params: Dict[str, Dict[str, Array]]):
    return [params[g][k] for g, keys in _GROUPS for k in keys]


def _mlp2_xla(p, x):
    h = x @ p["w0"] + p["b0"]
    h = jax.nn.relu(_ln(h, p["ln_s"], p["ln_b"]))
    return h @ p["w1"] + p["b1"]


def fused_layer_xla(params, x, h, invar, idx, e_w, nbr_mask, n_heads: int,
                    num_rbf: int = 20, r_max: float = 10.0,
                    gather_impl: str = "take"):
    """Reference composition: returns (h_new (B,N,H), msg2 (B,N,heads,3))."""
    from shapemol_tpu.kernels.edge_block import edge_block_xla
    q1 = _mlp2_xla(params["hq"], h)
    dst1 = jnp.concatenate([h, invar], axis=-1)
    msg1 = edge_block_xla(params["x2h"], x, dst1, h, q1, idx, e_w, nbr_mask,
                          n_heads, "x2h", num_rbf, r_max,
                          gather_impl=gather_impl)
    h_new = _mlp2_xla(params["node_output"],
                      jnp.concatenate([msg1, h], axis=-1)) + h
    q2 = _mlp2_xla(params["xq"], h_new)
    dst2 = jnp.concatenate([h_new, invar], axis=-1)
    msg2 = edge_block_xla(params["h2x"], x, dst2, h_new, q2, idx, e_w,
                          nbr_mask, n_heads, "h2x", num_rbf, r_max,
                          gather_impl=gather_impl)
    return h_new, msg2


def _layer_kernel(x_ref, h_ref, invar_ref, idx_ref, ew_ref, mask_ref,
                  centers_ref, *refs, n_heads: int, K: int, num_rbf: int,
                  r_max: float, mm_dtype=jnp.float32):
    (h_out_ref, msg_out_ref) = refs[-2:]
    w = list(refs[:-2])
    p: Dict[str, Dict[str, Array]] = {}
    for g, keys in _GROUPS:
        p[g] = {k: w.pop(0) for k in keys}

    _, TN, H = h_ref.shape
    TNK = TN * K
    dh = H // n_heads
    f32 = jnp.float32
    md = mm_dtype

    def mdot(a, b):
        return jax.lax.dot(a.astype(md), b.astype(md),
                           preferred_element_type=f32)

    idot = mdot

    def mlp2(g, xx):
        hh = mdot(xx, g["w0"][:]) + g["b0"][:].astype(f32)
        hh = jnp.maximum(_ln(hh, g["ln_s"][:].astype(f32),
                             g["ln_b"][:].astype(f32)), 0.0)
        return mdot(hh, g["w1"][:]) + g["b1"][:].astype(f32)

    # round-3 structure note: edge rows are DST-major, K-minor, so every
    # dst-side operation is REGULAR — "G^T @ z" is a repeat-each-row-K
    # broadcast and "G @ z" is a reshape + sum over the K slots, both
    # cheap relayouts instead of MXU passes. The only true irregular op is
    # the neighbor gather P @ src (P is the 0/1 one-hot of idx); measured
    # ablations (STATUS round 3) show the kernel sits near its MXU
    # pass-structure limit once these are regularized.
    def rep_rows(z):              # (TN, C) -> (TNK, C), row e = z[e // K]
        TNc, C = z.shape
        return jnp.broadcast_to(z[:, None, :], (TNc, K, C)).reshape(TNK, C)

    def gsum(z):                  # (TNK, C) -> (TN, C) sum over K slots
        C = z.shape[-1]
        return jnp.sum(z.reshape(TN, K, C), axis=1)

    def gmax(z):                  # (TNK, C) -> (TN, C) max over K slots
        C = z.shape[-1]
        return jnp.max(z.reshape(TN, K, C), axis=1)

    cols = jax.lax.broadcasted_iota(jnp.int32, (TNK, TN), 1)
    P = (cols == idx_ref[0]).astype(md)
    head_sum = _indicator((H, n_heads), lambda r, c: r // dh == c, dtype=md)

    # geometry + RBF once per layer — kept in f32: bf16 positions would
    # round to ~0.03 A at the box edge, a visible bias on the RBF features
    x = x_ref[0].astype(f32)
    rel_x = rep_rows(x) \
        - jax.lax.dot(P.astype(f32), x, preferred_element_type=f32)
    dist = jnp.sqrt(jnp.sum((rel_x + 1e-12) ** 2, axis=-1, keepdims=True))
    _, coeff = _rbf_centers_coeff(num_rbf, r_max)
    r_feat = jnp.exp(coeff * (dist - centers_ref[:]) ** 2)
    mf = mask_ref[0]
    ew = ew_ref[0]

    def edge_attention(g, dst_feats, h_src, q, mode):
        dst = mdot(dst_feats, g["w_dst"][:]) + g["b_dst"][:].astype(f32)
        src = mdot(h_src, g["w_src"][:])
        joint = (mdot(r_feat, g["w_rbf"][:])
                 + idot(P, src) + rep_rows(dst))
        xh_k, _ = _ln_stats_mxu(joint[:, :H])
        xh_v, _ = _ln_stats_mxu(joint[:, H:])
        hk = jnp.maximum(xh_k * g["ln_k_scale"][:].astype(f32)
                         + g["ln_k_bias"][:].astype(f32), 0.0)
        hv = jnp.maximum(xh_v * g["ln_v_scale"][:].astype(f32)
                         + g["ln_v_bias"][:].astype(f32), 0.0)
        k = mdot(hk, g["w_out_k"][:]) + g["b_out_k"][:].astype(f32)
        q_rep = rep_rows(q)
        logits = idot(q_rep * k, head_sum) / np.sqrt(dh)
        masked = logits * mf + (1.0 - mf) * NEG
        # per-(dst, head) max: exact XLA-composition semantics and ~25
        # us/layer cheaper than the old full-tensor jnp.max (round 3b)
        masked -= rep_rows(gmax(masked))
        expd = jnp.exp(masked) * mf
        denom = rep_rows(gsum(expd))
        alpha = expd / jnp.maximum(denom, 1e-20)
        v = mdot(hv, g["w_out_v"][:]) + g["b_out_v"][:].astype(f32)
        if mode == "x2h":
            v = v * ew
            alpha_full = idot(alpha, head_sum.T)
            return gsum(alpha_full * v)                         # (TN, H)
        w_ = alpha * (v * ew)
        # c-major (TN, 3*heads) h2x output (cols c*heads+h): 3 VPU
        # broadcasts + group-sums replace the E_w/E_r indicator
        # expansions; the wrapper transposes back to (heads, 3)
        return jnp.concatenate(
            [gsum(w_ * rel_x[:, c:c + 1]) for c in range(3)], axis=-1)

    # keep activations in the matmul dtype when the refs arrive that way
    # (genuine bf16 VMEM data — an astype(f32) here would re-promote and
    # let the compiler run the dots at the slow f32 MXU rate)
    h = h_ref[0] if h_ref.dtype == md else h_ref[0].astype(f32)
    invar = (invar_ref[0] if invar_ref.dtype == md
             else invar_ref[0].astype(f32))
    dst1 = jnp.concatenate([h, invar], axis=-1)
    q1 = mlp2(p["hq"], h)
    msg1 = edge_attention(p["x2h"], dst1, h, q1, "x2h")
    h_new = mlp2(p["node_output"],
                 jnp.concatenate([msg1, h], axis=-1)) + h
    q2 = mlp2(p["xq"], h_new)
    dst2 = jnp.concatenate([h_new, invar], axis=-1)
    msg2 = edge_attention(p["h2x"], dst2, h_new, q2, "h2x")

    h_out_ref[0] = h_new.astype(h_out_ref.dtype)
    msg_out_ref[0] = msg2.astype(msg_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_heads", "num_rbf", "r_max",
                                             "mm_dtype", "interpret"))
def fused_layer_pallas(params, x, h, invar, idx, e_w, nbr_mask,
                       n_heads: int, num_rbf: int = 20, r_max: float = 10.0,
                       mm_dtype: str = "float32",
                       interpret: bool = False):
    B, N, K = idx.shape
    H = h.shape[-1]
    S = invar.shape[-1]
    T = _tile(B, N, K)
    G_, TN, TNK = B // T, T * N, T * N * K

    x2 = x.reshape(G_, TN, 3)
    h2 = h.reshape(G_, TN, H)
    iv = invar.reshape(G_, TN, S)
    tile_pos = (jnp.arange(B, dtype=jnp.int32) % T)[:, None, None]
    idx_flat = (idx + tile_pos * N).reshape(G_, TNK, 1)
    ew2 = e_w.reshape(G_, TNK, 1).astype(jnp.float32)
    mf = nbr_mask.reshape(G_, TNK, 1).astype(jnp.float32)
    centers_np, _ = _rbf_centers_coeff(num_rbf, r_max)
    centers = jnp.asarray(centers_np)

    flat_w = _flatten_params(params)
    b2 = lambda a: a.reshape(1, -1) if a.ndim == 1 else a
    flat_w = [b2(a) for a in flat_w]
    if mm_dtype == "bfloat16":
        # feed the matmul operands to the kernel AS bf16 VMEM data: an
        # astype inside the kernel gets folded by the compiler into an
        # f32-rate dot, so the cast must happen on the host-side arrays
        # (weight matrices + scalar activations; biases/LN/geometry stay
        # f32)
        mm_keys = {"w0", "w1", "w_dst", "w_src", "w_rbf", "w_out_k",
                   "w_out_v"}
        flat_keys = [k for _, keys in _GROUPS for k in keys]
        flat_w = [a.astype(jnp.bfloat16) if k in mm_keys else a
                  for k, a in zip(flat_keys, flat_w)]
        h2 = h2.astype(jnp.bfloat16)
        iv = iv.astype(jnp.bfloat16)
    vm = lambda shape, imap: pl.BlockSpec(shape, imap,
                                          memory_space=pltpu.VMEM)
    bcast = lambda b: (0, 0)
    data_specs = [
        vm((1, TN, 3), lambda b: (b, 0, 0)),
        vm((1, TN, H), lambda b: (b, 0, 0)),
        vm((1, TN, S), lambda b: (b, 0, 0)),
        vm((1, TNK, 1), lambda b: (b, 0, 0)),
        vm((1, TNK, 1), lambda b: (b, 0, 0)),
        vm((1, TNK, 1), lambda b: (b, 0, 0)),
        vm((1, num_rbf), bcast),
    ]
    w_specs = [vm(a.shape, bcast) for a in flat_w]
    kern = functools.partial(
        _layer_kernel, n_heads=n_heads, K=K, num_rbf=num_rbf, r_max=r_max,
        mm_dtype=jnp.bfloat16 if mm_dtype == "bfloat16" else jnp.float32)
    h_new, msg2 = pl.pallas_call(
        kern,
        grid=(G_,),
        in_specs=data_specs + w_specs,
        out_specs=(vm((1, TN, H), lambda b: (b, 0, 0)),
                   vm((1, TN, n_heads * 3), lambda b: (b, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((G_, TN, H), jnp.float32),
                   jax.ShapeDtypeStruct((G_, TN, n_heads * 3), jnp.float32)),
        # T=8 tiles overflow the default 16M scoped-vmem budget (the
        # indicator matrices + pipeline buffers); v5e has 128M VMEM, so
        # give the kernel an explicit 64M ceiling
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2, h2, iv, idx_flat, ew2, mf, centers, *flat_w)
    return (h_new.reshape(B, N, H),
            msg2.reshape(B, N, 3, n_heads).transpose(0, 1, 3, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _fused_layer_ad(params, x, h, invar, idx, e_w, nbr_mask, n_heads,
                    num_rbf, r_max, mm_dtype):
    return fused_layer_pallas(params, x, h, invar, idx, e_w, nbr_mask,
                              n_heads, num_rbf, r_max, mm_dtype)


def _fl_fwd(params, x, h, invar, idx, e_w, nbr_mask, n_heads, num_rbf,
            r_max, mm_dtype):
    out = fused_layer_pallas(params, x, h, invar, idx, e_w, nbr_mask,
                             n_heads, num_rbf, r_max, mm_dtype)
    return out, (params, x, h, invar, idx, e_w, nbr_mask)


def _fl_bwd(n_heads, num_rbf, r_max, mm_dtype, res, g):
    params, x, h, invar, idx, e_w, nbr_mask = res
    if jax.default_backend() != "tpu":
        _, vjp = jax.vjp(
            lambda p, x_, h_, i_, e_: fused_layer_xla(
                p, x_, h_, i_, idx, e_, nbr_mask, n_heads, num_rbf, r_max,
                gather_impl="onehot"),
            params, x, h, invar, e_w)
        d_params, d_x, d_h, d_inv, d_ew = vjp(g)
        f0 = lambda t: np.zeros(t.shape, dtype=jax.dtypes.float0)
        return (d_params, d_x, d_h, d_inv, f0(idx), d_ew, f0(nbr_mask))

    d_params, d_x, d_h, d_inv, d_ew = fused_layer_bwd_composed(
        params, x, h, invar, idx, e_w, nbr_mask, (g[0], g[1]),
        n_heads, num_rbf, r_max, mm_dtype)
    f0 = lambda t: np.zeros(t.shape, dtype=jax.dtypes.float0)
    return (d_params, d_x, d_h, d_inv, f0(idx), d_ew, f0(nbr_mask))


def fused_layer_bwd_composed(params, x, h, invar, idx, e_w, nbr_mask, g,
                             n_heads, num_rbf: int = 20,
                             r_max: float = 10.0,
                             mm_dtype: str = "float32",
                             interpret: bool = False):
    """Pallas backward of the fused layer (round 3, VERDICT item 6).

    The per-edge heavy lifting runs in two hand-derived recompute-in-VMEM
    kernels (one per attention block, kernels/edge_block.py:
    edge_block_bwd_pallas); the node-level MLP chain rule is cheap XLA.
    msg1 is recomputed with the Pallas forward edge kernel, so only
    node-sized tensors ever touch HBM here. Returns
    (d_params, d_x, d_h, d_invar, d_e_w)."""
    from shapemol_tpu.kernels.edge_block import (edge_block_bwd_pallas,
                                                 edge_block_pallas)
    g_h, g_m = g
    H = h.shape[-1]
    mlp = lambda p, xx: _mlp2_xla(p, xx)

    q1, vjp_hq = jax.vjp(mlp, params["hq"], h)
    dst1 = jnp.concatenate([h, invar], axis=-1)
    msg1 = edge_block_pallas(params["x2h"], x, dst1, h, q1, idx, e_w,
                             nbr_mask, n_heads, "x2h", num_rbf, r_max,
                             mm_dtype, interpret=interpret)
    cat1 = jnp.concatenate([msg1, h], axis=-1)
    hn_pre, vjp_no = jax.vjp(mlp, params["node_output"], cat1)
    h_new = hn_pre + h
    q2, vjp_xq = jax.vjp(mlp, params["xq"], h_new)
    dst2 = jnp.concatenate([h_new, invar], axis=-1)

    pg_h2x, d_x2, d_dst2, d_hs2, d_q2, d_ew2 = edge_block_bwd_pallas(
        params["h2x"], x, dst2, h_new, q2, idx, e_w, nbr_mask, g_m,
        n_heads, "h2x", num_rbf, r_max, mm_dtype, interpret=interpret)
    pg_xq, d_hn_q2 = vjp_xq(d_q2)
    d_hnew = g_h + d_dst2[..., :H] + d_hs2 + d_hn_q2
    d_invar = d_dst2[..., H:]
    pg_no, d_cat1 = vjp_no(d_hnew)
    d_msg1 = d_cat1[..., :H]
    d_h = d_cat1[..., H:] + d_hnew                    # + residual branch
    pg_x2h, d_x1, d_dst1, d_hs1, d_q1, d_ew1 = edge_block_bwd_pallas(
        params["x2h"], x, dst1, h, q1, idx, e_w, nbr_mask, d_msg1,
        n_heads, "x2h", num_rbf, r_max, mm_dtype, interpret=interpret)
    pg_hq, d_h_q1 = vjp_hq(d_q1)
    d_h = d_h + d_dst1[..., :H] + d_hs1 + d_h_q1
    d_invar = d_invar + d_dst1[..., H:]

    d_params = {"hq": pg_hq, "x2h": pg_x2h, "node_output": pg_no,
                "xq": pg_xq, "h2x": pg_h2x}
    return (d_params, d_x1 + d_x2, d_h, d_invar, d_ew1 + d_ew2)


_fused_layer_ad.defvjp(_fl_fwd, _fl_bwd)


def fused_layer(params, x, h, invar, idx, e_w, nbr_mask, n_heads: int,
                num_rbf: int = 20, r_max: float = 10.0,
                mm_dtype: str = "float32", use_pallas: bool = True):
    if use_pallas and jax.default_backend() == "tpu":
        return _fused_layer_ad(params, x, h, invar, idx, e_w, nbr_mask,
                               n_heads, num_rbf, r_max, mm_dtype)
    return fused_layer_xla(params, x, h, invar, idx, e_w, nbr_mask,
                           n_heads, num_rbf, r_max)
