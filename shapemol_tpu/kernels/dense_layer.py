"""Pallas TPU kernel: one ENTIRE denoiser layer as dense masked per-molecule
N x N attention — the round-3 redesign of kernels/fused_layer.py.

Motivation (measured, round 2): the indicator-matmul formulation spent ~3/4
of its MXU work on 0/1 gather/scatter emulation (P, G, G^T matrices over
TN*K edge rows) and was VPU/layout-bound — 15% MFU, throughput flat in batch
and dtype. With N <= 48 atoms per molecule, the kNN graph is a *mask*, not a
gather: every edge tensor becomes a dense (T*N*N, C) matrix whose
gather/broadcast structure is regular, so

  * neighbor gather  P @ src   ->  tile-block broadcast (free relayout)
  * dst broadcast    G^T @ dst ->  repeat-row broadcast (free relayout)
  * segment reduce   G @ v     ->  reshape (TN, N, C) + sum over axis 1 (VPU)

and the only matmuls left are the *real* edge-MLP projections at clean MXU
shapes ((T*N*N, R|H) x (R|H, 2H|H)). kNN semantics are preserved exactly: the
top-k index set from ops.knn.masked_knn is converted to a dense adjacency
mask, and the masked softmax math is identical to the sparse path
(models/denoiser.py:86-101).

Functional parity: the hot loop of the reference's
models/uni_transformer.py:48-90 (x2h) and 119-162 (h2x), shipped-config
semantics (edge_feat_dim=0, ew_net_type='global').

The XLA composition in kernels/fused_layer.py (fused_layer_xla) remains the
numerics reference; autodiff uses custom VJP (Pallas forward, XLA backward).
"""
from __future__ import annotations

import functools
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shapemol_tpu.kernels.edge_block import (_indicator, _ln,
                                             _rbf_centers_coeff, NEG)
from shapemol_tpu.kernels.fused_layer import (_GROUPS, _flatten_params,
                                              fused_layer_xla)

Array = jax.Array


def dense_from_knn(idx: Array, nbr_mask: Array, e_w: Array):
    """Convert (B,N,K) kNN indices + validity + per-edge weights into dense
    (B,N,N) adjacency and edge-weight matrices.

    adj[b,i,j] = 1 iff j is a valid kNN source of destination i;
    ewd[b,i,j] = e_w of that edge (0 elsewhere). masked_knn returns distinct
    neighbors, so the one-hot sum is exactly 0/1."""
    N = idx.shape[1]
    oh = jax.nn.one_hot(idx, N, dtype=jnp.float32)          # (B,N,K,N)
    m = nbr_mask.astype(jnp.float32)
    adj = jnp.sum(oh * m[..., None], axis=2)
    ewd = jnp.sum(oh * (e_w.astype(jnp.float32) * m)[..., None], axis=2)
    return adj, ewd


def _repeat_row(z: Array, N: int) -> Array:
    """(TN, C) -> (TN*N, C): row (i*N + j) = z[i] (dst-side broadcast)."""
    TN, C = z.shape
    return jnp.broadcast_to(z[:, None, :], (TN, N, C)).reshape(TN * N, C)


def _tile_mol(z: Array, T: int, N: int) -> Array:
    """(TN, C) -> (TN*N, C): row (m*N*N + i*N + j) = z[m*N + j]
    (src-side broadcast within each molecule)."""
    TN, C = z.shape
    return jnp.broadcast_to(z.reshape(T, 1, N, C),
                            (T, N, N, C)).reshape(TN * N, C)


def _group_sum(z: Array, N: int) -> Array:
    """(TN*N, C) -> (TN, C): sum over each destination's N source slots."""
    TNN, C = z.shape
    return jnp.sum(z.reshape(TNN // N, N, C), axis=1)


def _dense_kernel(x_ref, h_ref, invar_ref, adj_ref, ew_ref, centers_ref,
                  *refs, n_heads: int, T: int, N: int, num_rbf: int,
                  r_max: float, mm_dtype=jnp.float32):
    (h_out_ref, msg_out_ref) = refs[-2:]
    w = list(refs[:-2])
    p: Dict[str, Dict[str, Array]] = {}
    for g, keys in _GROUPS:
        p[g] = {k: w.pop(0) for k in keys}

    _, TN, H = h_ref.shape
    TNN = TN * N
    dh = H // n_heads
    f32 = jnp.float32
    md = mm_dtype

    def mdot(a, b):
        return jax.lax.dot(a.astype(md), b.astype(md),
                           preferred_element_type=f32)

    def mlp2(g, xx):
        hh = mdot(xx, g["w0"][:]) + g["b0"][:].astype(f32)
        hh = jnp.maximum(_ln(hh, g["ln_s"][:].astype(f32),
                             g["ln_b"][:].astype(f32)), 0.0)
        return mdot(hh, g["w1"][:]) + g["b1"][:].astype(f32)

    head_sum = _indicator((H, n_heads), lambda r, c: r // dh == c, dtype=md)

    # geometry + RBF once per layer (f32: bf16 positions round to ~0.03 A)
    x = x_ref[0].astype(f32)                                  # (TN, 3)
    rel_x = _repeat_row(x, N) - _tile_mol(x, T, N)            # (TNN, 3)
    dist = jnp.sqrt(jnp.sum((rel_x + 1e-12) ** 2, axis=-1, keepdims=True))
    _, coeff = _rbf_centers_coeff(num_rbf, r_max)
    r_feat = jnp.exp(coeff * (dist - centers_ref[:]) ** 2)    # (TNN, R)
    mf = adj_ref[0]                                           # (TNN, 1)
    ew = ew_ref[0]

    def edge_attention(g, dst_feats, h_src, q, mode):
        dst = mdot(dst_feats, g["w_dst"][:]) + g["b_dst"][:].astype(f32)
        src = mdot(h_src, g["w_src"][:])                      # (TN, 2H)
        joint = (mdot(r_feat, g["w_rbf"][:])
                 + _repeat_row(dst, N) + _tile_mol(src, T, N))
        hk = jnp.maximum(_ln(joint[:, :H], g["ln_k_scale"][:].astype(f32),
                             g["ln_k_bias"][:].astype(f32)), 0.0)
        hv = jnp.maximum(_ln(joint[:, H:], g["ln_v_scale"][:].astype(f32),
                             g["ln_v_bias"][:].astype(f32)), 0.0)
        k = mdot(hk, g["w_out_k"][:]) + g["b_out_k"][:].astype(f32)
        q_rep = _repeat_row(q, N)                             # (TNN, H)
        logits = mdot(q_rep * k, head_sum) / np.sqrt(dh)      # (TNN, heads)
        masked = logits * mf + (1.0 - mf) * NEG
        masked -= jnp.max(masked)
        expd = jnp.exp(masked) * mf
        denom = _repeat_row(_group_sum(expd, N), N)
        alpha = expd / jnp.maximum(denom, 1e-20)
        v = mdot(hv, g["w_out_v"][:]) + g["b_out_v"][:].astype(f32)
        if mode == "x2h":
            v = v * ew
            alpha_full = mdot(alpha, head_sum.T)
            return _group_sum(alpha_full * v, N)              # (TN, H)
        w_ = alpha * (v * ew)
        E_w = _indicator((n_heads, n_heads * 3), lambda r, c: c // 3 == r,
                         dtype=md)
        E_r = _indicator((3, n_heads * 3), lambda r, c: c % 3 == r,
                         dtype=md)
        w_exp = mdot(w_, E_w)
        r_exp = mdot(rel_x, E_r)
        return _group_sum(w_exp * r_exp, N)                   # (TN, 3h)

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


def _tile_dense(B: int, N: int, H: int) -> int:
    """Molecules per kernel program. Dense edge tensors are (T*N*N, 2H);
    budget ~8 of them under a 48MB working set."""
    forced = os.environ.get("SHAPEMOL_DENSE_TILE")
    if forced:
        try:
            t = int(forced)
            if B % t == 0:
                return t
        except ValueError:
            import warnings
            warnings.warn(f"ignoring non-integer SHAPEMOL_DENSE_TILE="
                          f"{forced!r}")
    for t in (8, 4, 5, 2, 1):
        if B % t == 0 and t * N * N * 2 * H * 4 * 8 <= 48 * 1024 * 1024:
            return t
    return 1


@functools.partial(jax.jit, static_argnames=("n_heads", "num_rbf", "r_max",
                                             "mm_dtype", "interpret"))
def dense_layer_pallas(params, x, h, invar, adj, ewd,
                       n_heads: int, num_rbf: int = 20, r_max: float = 10.0,
                       mm_dtype: str = "float32",
                       interpret: bool = False):
    """adj, ewd: dense (B, N, N) adjacency / edge-weight matrices
    (dense_from_knn). Returns (h_new (B,N,H), msg2 (B,N,heads,3))."""
    B, N, _ = adj.shape
    H = h.shape[-1]
    S = invar.shape[-1]
    T = _tile_dense(B, N, H)
    G_, TN, TNN = B // T, T * N, T * N * N

    x2 = x.reshape(G_, TN, 3)
    h2 = h.reshape(G_, TN, H)
    iv = invar.reshape(G_, TN, S)
    adj2 = adj.reshape(G_, TNN, 1).astype(jnp.float32)
    ew2 = ewd.reshape(G_, TNN, 1).astype(jnp.float32)
    centers_np, _ = _rbf_centers_coeff(num_rbf, r_max)
    centers = jnp.asarray(centers_np)

    flat_w = _flatten_params(params)
    b2 = lambda a: a.reshape(1, -1) if a.ndim == 1 else a
    flat_w = [b2(a) for a in flat_w]
    if mm_dtype == "bfloat16":
        # operands must ENTER the kernel as bf16 VMEM data (an in-kernel
        # astype is folded into an f32-rate dot by Mosaic — round-2 finding)
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
        vm((1, TNN, 1), lambda b: (b, 0, 0)),
        vm((1, TNN, 1), lambda b: (b, 0, 0)),
        vm((1, num_rbf), bcast),
    ]
    w_specs = [vm(a.shape, bcast) for a in flat_w]
    kern = functools.partial(
        _dense_kernel, n_heads=n_heads, T=T, N=N, num_rbf=num_rbf,
        r_max=r_max,
        mm_dtype=jnp.bfloat16 if mm_dtype == "bfloat16" else jnp.float32)
    h_new, msg2 = pl.pallas_call(
        kern,
        grid=(G_,),
        in_specs=data_specs + w_specs,
        out_specs=(vm((1, TN, H), lambda b: (b, 0, 0)),
                   vm((1, TN, n_heads * 3), lambda b: (b, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((G_, TN, H), jnp.float32),
                   jax.ShapeDtypeStruct((G_, TN, n_heads * 3), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2, h2, iv, adj2, ew2, centers, *flat_w)
    return (h_new.reshape(B, N, H),
            msg2.reshape(B, N, n_heads, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _dense_layer_ad(params, x, h, invar, idx, e_w, nbr_mask, n_heads,
                    num_rbf, r_max, mm_dtype):
    adj, ewd = dense_from_knn(idx, nbr_mask, e_w[..., 0])
    return dense_layer_pallas(params, x, h, invar, adj, ewd,
                              n_heads, num_rbf, r_max, mm_dtype)


def _dl_fwd(params, x, h, invar, idx, e_w, nbr_mask, n_heads, num_rbf,
            r_max, mm_dtype):
    out = _dense_layer_ad(params, x, h, invar, idx, e_w, nbr_mask,
                          n_heads, num_rbf, r_max, mm_dtype)
    return out, (params, x, h, invar, idx, e_w, nbr_mask)


def _dl_bwd(n_heads, num_rbf, r_max, mm_dtype, res, g):
    if mm_dtype == "bfloat16":
        import warnings
        warnings.warn(
            "dense_layer: mm_dtype='bfloat16' under jax.grad pairs a bf16 "
            "Pallas forward with an f32 XLA backward — gradients do not "
            "match the computed loss (see STATUS round 2). Use "
            "dtype='float32' for training; bf16 is an inference/sampling "
            "knob.", stacklevel=2)
    params, x, h, invar, idx, e_w, nbr_mask = res
    _, vjp = jax.vjp(
        lambda p, x_, h_, i_, e_: fused_layer_xla(
            p, x_, h_, i_, idx, e_, nbr_mask, n_heads, num_rbf, r_max,
            gather_impl="onehot"),
        params, x, h, invar, e_w)
    d_params, d_x, d_h, d_inv, d_ew = vjp(g)
    f0 = lambda t: np.zeros(t.shape, dtype=jax.dtypes.float0)
    return (d_params, d_x, d_h, d_inv, f0(idx), d_ew, f0(nbr_mask))


_dense_layer_ad.defvjp(_dl_fwd, _dl_bwd)


def dense_layer(params, x, h, invar, idx, e_w, nbr_mask, n_heads: int,
                num_rbf: int = 20, r_max: float = 10.0,
                mm_dtype: str = "float32", use_pallas: bool = True):
    """Drop-in replacement for kernels.fused_layer.fused_layer with the
    dense masked N x N formulation on TPU."""
    if use_pallas and jax.default_backend() == "tpu":
        return _dense_layer_ad(params, x, h, invar, idx, e_w, nbr_mask,
                               n_heads, num_rbf, r_max, mm_dtype)
    return fused_layer_xla(params, x, h, invar, idx, e_w, nbr_mask,
                           n_heads, num_rbf, r_max)
