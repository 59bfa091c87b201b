"""Round-3b/3c fused-layer kernel experiments (run on the real chip).

Each hypothesis is a full fused-layer kernel variant, slope-timed between
two scan lengths to cancel the tunnel's fixed per-execution overhead.

Measured verdicts (v5e, B=96 pad 32, two runs, noise ~ +-4 us/layer):

  ADOPTED into the production kernel (round 3b):
  - h2x rel_x contraction in c-major output layout (3 VPU broadcasts +
    group-sums) instead of the E_w/E_r indicator expansions: 264 -> ~249.
  - per-(dst, head) group-max softmax stabilization (exact; as fast as an
    inexact constant clamp, ~9 us cheaper than full-tensor max).
  - LayerNorm stats per half via ones-column MXU dots (mxu_half):
    ~249 -> 224 us/layer.  Final production config == v25_prod.

  MEASURED AND REJECTED (kept here as flags for re-testing):
  - merged_gather: one-K-tile [r_feat | P] left operand — concat relayout
    costs more than the saved MXU passes.
  - alpha_bcast: lane broadcast-reshape alpha expansion — Mosaic
    compilation failure (unsupported relayout).
  - x2h_dhmajor: dh-major w_out_v columns + lane-concat alpha expansion —
    257 vs 249 us (7 lane concats cost more than the 8-pass matmul).
  - logits_lanes: (TNK, heads, dh).sum(-1) lane-group logits reduce —
    Mosaic compile error (HTTP 500 from the compile helper).
  - ln_mode=mxu_merged2: one merged (TNK,2H)@(2H,2) moment dot —
    228-230 vs 224 us (the wide-N broadcast of mu costs the saving).
  - indicator h2x (h2x_vpu=False) with mxu_half LN: 226-228 vs 224.
  - merged_gather="where" (round 3c): the one-K-tile [r_feat | 0pad | P]
    left operand built by a single iota select (NO lane concat), weight
    stack sublane-aligned (rbf rows padded 20->24) — 229 vs 224 us. The
    in-kernel operand build + weight pad/concat still outweighs the ~16
    saved narrow-K MXU passes; "concat" build measures 235. The fused
    layer is at its measured local optimum under current Mosaic.

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_kernel_exp.py
"""
from __future__ import annotations

import functools
import json
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shapemol_tpu.core import misc
from shapemol_tpu.kernels import fused_layer as fl
from shapemol_tpu.kernels.edge_block import (_indicator, _ln,
                                             _rbf_centers_coeff, NEG)

misc.enable_compilation_cache()

B, N, K, H, HEADS, S, R = 96, 32, 8, 128, 16, 32, 20
LOOP = 50


# --------------------------------------------------------------------------
# variant kernel: same math as fused_layer._layer_kernel with switches
# --------------------------------------------------------------------------

def _exp_kernel(x_ref, h_ref, invar_ref, idx_ref, ew_ref, mask_ref,
                centers_ref, *refs, n_heads: int, K: int, num_rbf: int,
                r_max: float, merged_gather: bool, h2x_vpu: bool,
                alpha_bcast: bool, clamp_max: bool, group_max: bool = False,
                x2h_dhmajor: bool = False, logits_lanes: bool = False,
                ln_mode: str = "vpu", ablate: str = ""):
    (h_out_ref, msg_out_ref) = refs[-2:]
    w = list(refs[:-2])
    p: Dict[str, Dict[str, jax.Array]] = {}
    for g, keys in fl._GROUPS:
        p[g] = {k: w.pop(0) for k in keys}

    _, TN, H_ = h_ref.shape
    TNK = TN * K
    dh = H_ // n_heads
    f32 = jnp.float32

    def mdot(a, b):
        return jax.lax.dot(a, b, preferred_element_type=f32)

    def mlp2(g, xx):
        hh = mdot(xx, g["w0"][:]) + g["b0"][:]
        hh = jnp.maximum(_ln(hh, g["ln_s"][:], g["ln_b"][:]), 0.0)
        return mdot(hh, g["w1"][:]) + g["b1"][:]

    def rep_rows(z):
        TNc, C = z.shape
        return jnp.broadcast_to(z[:, None, :], (TNc, K, C)).reshape(TNK, C)

    def gsum(z):
        C = z.shape[-1]
        return jnp.sum(z.reshape(TN, K, C), axis=1)

    def gmax(z):
        C = z.shape[-1]
        return jnp.max(z.reshape(TN, K, C), axis=1)

    cols = jax.lax.broadcasted_iota(jnp.int32, (TNK, TN), 1)
    P = (cols == idx_ref[0]).astype(f32)
    head_sum = _indicator((H_, n_heads), lambda r, c: r // dh == c)

    x = x_ref[0]
    rel_x = rep_rows(x) - jax.lax.dot(P, x, preferred_element_type=f32)
    dist = jnp.sqrt(jnp.sum((rel_x + 1e-12) ** 2, axis=-1, keepdims=True))
    _, coeff = _rbf_centers_coeff(num_rbf, r_max)
    if ablate == "norbf":
        r_feat = coeff * (dist - centers_ref[:])
    else:
        r_feat = jnp.exp(coeff * (dist - centers_ref[:]) ** 2)
    mf = mask_ref[0]
    ew = ew_ref[0]

    R_PAD = ((num_rbf + 7) // 8) * 8
    if merged_gather == "concat":
        # (TNK, R + TN) one-K-tile left operand, built once per program
        left = jnp.concatenate([r_feat, P], axis=1)
    elif merged_gather == "where":
        # same merged left operand WITHOUT the lane concat: one iota
        # select over (TNK, R_PAD + TN) lanes — rbf lanes < R, zero pad
        # to the sublane-aligned R_PAD, indicator beyond. centers_ref
        # arrives host-padded to R_PAD + TN lanes.
        CW = R_PAD + TN
        lanes = jax.lax.broadcasted_iota(jnp.int32, (TNK, CW), 1)
        rbf_all = jnp.exp(coeff * (dist - centers_ref[:, :CW]) ** 2)
        ind = (lanes - R_PAD) == idx_ref[0]
        left = jnp.where(lanes < num_rbf, rbf_all,
                         jnp.where(lanes < R_PAD, 0.0, ind.astype(f32)))

    def edge_attention(g, dst_feats, h_src, q, mode):
        dst = mdot(dst_feats, g["w_dst"][:]) + g["b_dst"][:]
        srcp = mdot(h_src, g["w_src"][:])
        if merged_gather == "concat":
            stacked = jnp.concatenate([g["w_rbf"][:], srcp], axis=0)
            joint = mdot(left, stacked) + rep_rows(dst)
        elif merged_gather == "where":
            w_rbf_pad = jnp.pad(g["w_rbf"][:], ((0, R_PAD - num_rbf), (0, 0)))
            stacked = jnp.concatenate([w_rbf_pad, srcp], axis=0)
            joint = mdot(left, stacked) + rep_rows(dst)
        elif ablate == "nogather":
            joint = mdot(r_feat, g["w_rbf"][:]) + rep_rows(dst)
        else:
            joint = (mdot(r_feat, g["w_rbf"][:]) + mdot(P, srcp)
                     + rep_rows(dst))
        if ablate == "noln":
            hk = jnp.maximum(joint[:, :H_] * g["ln_k_scale"][:]
                             + g["ln_k_bias"][:], 0.0)
            hv = jnp.maximum(joint[:, H_:] * g["ln_v_scale"][:]
                             + g["ln_v_bias"][:], 0.0)
        elif ln_mode == "mxu_merged2":
            # LN statistics on the MXU with ONE merged (TNK,2H)@(2H,2) dot
            # per moment (the per-half version uses 4 ones-column dots);
            # two-pass centered variance like production
            Mstat = _indicator((2 * H_, 2),
                               lambda r, c: (r // H_) == c) / H_
            mu2 = jax.lax.dot(joint, Mstat, preferred_element_type=f32)
            mu_b = jnp.concatenate(
                [jnp.broadcast_to(mu2[:, 0:1], (TNK, H_)),
                 jnp.broadcast_to(mu2[:, 1:2], (TNK, H_))], axis=-1)
            cen = joint - mu_b
            var2 = jax.lax.dot(cen * cen, Mstat,
                               preferred_element_type=f32)
            rs2 = jax.lax.rsqrt(var2 + 1e-6)
            hk = jnp.maximum(cen[:, :H_] * rs2[:, 0:1]
                             * g["ln_k_scale"][:] + g["ln_k_bias"][:], 0.0)
            hv = jnp.maximum(cen[:, H_:] * rs2[:, 1:2]
                             * g["ln_v_scale"][:] + g["ln_v_bias"][:], 0.0)
        elif ln_mode == "mxu_half":
            # production r3b: per-half ones-column dots
            from shapemol_tpu.kernels.edge_block import _ln_stats_mxu
            xh_k, _ = _ln_stats_mxu(joint[:, :H_])
            xh_v, _ = _ln_stats_mxu(joint[:, H_:])
            hk = jnp.maximum(xh_k * g["ln_k_scale"][:]
                             + g["ln_k_bias"][:], 0.0)
            hv = jnp.maximum(xh_v * g["ln_v_scale"][:]
                             + g["ln_v_bias"][:], 0.0)
        else:
            hk = jnp.maximum(_ln(joint[:, :H_], g["ln_k_scale"][:],
                                 g["ln_k_bias"][:]), 0.0)
            hv = jnp.maximum(_ln(joint[:, H_:], g["ln_v_scale"][:],
                                 g["ln_v_bias"][:]), 0.0)
        k = mdot(hk, g["w_out_k"][:]) + g["b_out_k"][:]
        q_rep = rep_rows(q)
        if logits_lanes:
            # per-head lane-group reduce: (TNK, heads, dh).sum(-1) replaces
            # the (H, heads) narrow-N matmul (8 passes at 16/128 lanes)
            logits = jnp.sum((q_rep * k).reshape(TNK, n_heads, dh),
                             axis=-1) / np.sqrt(dh)
        else:
            logits = mdot(q_rep * k, head_sum) / np.sqrt(dh)
        masked = logits * mf + (1.0 - mf) * NEG
        if ablate == "nosoftmax":
            alpha = masked * mf * 1e-3
        else:
            if clamp_max:
                masked = jnp.minimum(masked, 60.0)
            elif group_max:
                masked -= rep_rows(gmax(masked))
            else:
                masked -= jnp.max(masked)
            expd = jnp.exp(masked) * mf
            denom = rep_rows(gsum(expd))
            alpha = expd / jnp.maximum(denom, 1e-20)
        v = mdot(hv, g["w_out_v"][:]) + g["b_out_v"][:]
        if mode == "x2h":
            v = v * ew
            if x2h_dhmajor:
                # w_out_v/b_out_v arrive column-permuted to dh-major
                # (col d*heads + h); alpha expansion is then a lane concat
                # of dh copies instead of the (heads, H) matmul. msg1 is
                # emitted dh-major and node_output.w0's msg rows are
                # permuted to match on the host.
                alpha_full = jnp.concatenate([alpha] * dh, axis=-1)
            elif alpha_bcast:
                alpha_full = jnp.broadcast_to(
                    alpha[:, :, None], (TNK, n_heads, dh)).reshape(TNK, H_)
            else:
                alpha_full = mdot(alpha, head_sum.T)
            return gsum(alpha_full * v)
        w_ = alpha * (v * ew)
        if h2x_vpu:
            # c-major output (TN, 3*heads): cols c*heads + h
            parts = [gsum(w_ * rel_x[:, c:c + 1]) for c in range(3)]
            return jnp.concatenate(parts, axis=-1)
        E_w = _indicator((n_heads, n_heads * 3), lambda r, c: c // 3 == r)
        E_r = _indicator((3, n_heads * 3), lambda r, c: c % 3 == r)
        return gsum(mdot(w_, E_w) * mdot(rel_x, E_r))

    h = h_ref[0]
    invar = invar_ref[0]
    dst1 = jnp.concatenate([h, invar], axis=-1)
    q1 = mlp2(p["hq"], h)
    msg1 = edge_attention(p["x2h"], dst1, h, q1, "x2h")
    h_new = mlp2(p["node_output"], jnp.concatenate([msg1, h], axis=-1)) + h
    q2 = mlp2(p["xq"], h_new)
    dst2 = jnp.concatenate([h_new, invar], axis=-1)
    msg2 = edge_attention(p["h2x"], dst2, h_new, q2, "h2x")

    h_out_ref[0] = h_new
    msg_out_ref[0] = msg2


@functools.partial(jax.jit, static_argnames=("n_heads", "num_rbf", "r_max",
                                             "T", "merged_gather", "h2x_vpu",
                                             "alpha_bcast", "clamp_max",
                                             "group_max", "x2h_dhmajor",
                                             "logits_lanes", "ln_mode",
                                             "ablate", "interpret"))
def exp_layer(params, x, h, invar, idx, e_w, nbr_mask, n_heads, num_rbf=20,
              r_max=10.0, T=4, merged_gather=False, h2x_vpu=False,
              alpha_bcast=False, clamp_max=False, group_max=False,
              x2h_dhmajor=False, logits_lanes=False, ln_mode="vpu",
              ablate="", interpret=False):
    B_, N_, K_ = idx.shape
    H_ = h.shape[-1]
    if x2h_dhmajor:
        # host-side relayout: x2h value head d of dh lands at column
        # d*heads + h; node_output.w0's msg rows follow the same perm so
        # h_new is bitwise-identical to the reference layout
        dh_ = H_ // n_heads
        old_idx = np.array([(j % n_heads) * dh_ + j // n_heads
                            for j in range(H_)])
        params = jax.tree_util.tree_map(lambda a: a, params)  # shallow copy
        params["x2h"] = dict(params["x2h"])
        params["node_output"] = dict(params["node_output"])
        params["x2h"]["w_out_v"] = params["x2h"]["w_out_v"][:, old_idx]
        params["x2h"]["b_out_v"] = params["x2h"]["b_out_v"][old_idx]
        w0 = params["node_output"]["w0"]
        params["node_output"]["w0"] = jnp.concatenate(
            [w0[:H_][old_idx], w0[H_:]], axis=0)
    S_ = invar.shape[-1]
    G_, TN, TNK = B_ // T, T * N_, T * N_ * K_
    x2 = x.reshape(G_, TN, 3)
    h2 = h.reshape(G_, TN, H_)
    iv = invar.reshape(G_, TN, S_)
    tile_pos = (jnp.arange(B_, dtype=jnp.int32) % T)[:, None, None]
    idx_flat = (idx + tile_pos * N_).reshape(G_, TNK, 1)
    ew2 = e_w.reshape(G_, TNK, 1).astype(jnp.float32)
    mf = nbr_mask.reshape(G_, TNK, 1).astype(jnp.float32)
    centers_np, _ = _rbf_centers_coeff(num_rbf, r_max)
    if merged_gather == "where":
        R_PAD = ((num_rbf + 7) // 8) * 8
        centers_np = np.pad(np.asarray(centers_np).reshape(-1),
                            (0, R_PAD + T * N_ - num_rbf))[None, :]
    centers = jnp.asarray(centers_np)
    flat_w = [a.reshape(1, -1) if a.ndim == 1 else a
              for a in fl._flatten_params(params)]
    vm = lambda shape, imap: pl.BlockSpec(shape, imap,
                                          memory_space=pltpu.VMEM)
    bcast = lambda b: (0, 0)
    data_specs = [
        vm((1, TN, 3), lambda b: (b, 0, 0)),
        vm((1, TN, H_), lambda b: (b, 0, 0)),
        vm((1, TN, S_), lambda b: (b, 0, 0)),
        vm((1, TNK, 1), lambda b: (b, 0, 0)),
        vm((1, TNK, 1), lambda b: (b, 0, 0)),
        vm((1, TNK, 1), lambda b: (b, 0, 0)),
        vm(centers.shape if centers.ndim == 2 else (1, num_rbf), bcast),
    ]
    w_specs = [vm(a.shape, bcast) for a in flat_w]
    kern = functools.partial(
        _exp_kernel, n_heads=n_heads, K=K_, num_rbf=num_rbf, r_max=r_max,
        merged_gather=merged_gather, h2x_vpu=h2x_vpu,
        alpha_bcast=alpha_bcast, clamp_max=clamp_max, group_max=group_max,
        x2h_dhmajor=x2h_dhmajor, logits_lanes=logits_lanes,
        ln_mode=ln_mode, ablate=ablate)
    h_new, msg2 = pl.pallas_call(
        kern,
        grid=(G_,),
        in_specs=data_specs + w_specs,
        out_specs=(vm((1, TN, H_), lambda b: (b, 0, 0)),
                   vm((1, TN, n_heads * 3), lambda b: (b, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((G_, TN, H_), jnp.float32),
                   jax.ShapeDtypeStruct((G_, TN, n_heads * 3), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2, h2, iv, idx_flat, ew2, mf, centers, *flat_w)
    return h_new.reshape(B_, N_, H_), msg2.reshape(B_, N_, n_heads * 3)


def case(rng):
    def mlp_p(d_in, d_out):
        return {"w0": jnp.asarray(rng.standard_normal((d_in, H)) * 0.1,
                                  jnp.float32),
                "b0": jnp.zeros(H), "ln_s": jnp.ones(H), "ln_b": jnp.zeros(H),
                "w1": jnp.asarray(rng.standard_normal((H, d_out)) * 0.1,
                                  jnp.float32),
                "b1": jnp.zeros(d_out)}

    def edge_p(out_v):
        D = H + S
        z = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
        return {"w_dst": z(D, 2 * H), "b_dst": jnp.zeros(2 * H),
                "w_src": z(H, 2 * H), "w_rbf": z(R, 2 * H),
                "ln_k_scale": jnp.ones(H), "ln_k_bias": jnp.zeros(H),
                "ln_v_scale": jnp.ones(H), "ln_v_bias": jnp.zeros(H),
                "w_out_k": z(H, H), "b_out_k": jnp.zeros(H),
                "w_out_v": z(H, out_v), "b_out_v": jnp.zeros(out_v)}

    params = {"hq": mlp_p(H, H), "x2h": edge_p(H),
              "node_output": mlp_p(2 * H, H), "xq": mlp_p(H, H),
              "h2x": edge_p(HEADS)}
    x = jnp.asarray(rng.standard_normal((B, N, 3)) * 2, jnp.float32)
    h = jnp.asarray(rng.standard_normal((B, N, H)), jnp.float32)
    invar = jnp.asarray(rng.standard_normal((B, N, S)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (B, N, K)), jnp.int32)
    e_w = jnp.asarray(rng.random((B, N, K, 1)), jnp.float32)
    mask = jnp.asarray(rng.random((B, N, K)) < 0.8)
    return params, x, h, invar, idx, e_w, mask


def run(name, **kw):
    """Slope timing: the axon tunnel adds a large fixed per-execution
    overhead (~0.6-0.9 ms/layer at LOOP=50 — measured), so per-layer cost
    is the SLOPE between two scan lengths, not a single-point average."""
    params, x, h, invar, idx, e_w, mask = case(np.random.default_rng(6))

    def make_loop(length):
        def body(carry, _):
            h_c, x_c = carry
            h_new, msg = exp_layer(params, x_c, h_c, invar, idx, e_w, mask,
                                   HEADS, num_rbf=R, **kw)
            return (h_new, x_c + 1e-6 * msg[..., :3]), 0.

        @jax.jit
        def loop(h0, x0):
            (hf, xf), _ = jax.lax.scan(body, (h0, x0), None, length=length)
            return hf
        return loop

    L0, L1 = 64, 576
    try:
        t = {}
        for L in (L0, L1):
            loop = make_loop(L)
            loop(h, x).block_until_ready()
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                loop(h, x).block_until_ready()
                ts.append(time.perf_counter() - t0)
            t[L] = min(ts)
        per_layer_us = 1e6 * (t[L1] - t[L0]) / (L1 - L0)
        print(json.dumps({"variant": name, **{k: v for k, v in kw.items()},
                          "per_layer_us": round(per_layer_us, 1),
                          "us_per_mol": round(per_layer_us / B, 3),
                          "overhead_ms": round(1e3 * (t[L0] - per_layer_us
                                                      * 1e-6 * L0), 2)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"variant": name, "error": str(e)[:300]}),
              flush=True)


def check_parity():
    """All variants must agree with the production XLA composition."""
    params, x, h, invar, idx, e_w, mask = case(np.random.default_rng(1))
    ref_h, ref_m = fl.fused_layer_xla(params, x, h, invar, idx, e_w, mask,
                                      HEADS, num_rbf=R)
    ref_m = ref_m.reshape(B, N, HEADS * 3)
    for name, kw in VARIANTS:
        got_h, got_m = exp_layer(params, x, h, invar, idx, e_w, mask, HEADS,
                                 num_rbf=R, **kw)
        if kw.get("h2x_vpu"):
            got_m = got_m.reshape(B, N, 3, HEADS).transpose(0, 1, 3, 2) \
                         .reshape(B, N, HEADS * 3)
        eh = float(jnp.max(jnp.abs(got_h - ref_h)))
        em = float(jnp.max(jnp.abs(got_m - ref_m)))
        print(json.dumps({"parity": name, "err_h": eh, "err_m": em}),
              flush=True)


VARIANTS = [
    # round-3c focus: LN-mode x h2x-path head-to-head (2 runs each for
    # noise); dh-major alpha + lane-group logits reduce measured and
    # dropped (lost / failed Mosaic) — see git history
    ("v25_prod", dict(T=4, h2x_vpu=True, group_max=True,
                      ln_mode="mxu_half")),
    ("v33_merged2", dict(T=4, h2x_vpu=True, group_max=True,
                         ln_mode="mxu_merged2")),
    ("v34_ind_merged2", dict(T=4, group_max=True, ln_mode="mxu_merged2")),
    ("v35_ind_half", dict(T=4, group_max=True, ln_mode="mxu_half")),
    ("v36_mergewhere", dict(T=4, h2x_vpu=True, group_max=True,
                            ln_mode="mxu_half", merged_gather="where")),
    ("v37_mergeconcat", dict(T=4, h2x_vpu=True, group_max=True,
                             ln_mode="mxu_half", merged_gather="concat")),
]

if __name__ == "__main__":
    for name, kw in VARIANTS:
        run(name, **kw)
