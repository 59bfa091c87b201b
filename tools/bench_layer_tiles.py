"""Standalone fused-layer kernel timing vs molecule-tile size T.

If per-step time falls with fewer, bigger programs (G = B/T), the kernel is
per-program-overhead-bound and fusing more work per program (bigger T, or
all 8 layers in one kernel) is the win; if time is flat or grows ~T, the
indicator-matmul T^2-per-program cost / VPU element work dominates.

Run on the chip: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_layer_tiles.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from shapemol_tpu.core import misc
from shapemol_tpu.kernels import fused_layer as fl

misc.enable_compilation_cache()

B, N, K, H, heads, S, R = 100, 32, 8, 128, 16, 32, 20
LOOP = 50


def case():
    rng = np.random.default_rng(6)

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
              "h2x": edge_p(heads)}
    x = jnp.asarray(rng.standard_normal((B, N, 3)) * 2, jnp.float32)
    h = jnp.asarray(rng.standard_normal((B, N, H)), jnp.float32)
    invar = jnp.asarray(rng.standard_normal((B, N, S)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (B, N, K)), jnp.int32)
    e_w = jnp.asarray(rng.random((B, N, K, 1)), jnp.float32)
    mask = jnp.asarray(rng.random((B, N, K)) < 0.8)
    return params, x, h, invar, idx, e_w, mask


def run(T):
    fl._tile = lambda b, n, k: T
    fl.fused_layer_pallas._clear_cache()
    params, x, h, invar, idx, e_w, mask = case()

    def body(carry, _):
        h_c, x_c = carry
        h_new, msg = fl.fused_layer_pallas(params, x_c, h_c, invar, idx,
                                           e_w, mask, heads, num_rbf=R)
        # cheap nonlinear feedback so the scan cannot collapse
        return (h_new, x_c + 1e-6 * msg.reshape(B, N, heads * 3)[..., :3]), 0.

    @jax.jit
    def loop(h0, x0):
        (hf, xf), _ = jax.lax.scan(body, (h0, x0), None, length=LOOP)
        return hf

    out = loop(h, x)
    out.block_until_ready()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(h, x)
        out.block_until_ready()
        ts.append(time.perf_counter() - t0)
    per_layer_us = 1e6 * min(ts) / LOOP
    print(json.dumps({"T": T, "programs": B // T if B % T == 0 else None,
                      "per_layer_us": round(per_layer_us, 2)}), flush=True)


if __name__ == "__main__":
    for T in (1, 2, 4, 5, 10, 20, 25, 50):
        if B % T == 0:
            try:
                run(T)
            except Exception as e:
                print(json.dumps({"T": T, "error": str(e)[:200]}),
                      flush=True)
