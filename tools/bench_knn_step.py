"""Measure the kNN-block reformulations on the real chip (VERDICT r3
item 5: attack the non-layer ~15% of the sampling step).

Times, scan-wrapped to amortize dispatch (like tools/bench_kernel_exp.py):
  knn_argmin    — masked_knn_d, k serial masked-argmin rounds
  knn_rank      — masked_knn_d_rank, parallel rank-select (production
                  default since r4: 0.045 vs 0.050 ms/call on-chip)
  knn_ew_*      — same + the global edge-weight MLP on the returned d
  step_argmin   — full 1000-step sampler, knn_impl=argmin
  step_rank     — full sampler, knn_impl=rank

Prints one JSON line per variant. Env: BENCH_BATCH (100), BENCH_ATOMS (32).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", 100))
MAX_ATOMS = int(os.environ.get("BENCH_ATOMS", 32))
SCAN = int(os.environ.get("BENCH_SCAN", 1000))


def main():
    import jax
    import jax.numpy as jnp
    from shapemol_tpu.ops.knn import masked_knn_d, masked_knn_d_rank

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((BATCH, MAX_ATOMS, 3)),
                      jnp.float32)
    counts = rng.integers(12, MAX_ATOMS + 1, BATCH)
    mask = jnp.asarray(np.arange(MAX_ATOMS)[None] < counts[:, None])

    def scan_time(body):
        @jax.jit
        def run(p):
            def step(carry, _):
                out = body(carry)
                # feed a data dependency back so steps can't collapse
                return carry + 1e-6 * out, None
            final, _ = jax.lax.scan(step, p, None, length=SCAN)
            return final
        out = run(pos)
        out.block_until_ready()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(pos).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return min(ts) / SCAN * 1e3       # ms per iteration

    def knn_only(fn):
        def body(p):
            idx, m, d = fn(p, mask, 8)
            return (d * m).sum() * jnp.ones_like(p)
        return body

    def knn_ew(fn):
        # the e_w MLP at production widths (shared with bench_step_split)
        from bench_common import ew_mlp, make_ew_params
        w0, w1, offs = make_ew_params(rng)

        def body(p):
            idx, m, d = fn(p, mask, 8)
            ew = ew_mlp(d, w0, w1, offs)
            return (ew * m).sum() * jnp.ones_like(p)
        return body

    results = {}
    for name, fn in [("knn_argmin", masked_knn_d),
                     ("knn_rank", masked_knn_d_rank)]:
        results[name] = scan_time(knn_only(fn))
        results[name + "_ew"] = scan_time(knn_ew(fn))
        print(json.dumps({"variant": name, "ms_per_iter": results[name],
                          "ms_with_ew": results[name + "_ew"]}))

    # full sampler step
    from shapemol_tpu.models.denoiser import DenoiserConfig
    from shapemol_tpu.models.score_model import (ScoreModelConfig,
                                                 ShapeDiffusionNet)
    from shapemol_tpu.sample import sampler as smp

    for impl in ("argmin", "rank"):
        cfg = ScoreModelConfig(
            num_diffusion_timesteps=SCAN, num_classes=15, hidden_dim=128,
            denoiser=DenoiserConfig(num_blocks=1, num_layers=8,
                                    hidden_dim=128, n_heads=16, knn=8,
                                    num_r_gaussian=20, shape_dim=32,
                                    shape_latent_dim=32, knn_impl=impl))
        net = ShapeDiffusionNet(cfg)
        sched = cfg.make_schedule()
        p0, v0, m0 = smp.make_init_state(jax.random.PRNGKey(1), BATCH,
                                         MAX_ATOMS, jnp.asarray(counts),
                                         cfg.num_net_classes)
        shape = jnp.asarray(rng.standard_normal((BATCH, 32, 3)), jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), p0, v0, m0, shape,
                             jnp.zeros((BATCH,), jnp.int32))
        scfg = smp.SamplerConfig(num_steps=SCAN)

        @jax.jit
        def run(key):
            return smp.sample_diffusion(net, sched, variables, key, p0, v0,
                                        m0, shape, scfg)["pos"]
        run(jax.random.PRNGKey(2)).block_until_ready()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(jax.random.PRNGKey(2)).block_until_ready()
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / SCAN * 1e3
        print(json.dumps({"variant": f"step_{impl}", "ms_per_step": ms,
                          "mol_per_s": BATCH / (min(ts))}))


if __name__ == "__main__":
    main()
