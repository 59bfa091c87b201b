"""Measure the per-batch sampling cost at each candidate pad size and write
the cost table consumed by cli/sample_sweep.py's bucket planner
(shapemol_tpu/sample/bucket_plan.py).

Usage:
  PYTHONPATH=/root/repo python tools/measure_pad_costs.py \
      [--out shapemol_tpu/sample/pad_costs.json] [--batch 100] [--steps 100]

Costs are measured on the flagship model config with a `--steps`-step scan
and scaled to the 1000-step protocol (cost is linear in steps after
compile). Run on the real chip; results are chip+model specific.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "shapemol_tpu", "sample",
        "pad_costs.json"))
    p.add_argument("--batch", type=int, default=100)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--pads", default="8,12,16,20,24,28,32,40,48")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from shapemol_tpu.core import misc
    from shapemol_tpu.models.denoiser import DenoiserConfig
    from shapemol_tpu.models.score_model import (ScoreModelConfig,
                                                 ShapeDiffusionNet)
    from shapemol_tpu.sample import sampler as smp

    misc.enable_compilation_cache()
    cfg = ScoreModelConfig(
        num_diffusion_timesteps=1000, num_classes=15, hidden_dim=128,
        denoiser=DenoiserConfig(num_blocks=1, num_layers=8, hidden_dim=128,
                                n_heads=16, knn=8, num_r_gaussian=20,
                                shape_dim=32, shape_latent_dim=32))
    net = ShapeDiffusionNet(cfg)
    sched = cfg.make_schedule()
    scfg = smp.SamplerConfig(num_steps=args.steps)
    rng_np = np.random.default_rng(0)

    table = {}
    for pad in [int(x) for x in args.pads.split(",")]:
        counts = jnp.asarray(rng_np.integers(max(3, pad - 6), pad + 1,
                                             args.batch))
        pos, v, mask = smp.make_init_state(jax.random.PRNGKey(0),
                                           args.batch, pad, counts,
                                           cfg.num_net_classes)
        shape = jnp.asarray(rng_np.standard_normal((args.batch, 32, 3)),
                            jnp.float32)
        variables = net.init(jax.random.PRNGKey(1), pos, v, mask, shape,
                             jnp.zeros((args.batch,), jnp.int32))

        @jax.jit
        def run(r):
            return smp.sample_diffusion(net, sched, variables, r, pos, v,
                                        mask, shape, scfg)

        out = run(jax.random.PRNGKey(2))
        out["pos"].block_until_ready()
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            out = run(jax.random.PRNGKey(3 + i))
            out["pos"].block_until_ready()
            ts.append(time.perf_counter() - t0)
        ms_1000 = min(ts) * 1000.0 * (1000.0 / args.steps)
        table[pad] = round(ms_1000, 2)
        print(f"pad {pad}: {ms_1000:.1f} ms per {args.batch}-batch "
              f"(1000-step scale)", flush=True)

    out_path = os.path.abspath(args.out)
    with open(out_path, "w") as f:
        json.dump({"per_batch_ms": table, "batch": args.batch,
                   "model": "flagship-8L-128d", "chip": "v5e"}, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
