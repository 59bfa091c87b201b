"""Bisect the sampling-step time: which part of the 1000-step scan owns the
wall clock? (The bench is dtype-insensitive and batch-insensitive per
molecule, so MXU throughput is not the binding constraint.)

Variants timed (batch/pad from BENCH_BATCH/BENCH_ATOMS envs):
  full        - flagship 8-layer model, Pallas fused layers
  xla         - same model, use_pallas_attention=False (pure XLA layers)
  layers1     - 1-layer model, Pallas (layer-count scaling)
  layers4     - 4-layer model, Pallas
  no_net      - scan with the denoiser replaced by a zero-cost surrogate
                (isolates posterior math + categorical sampling + scan)

Prints one JSON line per variant.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 100))
MAX_ATOMS = int(os.environ.get("BENCH_ATOMS", 32))
STEPS = int(os.environ.get("BENCH_STEPS", 1000))


def build(num_layers=8, use_pallas=True):
    import jax
    import jax.numpy as jnp
    from shapemol_tpu.models.denoiser import DenoiserConfig
    from shapemol_tpu.models.score_model import (ScoreModelConfig,
                                                 ShapeDiffusionNet)
    from shapemol_tpu.sample import sampler as smp

    cfg = ScoreModelConfig(
        num_diffusion_timesteps=STEPS, num_classes=15, hidden_dim=128,
        denoiser=DenoiserConfig(num_blocks=1, num_layers=num_layers,
                                hidden_dim=128, n_heads=16, knn=8,
                                num_r_gaussian=20, shape_dim=32,
                                shape_latent_dim=32,
                                use_pallas_attention=use_pallas))
    net = ShapeDiffusionNet(cfg)
    sched = cfg.make_schedule()
    rng = np.random.default_rng(0)
    counts = jnp.asarray(rng.integers(12, 28, BATCH))
    pos, v, mask = smp.make_init_state(jax.random.PRNGKey(1), BATCH,
                                       MAX_ATOMS, counts, cfg.num_net_classes)
    shape = jnp.asarray(rng.standard_normal((BATCH, 32, 3)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), pos, v, mask, shape,
                         jnp.zeros((BATCH,), jnp.int32))
    return net, sched, variables, pos, v, mask, shape, smp, cfg


def timed(fn, *args):
    import jax
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run_variant(name, num_layers=8, use_pallas=True, no_net=False):
    import jax
    import jax.numpy as jnp
    net, sched, variables, pos, v, mask, shape, smp, cfg = build(
        num_layers, use_pallas)
    scfg = smp.SamplerConfig(num_steps=STEPS)

    if no_net == "knn":
        # surrogate keeping ONLY the per-step graph build (kNN + top-k +
        # RBF edge weights): isolates the graph-construction share
        from shapemol_tpu.ops.knn import masked_knn, gather_neighbors

        _c = cfg

        class _KnnSurrogate:
            cfg = _c
            def apply(self, _vars, p, vv, m, s, t, train=False):
                idx, nm = masked_knn(p, m, 8)
                nbr = gather_neighbors(p, idx)
                d = jnp.linalg.norm(p[:, :, None, :] - nbr + 1e-12, axis=-1)
                w = jnp.exp(-d).sum(axis=(2,))[..., None] * 1e-6
                oh = jax.nn.one_hot(vv, cfg.num_net_classes)
                return {"pred_ligand_pos": p * 0.999 + w,
                        "pred_ligand_v": oh * 5.0}
        surrogate = _KnnSurrogate()

        @jax.jit
        def sample(rng):
            return smp.sample_diffusion(surrogate, sched, {}, rng, pos, v,
                                        mask, shape, scfg)
    elif no_net:
        # surrogate: same sampler scan, but the network is a cheap linear
        # map of the state (keeps shapes/dtypes; ~zero FLOPs vs the model)
        _c2 = cfg

        class _Surrogate:
            cfg = _c2
            def apply(self, _vars, p, vv, m, s, t, train=False):
                oh = jax.nn.one_hot(vv, cfg.num_net_classes)
                return {"pred_ligand_pos": p * 0.999,
                        "pred_ligand_v": oh * 5.0}
        surrogate = _Surrogate()

        @jax.jit
        def sample(rng):
            return smp.sample_diffusion(surrogate, sched, {}, rng, pos, v,
                                        mask, shape, scfg)
    else:
        @jax.jit
        def sample(rng):
            return smp.sample_diffusion(net, sched, variables, rng, pos, v,
                                        mask, shape, scfg)

    dt = timed(sample, jax.random.PRNGKey(2))
    rec = {"variant": name, "ms_per_step": round(1e3 * dt / STEPS, 4),
           "mols_per_sec": round(BATCH / dt, 2),
           "batch": BATCH, "pad": MAX_ATOMS}
    print(json.dumps(rec), flush=True)


def main():
    from shapemol_tpu.core import misc
    misc.enable_compilation_cache()
    # BENCH_VARIANTS: comma-separated subset (the unfused 'xla' composition
    # faults the device at batch>=1024 — exclude it for large-batch runs)
    sel = os.environ.get("BENCH_VARIANTS")
    wanted = set(sel.split(",")) if sel else None
    for name, args, kw in [
            ("full", (8, True), {}),
            ("xla", (8, False), {}),
            ("layers4", (4, True), {}),
            ("layers1", (1, True), {}),
            ("no_net", (8, True), {"no_net": True}),
            ("knn_posterior", (8, True), {"no_net": "knn"})]:
        if wanted is None or name in wanted:
            run_variant(name, *args, **kw)


if __name__ == "__main__":
    main()
