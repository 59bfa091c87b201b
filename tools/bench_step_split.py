"""Per-sampler-step time split on the real chip (VERDICT r3 item 5's
"Done" criterion: a layers / kNN / e_w / posterior split table).

Measures, each as a 1000-iteration jitted lax.scan at the protocol point
(batch 100, pad 32, 8 fused layers):

  full_step   — one complete reverse-diffusion step (sample_diffusion)
  forward     — the denoiser forward alone (net.apply)
  knn_ew      — kNN + global e_w MLP alone (the non-layer geometry work;
                also measured inside `forward`)
  posterior   — pos posterior mean/variance + noise add + categorical
                v-posterior sample alone

Derived: layers ~= forward - knn_ew; other ~= full_step - forward -
posterior. Prints one JSON line per row. Env: BENCH_BATCH (100),
BENCH_ATOMS (32), BENCH_SCAN (1000).
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
    from shapemol_tpu.models import diffusion as dfn
    from shapemol_tpu.models.denoiser import DenoiserConfig
    from shapemol_tpu.models.score_model import (ScoreModelConfig,
                                                 ShapeDiffusionNet)
    from shapemol_tpu.ops.knn import masked_knn_d_rank
    from shapemol_tpu.sample import sampler as smp

    rng = np.random.default_rng(0)
    cfg = ScoreModelConfig(
        num_diffusion_timesteps=SCAN, num_classes=15, hidden_dim=128,
        denoiser=DenoiserConfig(num_blocks=1, num_layers=8, hidden_dim=128,
                                n_heads=16, knn=8, num_r_gaussian=20,
                                shape_dim=32, shape_latent_dim=32))
    net = ShapeDiffusionNet(cfg)
    sched = cfg.make_schedule()
    counts = jnp.asarray(rng.integers(12, 28, BATCH))
    pos, v, mask = smp.make_init_state(jax.random.PRNGKey(1), BATCH,
                                       MAX_ATOMS, counts,
                                       cfg.num_net_classes)
    shape = jnp.asarray(rng.standard_normal((BATCH, 32, 3)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), pos, v, mask, shape,
                         jnp.zeros((BATCH,), jnp.int32))
    Knet = cfg.num_net_classes

    def timed(run, *args):
        jax.block_until_ready(run(*args))          # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts) / SCAN * 1e3

    # 1) full sampler step
    scfg = smp.SamplerConfig(num_steps=SCAN)

    @jax.jit
    def full(key):
        return smp.sample_diffusion(net, sched, variables, key, pos, v,
                                    mask, shape, scfg)["pos"]
    ms_full = timed(full, jax.random.PRNGKey(2))
    print(json.dumps({"part": "full_step", "ms": ms_full,
                      "mol_per_s": BATCH / (ms_full * 1e-3 * SCAN)}))

    # 2) denoiser forward alone
    @jax.jit
    def forward(p0):
        def step(carry, i):
            p, vv = carry
            t_vec = jnp.full((BATCH,), i, jnp.int32)
            preds = net.apply(variables, p, vv, mask, shape, t_vec,
                              train=False)
            return (preds["pred_ligand_pos"],
                    jnp.argmax(preds["pred_ligand_v"], -1)), None
        (pf, _), _ = jax.lax.scan(step, (p0, v),
                                  jnp.arange(SCAN, dtype=jnp.int32))
        return pf
    ms_fwd = timed(forward, pos)
    print(json.dumps({"part": "forward", "ms": ms_fwd}))

    # 3) kNN + e_w MLP alone (production rank impl + production widths,
    # shared approximation with bench_knn_step via bench_common)
    from bench_common import ew_mlp, make_ew_params
    w0, w1, offs = make_ew_params(rng)

    @jax.jit
    def knn_ew(p0):
        def step(p, _):
            idx, m, d = masked_knn_d_rank(p, mask, 8)
            ew = ew_mlp(d, w0, w1, offs)
            return p + 1e-9 * (ew * m).sum(), None
        pf, _ = jax.lax.scan(step, p0, None, length=SCAN)
        return pf
    ms_knn = timed(knn_ew, pos)
    print(json.dumps({"part": "knn_ew", "ms": ms_knn}))

    # 4) posterior update alone (pos posterior + v categorical posterior
    # sample, the non-network tail of each reverse step)
    log_v0 = dfn.index_to_log_onehot(v, Knet)

    @jax.jit
    def posterior(p0, key):
        def step(carry, i):
            p, k = carry
            k, kn, kc = jax.random.split(k, 3)
            t_vec = jnp.full((BATCH,), i, jnp.int32)
            mean = dfn.q_pos_posterior(sched, p0, p, t_vec)
            logvar = dfn.extract(sched.posterior_logvar, t_vec, p.ndim)
            noise = jax.random.normal(kn, p.shape)
            nonzero = (t_vec > 0).astype(p.dtype)[:, None, None]
            p_next = mean + nonzero * jnp.exp(0.5 * logvar) * noise
            log_post = dfn.q_v_posterior(sched, log_v0,
                                         dfn.index_to_log_onehot(v, Knet),
                                         t_vec)
            v_next = dfn.log_sample_categorical(kc, log_post)
            p_next = p_next + 1e-9 * v_next.sum()
            return (p_next, k), None
        (pf, _), _ = jax.lax.scan(step, (p0, key),
                                  jnp.arange(SCAN, dtype=jnp.int32))
        return pf
    ms_post = timed(posterior, pos, jax.random.PRNGKey(3))
    print(json.dumps({"part": "posterior", "ms": ms_post}))

    print(json.dumps({
        "part": "derived",
        "layers_ms": ms_fwd - ms_knn,
        "other_ms": ms_full - ms_fwd - ms_post,
        "split_pct": {
            "layers": round(100 * (ms_fwd - ms_knn) / ms_full, 1),
            "knn_ew": round(100 * ms_knn / ms_full, 1),
            "posterior": round(100 * ms_post / ms_full, 1),
            "other": round(100 * (ms_full - ms_fwd - ms_post) / ms_full, 1),
        }}))


if __name__ == "__main__":
    main()
