"""Train-step forward/backward split on the real chip (VERDICT r1 item 10).

Measures, on the flagship diffusion config at the training batch size:
  * full train step (value_and_grad + adam update)
  * forward-only loss evaluation (same jit, no grad)
  * sampler denoise step equivalent (forward, eval mode)
The difference full - fwd approximates the backward+update cost; printed as
a JSON line and meant for STATUS.md.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_train_step.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from shapemol_tpu.core import misc
from shapemol_tpu.models.denoiser import DenoiserConfig
from shapemol_tpu.models.score_model import ScoreModelConfig, ShapeDiffusionNet
from shapemol_tpu.train.loops import make_diffusion_train_step
from shapemol_tpu.train.train_state import create_train_state, make_optimizer

misc.enable_compilation_cache()
B, N, S = 32, 32, 32

cfg = ScoreModelConfig(
    num_diffusion_timesteps=1000, num_classes=15, hidden_dim=128,
    denoiser=DenoiserConfig(num_blocks=1, num_layers=8, hidden_dim=128,
                            n_heads=16, knn=8, num_r_gaussian=20,
                            shape_dim=32, shape_latent_dim=32))
net = ShapeDiffusionNet(cfg)
sched = cfg.make_schedule()
rng_np = np.random.default_rng(0)
batch = {
    "pos": jnp.asarray(rng_np.standard_normal((B, N, 3)), jnp.float32),
    "v": jnp.asarray(rng_np.integers(0, 15, (B, N)), jnp.int32),
    "node_mask": jnp.asarray(np.arange(N)[None] <
                             rng_np.integers(14, 27, B)[:, None]),
    "shape_emb": jnp.asarray(rng_np.standard_normal((B, S, 3)), jnp.float32),
}
variables = net.init(jax.random.PRNGKey(0), batch["pos"], batch["v"],
                     batch["node_mask"], batch["shape_emb"],
                     jnp.zeros((B,), jnp.int32))
tx = make_optimizer(lr=1e-3)
state = create_train_state(variables["params"],
                           variables.get("batch_stats"), tx)
step = make_diffusion_train_step(net, sched, tx)


@jax.jit
def fwd_loss(state, rng, batch):
    from shapemol_tpu.models.score_model import diffusion_loss
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    loss, _aux = diffusion_loss(net, sched, variables, rng, batch["pos"],
                                batch["v"], batch["node_mask"],
                                batch["shape_emb"], train=True)
    return loss


def timeit(fn, *a, n=20):
    out = fn(*a)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / n


rng = jax.random.PRNGKey(1)


def timeit_train(n=20):
    # the train step DONATES its state argument (real on TPU, a no-op on
    # CPU) — thread the returned state through, time the whole chain
    s, _ = step(state, rng, batch)
    jax.tree_util.tree_leaves(s.params)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        s, _ = step(s, rng, batch)
    jax.tree_util.tree_leaves(s.params)[0].block_until_ready()
    return (time.perf_counter() - t0) / n


params_host = jax.device_get(variables["params"])
bs_host = jax.device_get(variables.get("batch_stats"))
t_full = timeit_train()
# rebuild an undonated state for the fwd-only measurement (the original
# device buffers were consumed by the donating train step)
state = create_train_state(
    jax.tree_util.tree_map(jnp.asarray, params_host),
    None if bs_host is None
    else jax.tree_util.tree_map(jnp.asarray, bs_host), tx)
try:
    t_fwd = timeit(lambda: fwd_loss(state, rng, batch))
except Exception as e:
    print("fwd-only path failed:", e)
    t_fwd = float("nan")

print("RESULT " + json.dumps({
    "batch": B, "pad": N,
    "train_step_ms": round(1e3 * t_full, 3),
    "fwd_loss_ms": round(1e3 * t_fwd, 3),
    "bwd_plus_update_ms": round(1e3 * (t_full - t_fwd), 3),
    "fwd_fraction": round(t_fwd / t_full, 3),
}))
