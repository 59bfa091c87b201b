"""Worker for the 2-process fake-cluster test (run via test_distributed.py).

Each process: join the distributed runtime (CPU backend, 4 local virtual
devices -> 8 global), build the global data-parallel mesh, load its own
half of every global batch, convert host-local shards to global arrays, run
a few diffusion train steps, and print a parameter checksum. Both processes
must end with identical checksums (synchronized SPMD training)."""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    from shapemol_tpu.parallel import distributed as dist
    active = dist.initialize(coordinator_address=f"127.0.0.1:{port}",
                             num_processes=2, process_id=pid)
    assert active and jax.process_count() == 2
    assert len(jax.devices()) == 8, jax.devices()

    from shapemol_tpu.parallel.mesh import make_mesh
    from shapemol_tpu.models.denoiser import DenoiserConfig
    from shapemol_tpu.models.score_model import (ScoreModelConfig,
                                                 ShapeDiffusionNet)
    from shapemol_tpu.train.loops import make_diffusion_train_step
    from shapemol_tpu.train.train_state import (create_train_state,
                                                make_optimizer)

    cfg = ScoreModelConfig(
        num_diffusion_timesteps=10, num_classes=15, hidden_dim=16,
        denoiser=DenoiserConfig(num_blocks=1, num_layers=1, hidden_dim=16,
                                n_heads=2, knn=4, num_r_gaussian=20,
                                shape_dim=8, shape_latent_dim=8))
    net = ShapeDiffusionNet(cfg)
    mesh = make_mesh()

    GLOBAL_B, LOCAL_B, N = 16, 8, 12
    rng = np.random.default_rng(0)          # same stream on both hosts
    pos_g = rng.standard_normal((GLOBAL_B, N, 3)).astype(np.float32)
    v_g = rng.integers(0, 15, (GLOBAL_B, N)).astype(np.int32)
    mask_g = np.ones((GLOBAL_B, N), bool)
    shape_g = rng.standard_normal((GLOBAL_B, 8, 3)).astype(np.float32)

    # per-host slice (the BucketBatcher process_index/process_count path
    # does exactly this slicing)
    sl = slice(pid * LOCAL_B, (pid + 1) * LOCAL_B)
    local = {"pos": pos_g[sl], "v": v_g[sl], "node_mask": mask_g[sl],
             "shape_emb": shape_g[sl]}

    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(local["pos"]),
                         jnp.asarray(local["v"]),
                         jnp.asarray(local["node_mask"]),
                         jnp.asarray(local["shape_emb"]),
                         jnp.zeros((LOCAL_B,), jnp.int32))
    tx = make_optimizer(lr=1e-3)
    state = create_train_state(variables["params"],
                               variables.get("batch_stats"), tx)
    step = make_diffusion_train_step(net, cfg.make_schedule(), tx, mesh=mesh)

    losses = []
    for it in range(3):
        gb = dist.host_local_to_global(
            {k: jnp.asarray(v) for k, v in local.items()}, mesh)
        state, metrics = step(state, jax.random.PRNGKey(it), gb)
        losses.append(float(metrics["loss"]))

    checksum = float(sum(jnp.sum(jnp.abs(x))
                         for x in jax.tree_util.tree_leaves(state.params)))
    dist.sync_global_devices("done")
    print(f"RESULT pid={pid} checksum={checksum:.8f} "
          f"loss={losses[-1]:.6f}", flush=True)


if __name__ == "__main__":
    main()
