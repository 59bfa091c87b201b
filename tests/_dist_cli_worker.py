"""Worker for the 2-process CLI fake-cluster test (VERDICT r2 item 7).

Exercises the REAL CLI entry points under a jax.distributed runtime:
  1. cli.train_shape_ae — stage-1 training with the sharded train step over
     the 8-device global mesh, per-host batch halves; prints a parameter
     checksum that must match across processes.
  2. cli.sample_sweep — one sweep bucket with --coordinator auto-sharding:
     each process must produce ONLY its own targets' result files.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_platforms", "cpu")
# a stale persistent cache (possibly enabled by sitecustomize) makes first
# compiles minutes-long and asymmetric across workers -> barrier timeouts;
# force a fresh per-worker cache dir before any compilation
_cache = os.path.join(sys.argv[3], f"p{sys.argv[2]}", "xla_cache")
os.makedirs(_cache, exist_ok=True)
os.environ["SHAPEMOL_XLA_CACHE"] = _cache
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
except Exception:
    pass

import numpy as np
import jax.numpy as jnp


def main():
    port, pid, workdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    coord = f"127.0.0.1:{port}"
    my = os.path.join(workdir, f"p{pid}")
    os.makedirs(my, exist_ok=True)

    # ---- stage 1: train_shape_ae CLI under the cluster
    cfg_yml = os.path.join(my, "shape.yml")
    with open(cfg_yml, "w") as f:
        f.write(f"""
data:
  dataset: toy
  name: shape
  loss_type: signed_distance
  path: unused.sdf
  processed_path: {my}
  version: v1
  shape_type: point_cloud
  num_samples: 64
  point_cloud_samples: 64
model:
  model_type: PointCloud_AE
  encoder: VN_DGCNN
  loss_type: signed_distance
  latent_dim: 4
  hidden_dim: 8
  point_dim: 3
  layer_num: 1
  num_k: 4
train:
  seed: 11
  batch_size: 8
  point_batch_size: 64
  max_iters: 4
  val_freq: 2
  max_grad_norm: 8.0
  optimizer:
    type: adam
    lr: 1.e-3
    weight_decay: 0
  scheduler:
    type: plateau
    factor: 0.6
    patience: 5
    min_lr: 1.e-6
""")
    from shapemol_tpu.cli import train_shape_ae
    sys.argv = ["train_shape_ae", cfg_yml, "--synthetic", "10",
                "--logdir", os.path.join(my, "logs"),
                "--coordinator", coord, "--num_processes", "2",
                "--process_id", str(pid)]
    train_shape_ae.main()
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8

    # checksum of the final best checkpoint's params
    import glob
    from shapemol_tpu.core.checkpoint import restore_checkpoint
    ckpt_dirs = glob.glob(os.path.join(my, "logs", "*", "checkpoints"))
    assert ckpt_dirs, "no checkpoint written"
    state, _meta = restore_checkpoint(ckpt_dirs[0], None)
    leaves = jax.tree_util.tree_leaves(state)
    checksum = float(sum(np.abs(np.asarray(x, dtype=np.float64)).sum()
                         for x in leaves
                         if np.issubdtype(np.asarray(x).dtype, np.number)))
    print(f"S1RESULT pid={pid} checksum={checksum:.6f}")

    # ---- sweep: tiny ckpt + pack (identical on both hosts by seed)
    from shapemol_tpu.chem import vocab
    from shapemol_tpu.core.checkpoint import save_checkpoint
    from shapemol_tpu.core.config import build_score_model_config, AttrDict
    from shapemol_tpu.data.packs import MoleculeRecord, write_pack
    from shapemol_tpu.models.score_model import ShapeDiffusionNet
    from shapemol_tpu.train.train_state import (create_train_state,
                                                make_optimizer)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_sample_sweep_cli import MODEL_CFG

    rng = np.random.default_rng(0)
    num_classes = vocab.feature_dim("add_aromatic")
    mc = build_score_model_config(AttrDict.convert(MODEL_CFG), num_classes)
    net = ShapeDiffusionNet(mc)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 3)),
                         jnp.zeros((1, 8), jnp.int32),
                         jnp.ones((1, 8), bool),
                         jnp.zeros((1, 8, 3)), jnp.zeros((1,), jnp.int32))
    state = create_train_state(variables["params"],
                               variables.get("batch_stats"),
                               make_optimizer())
    ckpt_dir = os.path.join(my, "dckpt")
    save_checkpoint(ckpt_dir, 1, state, config={"model": MODEL_CFG})
    records = [MoleculeRecord(
        pos=rng.standard_normal((10, 3)).astype(np.float32),
        v=rng.integers(0, 8, 10).astype(np.int32),
        shape_emb=rng.standard_normal((8, 3)).astype(np.float32),
        smiles=f"C{k}") for k in range(4)]
    pack = os.path.join(my, "toy_test_v1.shard000_00000.npz")
    write_pack(pack, records, n_max=16)
    sw_yml = os.path.join(my, "sampling.yml")
    with open(sw_yml, "w") as f:
        f.write("data:\n  name: shapemol\n  dataset: toy\n  version: toy\n"
                f"  processed_path: {my}\n"
                "  transform:\n    ligand_atom_mode: add_aromatic\n"
                "sample:\n  seed: 7\n  num_samples: 2\n  num_steps: 4\n"
                "  center_pos_mode: none\n  sample_num_atoms: size\n"
                "  guide_stren: 0.0\n  threshold_type: null\n")
    out_dir = os.path.join(my, "results")
    from shapemol_tpu.cli import sample_sweep
    sys.argv = ["sample_sweep", sw_yml, "--ckpt", ckpt_dir,
                "--test_pack", pack, "--result_path", out_dir,
                "--batch_size", "4", "--max_atoms", "16",
                "--start", "0", "--end", "4",
                "--coordinator", coord, "--num_processes", "2",
                "--process_id", str(pid)]
    sample_sweep.main()
    done = sorted(int(f.split("_")[1].split(".")[0])
                  for f in os.listdir(out_dir))
    print(f"SWEEPRESULT pid={pid} targets={done}")


if __name__ == "__main__":
    main()
