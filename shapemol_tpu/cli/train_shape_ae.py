"""Stage-1 training CLI: the shape point-cloud autoencoder.

Usage:
  python -m shapemol_tpu.cli.train_shape_ae configs/shape/pointcloud_ae.yml \
      [--logdir logs] [--tag t] [--max_iters N] [--synthetic N]

Functional parity target: scripts/train_shapeAE.py (config surface, train
loss + clip 8.0, val loss/acc/recall, plateau scheduler, best-ckpt save).
TPU-native: jitted train step on a data-parallel mesh; preprocessing builds
dense packs instead of LMDB.
"""
from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from shapemol_tpu.core.config import load_config, build_shape_ae_config
from shapemol_tpu.core import misc
from shapemol_tpu.core.checkpoint import save_checkpoint
from shapemol_tpu.data.preprocess import (preprocess_shape_dataset,
                                          ShapePackDataset)
from shapemol_tpu.models.shape_ae import PointCloudAE
from shapemol_tpu.train.loops import (make_shape_ae_train_step,
                                      make_shape_ae_eval_step)
from shapemol_tpu.train.train_state import (create_train_state, get_scheduler,
                                            make_optimizer, set_learning_rate,
                                            get_learning_rate)


def main():
    misc.enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--logdir", default="./logs")
    p.add_argument("--tag", default="")
    p.add_argument("--max_iters", type=int, default=None)
    p.add_argument("--val_freq", type=int, default=None)
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic molecules instead of reading "
                        "data.path (smoke runs)")
    p.add_argument("--num_workers", type=int, default=0)
    p.add_argument("--resume", default=None,
                   help="checkpoint dir (…/checkpoints) to resume from")
    p.add_argument("--mesh", type=int, default=0,
                   help="data-parallel mesh size (0 = single device)")
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 for multi-host runs "
                        "(jax.distributed)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    args = p.parse_args()

    cfg = load_config(args.config)
    misc.seed_all(cfg.train.seed)
    if cfg.model.get("model_type", "pointAE") in ("voxelAE", "IM_AE"):
        return train_voxel_ae(cfg, args)

    # multi-host runtime: join the coordinator BEFORE any device query so
    # the mesh below spans the GLOBAL device set (SURVEY §2.4 mapping)
    from shapemol_tpu.parallel import distributed as dist
    from shapemol_tpu.parallel.mesh import make_mesh
    is_dist = dist.initialize(args.coordinator, args.num_processes,
                              args.process_id)
    pid, pcount = dist.process_shard()

    log_dir = misc.get_new_log_dir(args.logdir, prefix="shape_ae",
                                   tag=(args.tag + (f"p{pid}" if is_dist
                                                    else "")))
    logger = misc.get_logger("train_shape_ae", log_dir)
    logger.info(f"process {pid}/{pcount}, devices: {jax.devices()}")
    from shapemol_tpu.core.metrics import MetricsWriter
    mw = MetricsWriter(log_dir)

    # ---- data
    pack_pattern = os.path.join(
        cfg.data.get("processed_path", "./processed_data"),
        f"shape_{cfg.data.get('version', 'v1')}.*.npz")
    if not glob.glob(pack_pattern):
        if args.synthetic:
            from shapemol_tpu.data.synthetic import random_dataset
            mols = random_dataset(args.synthetic, seed=cfg.train.seed)
        elif str(cfg.data.get("path", "")).endswith(".pkl"):
            from shapemol_tpu.compat.rdkit_unpickle import load_rdkit_mol_pickle
            mols = load_rdkit_mol_pickle(cfg.data.path)
        else:
            from shapemol_tpu.chem.sdf import read_sdf
            mols = read_sdf(cfg.data.path)
        logger.info(f"preprocessing {len(mols)} molecules -> packs")
        preprocess_shape_dataset(
            mols, pack_pattern.replace(".*.npz", ""),
            point_cloud_samples=cfg.data.get("point_cloud_samples", 512),
            num_query=cfg.data.get("num_samples", 1024),
            num_workers=args.num_workers)
    dataset = ShapePackDataset(pack_pattern)
    n = len(dataset)
    n_val = max(min(n // 10, 256), 1)
    val_idx = np.arange(n - n_val, n)
    train_idx = np.arange(n - n_val)
    logger.info(f"dataset: {n} clouds ({len(train_idx)} train/{n_val} val)")

    # ---- model/optim
    model_cfg = build_shape_ae_config(cfg.model)
    model = PointCloudAE(model_cfg)
    bs = cfg.train.batch_size
    pbs = cfg.train.get("point_batch_size", 1024)
    rng_np = np.random.default_rng(cfg.train.seed)
    example = dataset.batch(train_idx[:bs] if len(train_idx) >= bs
                            else train_idx, point_batch_size=pbs, rng=rng_np)
    variables = model.init(jax.random.PRNGKey(cfg.train.seed),
                           jnp.asarray(example["point_cloud"]),
                           jnp.asarray(example["query_points"]))
    logger.info(f"params: {misc.count_parameters(variables['params']):,}")

    tx = make_optimizer(lr=cfg.train.optimizer.lr,
                        beta1=cfg.train.optimizer.get("beta1", 0.95),
                        beta2=cfg.train.optimizer.get("beta2", 0.999),
                        weight_decay=cfg.train.optimizer.get("weight_decay", 0),
                        max_grad_norm=cfg.train.get("max_grad_norm", 8.0))
    state = create_train_state(variables["params"],
                               variables.get("batch_stats"), tx)
    sched = get_scheduler(cfg.train.scheduler.type,
                          **{k: v for k, v in cfg.train.scheduler.items()
                             if k != "type"})
    # multi-host runs always need the sharded step over the global mesh
    mesh = (make_mesh(args.mesh) if args.mesh > 1
            else (make_mesh() if is_dist else None))
    train_step = make_shape_ae_train_step(model, tx, mesh=mesh)
    eval_step = make_shape_ae_eval_step(model)

    max_iters = args.max_iters or cfg.train.max_iters
    val_freq = args.val_freq or cfg.train.val_freq
    best_val = float("inf")
    start_it = 1
    if args.resume:
        from shapemol_tpu.core.checkpoint import restore_checkpoint
        state, meta = restore_checkpoint(args.resume, state)
        start_it = int(meta.get("step", 0)) + 1
        if not meta.get("scheduler"):
            logger.warning(
                "resume checkpoint has no scheduler metadata: best-val "
                "resets to inf, so the first post-resume validation will "
                "overwrite the best checkpoint even if worse")
        for k, v in (meta.get("scheduler") or {}).items():
            if hasattr(sched, k):
                setattr(sched, k, type(getattr(sched, k))(float(v)))
        best_val = float((meta.get("scheduler") or {}).get("best", best_val))
        logger.info(f"resumed from {args.resume} at it {start_it - 1} "
                    f"(lr {get_learning_rate(state):.2e}); note best "
                    f"checkpoints are written on val improvement — resuming "
                    f"from a best checkpoint replays iterations trained "
                    f"after it (use checkpoints_latest for the newest state)")

    for it in range(start_it, max_iters + 1):
        # every process follows the same rng stream (identical idxs) and
        # loads only its own slice of each global batch
        idxs = rng_np.choice(train_idx, size=bs,
                             replace=len(train_idx) < bs)
        if pcount > 1:
            lbs = bs // pcount
            local = idxs[pid * lbs:(pid + 1) * lbs]
        else:
            local = idxs
        batch = dataset.batch(local, point_batch_size=pbs, rng=rng_np)
        batch = {"point_cloud": jnp.asarray(batch["point_cloud"]),
                 "query_points": jnp.asarray(batch["query_points"]),
                 "values": jnp.asarray(batch["values"])}
        if is_dist:
            batch = dist.host_local_to_global(batch, mesh)
        state, metrics = train_step(state, batch)
        if it % 100 == 0 or it == 1:
            logger.info(f"[train] it {it} loss {float(metrics['loss']):.6f} "
                        f"grad {float(metrics['grad_norm']):.4f} "
                        f"lr {get_learning_rate(state):.2e}")
            # reference scalar surface (scripts/train_shapeAE.py:109-122)
            mw.scalars({"loss": metrics["loss"],
                        "grad_norm": metrics["grad_norm"],
                        "lr": get_learning_rate(state)}, it, prefix="train/")
        if it % val_freq == 0 or it == max_iters:
            losses, accs, recs = [], [], []
            # shard val across hosts only when every host gets rows (an
            # empty shard would inject nan into the cross-host mean)
            my_val = (val_idx[pid::pcount]
                      if pcount > 1 and len(val_idx) >= pcount else val_idx)
            # under the multi-host runtime the train state lives as global
            # (replicated) arrays; evaluation runs host-locally on a
            # fetched copy so the local jit never mixes device sets
            eval_state = (jax.device_get(state) if is_dist else state)
            for v0 in range(0, len(my_val), bs):
                vb = dataset.batch(my_val[v0:v0 + bs],
                                   point_batch_size=pbs, rng=rng_np)
                loss, acc, rec = eval_step(eval_state, {
                    "point_cloud": jnp.asarray(vb["point_cloud"]),
                    "query_points": jnp.asarray(vb["query_points"]),
                    "values": jnp.asarray(vb["values"])})
                losses.append(float(loss))
                accs.append(float(acc))
                recs.append(float(rec))
            # each host scores its own val shard; average across hosts so
            # every process drives the LR scheduler identically
            val_loss = dist.all_processes_mean(float(np.mean(losses)))
            logger.info(f"[val] it {it} loss {val_loss:.6f} "
                        f"acc {np.mean(accs):.4f} recall {np.mean(recs):.4f}")
            mw.scalars({"loss": val_loss, "acc": float(np.mean(accs)),
                        "recall": float(np.mean(recs))}, it, prefix="val/")
            new_lr = sched.step(val_loss, get_learning_rate(state))
            state = set_learning_rate(state, new_lr)
            # periodic 'latest' checkpoint (keep=1) so --resume can pick up
            # the newest state, not just the last val improvement
            save_checkpoint(os.path.join(log_dir, "checkpoints_latest"),
                            it, state, config=dict(cfg),
                            scheduler_state=dict(vars(sched), best=best_val),
                            keep=1)
            if val_loss < best_val:
                best_val = val_loss
                path = save_checkpoint(os.path.join(log_dir, "checkpoints"),
                                       it, state,
                                       config=dict(cfg),
                                       scheduler_state=vars(sched))
                logger.info(f"[ckpt] best val {best_val:.6f} -> {path}")
    logger.info("done")


def train_voxel_ae(cfg, args):
    """Voxel-AE training branch (reference: scripts/train_shapeAE.py with an
    IM_AE model config + shape_type 'voxel' data — models/shape_modelAE.py,
    datasets/shape_data.py:121-122,189-202)."""
    from shapemol_tpu.data.preprocess import (preprocess_voxel_dataset,
                                              VoxelPackDataset)
    from shapemol_tpu.models.voxel_ae import VoxelAE, VoxelAEConfig
    from shapemol_tpu.train.loops import (make_voxel_ae_train_step,
                                          make_voxel_ae_eval_step)

    log_dir = misc.get_new_log_dir(args.logdir, prefix="voxel_ae",
                                   tag=args.tag)
    logger = misc.get_logger("train_voxel_ae", log_dir)
    logger.info(f"devices: {jax.devices()}")

    pack_pattern = os.path.join(
        cfg.data.get("processed_path", "./processed_data"),
        f"voxel_{cfg.data.get('version', 'v1')}.*.npz")
    if not glob.glob(pack_pattern):
        if args.synthetic:
            from shapemol_tpu.data.synthetic import random_dataset
            mols = random_dataset(args.synthetic, seed=cfg.train.seed)
        elif str(cfg.data.get("path", "")).endswith(".pkl"):
            from shapemol_tpu.compat.rdkit_unpickle import load_rdkit_mol_pickle
            mols = load_rdkit_mol_pickle(cfg.data.path)
        else:
            from shapemol_tpu.chem.sdf import read_sdf
            mols = read_sdf(cfg.data.path)
        logger.info(f"voxelizing {len(mols)} molecules -> packs")
        preprocess_voxel_dataset(
            mols, pack_pattern.replace(".*.npz", ""),
            grid_resolution=cfg.data.get("grid_resolution", 0.5),
            max_dist=cfg.data.get("max_dist", 11.0),
            num_workers=args.num_workers)
    dataset = VoxelPackDataset(pack_pattern)
    n = len(dataset)
    n_val = max(min(n // 10, 256), 1)
    val_idx = np.arange(n - n_val, n)
    train_idx = np.arange(n - n_val)
    logger.info(f"dataset: {n} voxel grids (G={dataset.grid_size}; "
                f"{len(train_idx)} train/{n_val} val)")

    mcfg = VoxelAEConfig(ef_dim=cfg.model.get("ef_dim", 32),
                         gf_dim=cfg.model.get("gf_dim", 128),
                         z_dim=cfg.model.get("z_dim", 128))
    model = VoxelAE(mcfg)
    bs = cfg.train.batch_size
    nq = cfg.data.get("num_samples", 1024)
    rng_np = np.random.default_rng(cfg.train.seed)
    example = dataset.batch(train_idx[:min(bs, len(train_idx))],
                            num_samples=nq, rng=rng_np)
    variables = model.init(jax.random.PRNGKey(cfg.train.seed),
                           jnp.asarray(example["voxel"]),
                           jnp.asarray(example["points"]))
    logger.info(f"params: {misc.count_parameters(variables['params']):,}")

    tx = make_optimizer(lr=cfg.train.optimizer.lr,
                        beta1=cfg.train.optimizer.get("beta1", 0.95),
                        beta2=cfg.train.optimizer.get("beta2", 0.999),
                        weight_decay=cfg.train.optimizer.get("weight_decay", 0),
                        max_grad_norm=cfg.train.get("max_grad_norm", 8.0))
    state = create_train_state(variables["params"], None, tx)
    sched = get_scheduler(cfg.train.scheduler.type,
                          **{k: v for k, v in cfg.train.scheduler.items()
                             if k != "type"})
    train_step = make_voxel_ae_train_step(model, tx)
    eval_step = make_voxel_ae_eval_step(model)

    max_iters = args.max_iters or cfg.train.max_iters
    val_freq = args.val_freq or cfg.train.val_freq
    best_val = float("inf")
    for it in range(1, max_iters + 1):
        idxs = rng_np.choice(train_idx, size=bs,
                             replace=len(train_idx) < bs)
        batch = dataset.batch(idxs, num_samples=nq, rng=rng_np)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = train_step(state, batch)
        if it % 100 == 0 or it == 1:
            logger.info(f"[train] it {it} loss {float(metrics['loss']):.6f} "
                        f"lr {get_learning_rate(state):.2e}")
        if it % val_freq == 0 or it == max_iters:
            losses, accs, recs = [], [], []
            for v0 in range(0, len(val_idx), bs):
                vb = dataset.batch(val_idx[v0:v0 + bs], num_samples=nq,
                                   rng=rng_np)
                loss, acc, rec = eval_step(
                    state, {k: jnp.asarray(v) for k, v in vb.items()})
                losses.append(float(loss))
                accs.append(float(acc))
                recs.append(float(rec))
            val_loss = float(np.mean(losses))
            logger.info(f"[val] it {it} loss {val_loss:.6f} "
                        f"acc {np.mean(accs):.4f} recall {np.mean(recs):.4f}")
            new_lr = sched.step(val_loss, get_learning_rate(state))
            state = set_learning_rate(state, new_lr)
            if val_loss < best_val:
                best_val = val_loss
                path = save_checkpoint(os.path.join(log_dir, "checkpoints"),
                                       it, state, config=dict(cfg),
                                       scheduler_state=vars(sched))
                logger.info(f"[ckpt] best val {best_val:.6f} -> {path}")
    logger.info("done")


def load_voxel_encoder(ckpt_dir: str, logger=None):
    """Jitted batched voxel encoder from a voxel-AE checkpoint: a (B, G, G,
    G, 1) occupancy batch -> (B, z_dim) latents (the reference's
    build_voxel_shapeAE_model + SubprocShapeAE encode path,
    utils/shape.py:186-224, redesigned as one jitted sweep)."""
    import json as _json

    import jax as _jax
    import jax.numpy as _jnp

    from shapemol_tpu.core.checkpoint import latest_step, restore_checkpoint
    from shapemol_tpu.models.voxel_ae import VoxelAE, VoxelAEConfig
    from shapemol_tpu.train.train_state import (create_train_state,
                                                make_optimizer)

    step = latest_step(ckpt_dir)
    with open(os.path.join(ckpt_dir, f"step_{step}", "meta.json")) as f:
        meta = _json.load(f)
    mcfg_raw = (meta.get("config") or {}).get("model", {})
    mcfg = VoxelAEConfig(ef_dim=int(mcfg_raw.get("ef_dim", 32)),
                         gf_dim=int(mcfg_raw.get("gf_dim", 128)),
                         z_dim=int(mcfg_raw.get("z_dim", 128)))
    model = VoxelAE(mcfg)
    G = int(mcfg_raw.get("grid_size", 45))
    variables = model.init(jax.random.PRNGKey(0),
                           _jnp.zeros((1, G, G, G, 1)),
                           _jnp.zeros((1, 8, 3)))
    template = create_train_state(variables["params"], None,
                                  make_optimizer())
    state, _ = restore_checkpoint(ckpt_dir, template, step)
    if logger:
        logger.info(f"voxel encoder: z_dim={mcfg.z_dim} from {ckpt_dir} "
                    f"@ step {step}")

    @_jax.jit
    def encode(voxels):
        return model.apply({"params": state.params},
                           _jnp.asarray(voxels, _jnp.float32),
                           method=model.encode)

    return encode


if __name__ == "__main__":
    main()
