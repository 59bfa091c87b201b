"""Sampling CLI: generate molecules conditioned on test-set shapes.

Usage:
  python -m shapemol_tpu.cli.sample configs/sampling/default.yml \
      --ckpt <diffusion ckpt dir> --data_id 0 [--result_path ./results]

Functional parity target: scripts/sample_diffusion.py (clone one test datum
num_samples times, atom counts from the voxel-keyed prior ('size') or the
reference molecule ('ref'), random init, sample_diffusion, save
result_{data_id}); idempotent skip-if-exists sharding over --data_id.
TPU-native: the whole batch runs as one jitted lax.scan; guidance stays
on-device (pointcloud kNN / SDF grid).

Result file format (result_{data_id}.npz): pos (S,N,3), v (S,N) and the
trajectories are PADDED dense arrays — rows are meaningful ONLY where
node_mask (S,N) is True; padded rows contain sampler noise (pos) and -1 (v).
Consumers must apply node_mask before using pos/v (eval/evaluate.py does).
Same convention for ref_pos/ref_v under ref_node_mask."""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from shapemol_tpu.core import misc
from shapemol_tpu.core.checkpoint import latest_step, restore_checkpoint
from shapemol_tpu.core.config import (AttrDict, build_score_model_config,
                                      load_config)
from shapemol_tpu.chem import vocab
from shapemol_tpu.data.packs import PackDataset
from shapemol_tpu.models.score_model import ShapeDiffusionNet
from shapemol_tpu.sample import sampler as smp
from shapemol_tpu.sample.atom_prior import AtomNumPrior
from shapemol_tpu.train.train_state import create_train_state, make_optimizer


def load_diffusion_model(ckpt_dir: str, num_classes: int):
    step = latest_step(ckpt_dir)
    with open(os.path.join(ckpt_dir, f"step_{step}", "meta.json")) as f:
        meta = json.load(f)
    train_cfg = AttrDict.convert(meta["config"])
    model_cfg = build_score_model_config(train_cfg.model, num_classes)
    net = ShapeDiffusionNet(model_cfg)
    B, N, S = 1, 16, model_cfg.denoiser.shape_dim
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((B, N, 3)), jnp.zeros((B, N), jnp.int32),
                         jnp.ones((B, N), bool), jnp.zeros((B, S, 3)),
                         jnp.zeros((B,), jnp.int32))
    # checkpoints trained with train.ema_decay carry ema_params; sample
    # from the EMA weights when available (standard diffusion practice)
    try:
        template = create_train_state(variables["params"],
                                      variables.get("batch_stats"),
                                      make_optimizer(), ema=True)
        state, _ = restore_checkpoint(ckpt_dir, template, step)
    except Exception:
        template = create_train_state(variables["params"],
                                      variables.get("batch_stats"),
                                      make_optimizer())
        state, _ = restore_checkpoint(ckpt_dir, template, step)
    params = state.ema_params if getattr(state, "ema_params",
                                         None) is not None else state.params
    return net, model_cfg, {"params": params,
                            "batch_stats": state.batch_stats}, train_cfg


def main():
    misc.enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--data_id", type=int, default=0)
    p.add_argument("--end_id", type=int, default=None,
                   help="sample targets [data_id, end_id) in ONE process "
                        "(model load + compile paid once; per-target "
                        "results stay idempotent)")
    p.add_argument("--test_pack", default=None,
                   help="pack pattern with test shapes (defaults to the "
                        "processed test set in the config)")
    p.add_argument("--result_path", default="./results")
    p.add_argument("--batch_size", type=int, default=100)
    p.add_argument("--max_atoms", type=int, default=48)
    p.add_argument("--atomnum_prior", default=None,
                   help="pickle with {voxel_count: {n_atoms: freq}}")
    p.add_argument("--record_traj", action="store_true",
                   help="store the full reverse trajectory (pos_traj/v_traj "
                        "per sample) for --eval_step evaluation "
                        "(reference pred_ligand_pos_traj, "
                        "scripts/sample_diffusion.py:118-157)")
    args = p.parse_args()

    cfg = load_config(args.config)
    misc.seed_all(cfg.sample.seed)
    logger = misc.get_logger("sample")
    os.makedirs(args.result_path, exist_ok=True)
    end_id = args.end_id if args.end_id is not None else args.data_id + 1
    todo = [i for i in range(args.data_id, end_id)
            if not os.path.exists(os.path.join(args.result_path,
                                               f"result_{i}.npz"))]
    for i in range(args.data_id, end_id):
        if i not in todo:
            logger.info(f"result_{i}.npz exists — skipping (idempotent)")
    if not todo:
        return

    atom_mode = cfg.data.get_path("transform.ligand_atom_mode", "add_aromatic")
    num_classes = vocab.feature_dim(atom_mode)
    net, model_cfg, variables, _tc = load_diffusion_model(args.ckpt,
                                                          num_classes)

    pack_pattern = args.test_pack or cfg.data.get("pack_pattern") \
        or os.path.join(
            cfg.data.get("processed_path", "./processed_data"),
            f"shapemol_{cfg.data.get('version', 'v1')}.*.npz")
    test_set = PackDataset(pack_pattern)
    for data_id in todo:
        _sample_one(args, cfg, logger, atom_mode, net, model_cfg,
                    variables, test_set, data_id)


def _sample_one(args, cfg, logger, atom_mode, net, model_cfg, variables,
                test_set, data_id):
    out_file = os.path.join(args.result_path, f"result_{data_id}.npz")
    datum = test_set[data_id]
    logger.info(f"target {data_id}: "
                f"{int(datum['node_mask'].sum())} atoms")

    num_samples = cfg.sample.num_samples
    bs = min(args.batch_size, num_samples)
    N = args.max_atoms
    S = datum["shape_emb"].shape[0]

    # atom-count distribution
    mode = cfg.sample.get("sample_num_atoms", "size")
    rng_np = np.random.default_rng(cfg.sample.seed + data_id)
    ref_n = int(datum["node_mask"].sum())
    if mode == "size" and args.atomnum_prior \
            and os.path.exists(args.atomnum_prior):
        prior = AtomNumPrior.load(args.atomnum_prior)
        ref_pos = datum["pos"][datum["node_mask"]]
        ref_v = datum["v"][datum["node_mask"]]
        from shapemol_tpu.geom.voxel import voxel_count
        nv = voxel_count(np.asarray(vocab.get_atomic_numbers(ref_v, atom_mode)),
                         ref_pos)
        sample_counts = prior.sample(nv, num_samples, rng_np)
        logger.info(f"atom prior: voxel count {nv}")
    else:
        sample_counts = np.full(num_samples, ref_n)
    sample_counts = np.clip(sample_counts, 3, N)

    # guidance configuration
    guidance = "none"
    cloud = sdf_grid = sdf_origin = None
    if cfg.sample.get("use_pointcloud", False):
        guidance = "pointcloud"
    elif cfg.sample.get("use_mesh", False):
        guidance = "mesh_sdf"
    scfg = smp.SamplerConfig(
        num_steps=cfg.sample.get("num_steps",
                                 model_cfg.num_diffusion_timesteps),
        center_pos_mode=cfg.sample.get("center_pos_mode", "none"),
        guide_stren=cfg.sample.get("guide_stren", 0.0),
        threshold_type=cfg.sample.get("threshold_type", None),
        threshold_args=dict(cfg.sample.get("threshold_args", {}) or {}),
        guidance=guidance,
        grad_step=cfg.sample.get("grad_step", 0),
        pointcloud_radius=cfg.sample.get("use_pointcloud_radius", 0.2),
        record_traj=args.record_traj,
    )

    shape = jnp.asarray(np.tile(datum["shape_emb"][None], (bs, 1, 1)))
    # the reference applies the bounds clamp only inside its CFG branch
    # (molopt_score_model.py:616-642, config guide_stren > 0); with this
    # framework's corrected CFG the clamp is useful standalone, so it can
    # be enabled independently via sample.use_bound
    use_bound = bool(cfg.sample.get("use_bound", scfg.guide_stren > 0))
    bounds = (jnp.asarray(np.tile(datum["bounds"][None], (bs, 1, 1)))
              if "bounds" in datum and use_bound else None)
    if guidance == "pointcloud":
        # volume-filling Gaussian cloud, shared construction with the
        # sweep CLI (parity constants live in sample/clouds.py)
        from shapemol_tpu.sample.clouds import build_guidance_cloud
        pts = build_guidance_cloud(datum["pos"][datum["node_mask"]], N,
                                   cfg.sample.seed + data_id, data_id)
        cloud = jnp.asarray(np.tile(pts[None], (bs, 1, 1)))
    if guidance == "mesh_sdf":
        from shapemol_tpu.geom.shape_emb import sdf_grid_for_guidance
        ref_pos = datum["pos"][datum["node_mask"]]
        ref_v = datum["v"][datum["node_mask"]]
        g, o, sp = sdf_grid_for_guidance(
            np.asarray(vocab.get_atomic_numbers(ref_v, atom_mode)), ref_pos)
        sdf_grid = jnp.asarray(np.tile(g[None], (bs, 1, 1, 1)))
        sdf_origin = jnp.asarray(np.tile(o[None], (bs, 1)))

    @jax.jit
    def run(rng, counts):
        pos0, v0, mask = smp.make_init_state(rng, bs, N, counts,
                                             model_cfg.num_net_classes)
        out = smp.sample_diffusion(net, model_cfg.make_schedule(), variables,
                                   rng, pos0, v0, mask, shape, scfg,
                                   bounds=bounds, cloud=cloud,
                                   sdf_grid=sdf_grid, sdf_origin=sdf_origin)
        traj = ((out["pos_traj"], out["v_traj"]) if args.record_traj
                else (jnp.zeros((0,)), jnp.zeros((0,))))
        return out["pos"], out["v"], mask, traj

    all_pos, all_v, all_mask, time_list = [], [], [], []
    all_ptraj, all_vtraj = [], []
    rng = jax.random.PRNGKey(cfg.sample.seed + data_id)
    for b0 in range(0, num_samples, bs):
        rng, sub = jax.random.split(rng)
        counts = jnp.asarray(sample_counts[b0:b0 + bs])
        if len(counts) < bs:
            counts = jnp.pad(counts, (0, bs - len(counts)),
                             constant_values=int(sample_counts[0]))
        t0 = time.perf_counter()
        pos, v, mask, (ptraj, vtraj) = run(sub, counts)
        pos.block_until_ready()
        dt = time.perf_counter() - t0
        time_list.append(dt)
        take = min(bs, num_samples - b0)
        all_pos.append(np.asarray(pos)[:take])
        all_v.append(np.asarray(v)[:take])
        all_mask.append(np.asarray(mask)[:take])
        if args.record_traj:
            # scan stacks along time (steps, B, N, ...); store per-sample
            # [num_samples, num_steps, ...] like the reference
            all_ptraj.append(np.asarray(ptraj).swapaxes(0, 1)[:take])
            all_vtraj.append(np.asarray(vtraj).swapaxes(0, 1)[:take])
        logger.info(f"batch {b0 // bs}: {take} molecules in {dt:.2f}s "
                    f"({take / dt:.2f} mol/s)")

    mask_all = np.concatenate(all_mask)
    # sentinel -1 on padded v rows (same contract as cli/sample_sweep.py):
    # consumers that ignore node_mask must not mistake sampler-init noise
    # for class-0..K atoms
    v_all = np.where(mask_all, np.concatenate(all_v), -1)
    extra = {}
    if args.record_traj:
        extra["pos_traj"] = np.concatenate(all_ptraj)
        extra["v_traj"] = np.where(mask_all[:, None, :],
                                   np.concatenate(all_vtraj), -1)
    np.savez_compressed(
        out_file,
        pos=np.concatenate(all_pos), v=v_all,
        node_mask=mask_all,
        ref_pos=datum["pos"],
        ref_v=np.where(datum["node_mask"], datum["v"], -1),
        ref_node_mask=datum["node_mask"],
        time_list=np.asarray(time_list), data_id=data_id,
        atom_mode=atom_mode, **extra)
    logger.info(f"saved {out_file}")


if __name__ == "__main__":
    main()
