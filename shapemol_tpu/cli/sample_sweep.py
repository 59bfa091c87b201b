"""Pod-scale generation sweep: sample MANY targets in one run by packing
different conditioning shapes into each device batch (the sampler is fully
batched over per-row shape latents, so one jit serves the whole sweep).

The reference shards one-target-per-job over --data_id with batch=100 clones
(scripts/sample_diffusion.py:168-175); this sweep instead fills every batch
row with (target, sample) pairs — no wasted rows when num_samples < batch —
and optionally shards targets across hosts (--shard_index/--num_shards).

Usage:
  python -m shapemol_tpu.cli.sample_sweep configs/sampling/default.yml \
      --ckpt <dir> --start 0 --end 1000 [--batch_size 100] [--profile]

Result file format (result_{t}.npz): pos (S,N,3) and v (S,N) are PADDED
dense arrays — rows are meaningful ONLY where node_mask (S,N) is True;
padded rows contain sampler noise (pos) and -1 (v). Consumers must apply
node_mask before using pos/v (eval/evaluate.py does). Same convention for
ref_pos/ref_v under ref_node_mask.
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from shapemol_tpu.chem import vocab
from shapemol_tpu.core import misc
from shapemol_tpu.core.config import load_config
from shapemol_tpu.data.packs import PackDataset
from shapemol_tpu.sample import sampler as smp
from shapemol_tpu.sample.atom_prior import AtomNumPrior
from shapemol_tpu.cli.sample import load_diffusion_model


def main():
    misc.enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--end", type=int, default=10)
    p.add_argument("--test_pack", default=None)
    p.add_argument("--result_path", default="./results")
    p.add_argument("--batch_size", type=int, default=100)
    p.add_argument("--max_atoms", type=int, default=48)
    p.add_argument("--atomnum_prior", default=None)
    p.add_argument("--shard_index", type=int, default=None,
                   help="target shard of this job (defaults to the "
                        "process index under the multi-host runtime)")
    p.add_argument("--num_shards", type=int, default=None)
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 — joins the jax.distributed "
                        "runtime and auto-shards targets per process "
                        "(generation is embarrassingly parallel, so each "
                        "process samples its own targets on its local "
                        "devices; no cross-host collectives needed)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--guide_stren", type=float, default=None,
                   help="override sample.guide_stren (classifier-free "
                        "guidance strength; >0 requires a CFG-trained "
                        "checkpoint, configs/training/moses2_real_cfg.yml)")
    p.add_argument("--threshold_type", default=None,
                   help="override sample.threshold_type for CFG mixing: "
                        "reference_threshold | dynamic_threshold | rescale "
                        "| none")
    p.add_argument("--allow-unguided", dest="allow_unguided",
                   action="store_true",
                   help="permit configs requesting unsupported guidance "
                        "(use_mesh) to fall back to unguided sampling")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of the first batch")
    p.add_argument("--pad_costs",
                   default=os.path.join(os.path.dirname(__file__), "..",
                                        "sample", "pad_costs.json"),
                   help="measured per-pad batch-cost table "
                        "(tools/measure_pad_costs.py); buckets are derived "
                        "from it by DP, else fall back to {16,24,32,max}")
    args = p.parse_args()

    from shapemol_tpu.parallel import distributed as dist
    dist.initialize(args.coordinator, args.num_processes, args.process_id)
    pid, pcount = dist.process_shard()
    if args.shard_index is None:
        args.shard_index = pid
    if args.num_shards is None:
        args.num_shards = pcount

    cfg = load_config(args.config)
    if args.guide_stren is not None:
        cfg.sample.guide_stren = args.guide_stren
    if args.threshold_type is not None:
        cfg.sample.threshold_type = (None if args.threshold_type == "none"
                                     else args.threshold_type)
    misc.seed_all(cfg.sample.seed)
    logger = misc.get_logger("sample_sweep")
    if pcount > 1:
        logger.info(f"multi-host sweep: process {pid}/{pcount} handles "
                    f"targets [{args.shard_index}::{args.num_shards}]")
    os.makedirs(args.result_path, exist_ok=True)

    atom_mode = cfg.data.get_path("transform.ligand_atom_mode", "add_aromatic")
    num_classes = vocab.feature_dim(atom_mode)
    net, model_cfg, variables, _tc = load_diffusion_model(args.ckpt,
                                                          num_classes)
    sched = model_cfg.make_schedule()

    pack_pattern = args.test_pack or cfg.data.get("pack_pattern") \
        or os.path.join(
            cfg.data.get("processed_path", "./processed_data"),
            f"shapemol_{cfg.data.get('version', 'v1')}.*.npz")
    test_set = PackDataset(pack_pattern)

    target_ids = list(range(args.start, min(args.end, len(test_set))))
    target_ids = target_ids[args.shard_index::args.num_shards]
    target_ids = [t for t in target_ids if not os.path.exists(
        os.path.join(args.result_path, f"result_{t}.npz"))]
    if not target_ids:
        logger.info("nothing to do (all result files exist)")
        return

    num_samples = cfg.sample.num_samples
    B, N = args.batch_size, args.max_atoms
    S = test_set[target_ids[0]]["shape_emb"].shape[0]
    prior = (AtomNumPrior.load(args.atomnum_prior)
             if args.atomnum_prior and os.path.exists(args.atomnum_prior)
             else None)
    guidance = "none"
    if cfg.sample.get("use_pointcloud", False):
        guidance = "pointcloud"
    elif cfg.sample.get("use_mesh", False):
        # fail hard: silently sampling unguided would write result files
        # indistinguishable from guided output (ADVICE r3)
        if not args.allow_unguided:
            raise SystemExit(
                "use_mesh guidance is not supported by the sweep CLI — "
                "use cli/sample.py for mesh-SDF guidance, or pass "
                "--allow-unguided to deliberately sample without guidance")
        logger.warning("use_mesh requested but --allow-unguided set: "
                       "sampling UNGUIDED")
    scfg = smp.SamplerConfig(
        num_steps=cfg.sample.get("num_steps",
                                 model_cfg.num_diffusion_timesteps),
        center_pos_mode=cfg.sample.get("center_pos_mode", "none"),
        guide_stren=cfg.sample.get("guide_stren", 0.0),
        threshold_type=cfg.sample.get("threshold_type", None),
        threshold_args=dict(cfg.sample.get("threshold_args", {}) or {}),
        guidance=guidance,
        grad_step=cfg.sample.get("grad_step", 0),
        pointcloud_radius=cfg.sample.get("use_pointcloud_radius", 0.2))
    # the reference applies the bounds clamp only inside its CFG branch
    # (molopt_score_model.py:616-642); same default here, overridable
    use_bound = bool(cfg.sample.get("use_bound", scfg.guide_stren > 0))

    # flat work list of (target, sample) pairs. Atom counts are drawn
    # up-front so the work can be BUCKETED by pad size: a 24-atom molecule
    # samples ~2x faster than at the worst-case 48-atom pad, and most
    # MOSES2 molecules fit 24-32 atoms (cf. bench: 48 vs 24 mol/s/chip).
    work = [(t, s) for t in target_ids for s in range(num_samples)]
    rng_np = np.random.default_rng(cfg.sample.seed)
    cloud_cache = {}
    if guidance == "pointcloud":
        # per-target volume-filling Gaussian cloud; parity-critical
        # constants shared with cli/sample.py via sample/clouds.py
        from shapemol_tpu.sample.clouds import build_guidance_cloud
        for t in target_ids:
            d = test_set[t]
            cloud_cache[t] = build_guidance_cloud(
                d["pos"][d["node_mask"]], N, cfg.sample.seed + t, t)
    vox_cache = {}
    if prior is not None:
        from shapemol_tpu.geom.voxel import voxel_count
        # voxel counts are per TARGET — paint the 45^3 grid once each
        for t in target_ids:
            d = test_set[t]
            vox_cache[t] = voxel_count(
                np.asarray(vocab.get_atomic_numbers(
                    d["v"][d["node_mask"]], atom_mode)),
                d["pos"][d["node_mask"]])
        counts_all = np.array([prior.sample(vox_cache[t], 1, rng_np)[0]
                               for t, _ in work])
    else:
        counts_all = np.array([int(test_set[t]["node_mask"].sum())
                               for t, _ in work])
    counts_all = np.clip(counts_all, 3, N)

    from shapemol_tpu.sample.bucket_plan import (load_cost_table,
                                                 plan_buckets)
    cost_table = load_cost_table(args.pad_costs)
    if cost_table is not None:
        pad_sizes = plan_buckets(counts_all, B, cost_table, max_pad=N)
        logger.info(f"bucket plan from measured pad costs "
                    f"({args.pad_costs}): {pad_sizes}")
    else:
        pad_sizes = sorted({min(N, p) for p in (16, 24, 32, N)})
    buckets = {p: [] for p in pad_sizes}
    for item, c in zip(work, counts_all):
        nb = next(p for p in pad_sizes if c <= p)
        buckets[nb].append((item, int(c)))
    logger.info(f"{len(target_ids)} targets x {num_samples} samples = "
                f"{len(work)} molecules in batches of {B}; pad buckets: "
                + ", ".join(f"{p}:{len(v)}" for p, v in buckets.items()
                            if v))

    _run_cache = {}

    def run_for(n_pad):
        if n_pad not in _run_cache:
            @jax.jit
            def run(rng, shapes, counts, clouds, bounds):
                pos0, v0, mask = smp.make_init_state(
                    rng, B, n_pad, counts, model_cfg.num_net_classes)
                out = smp.sample_diffusion(net, sched, variables, rng,
                                           pos0, v0, mask, shapes, scfg,
                                           bounds=bounds, cloud=clouds)
                return out["pos"], out["v"], mask
            _run_cache[n_pad] = run
        return _run_cache[n_pad]

    results = {t: [] for t in target_ids}
    rng = jax.random.PRNGKey(cfg.sample.seed)
    t_start = time.perf_counter()
    n_done = 0
    first = True
    chunks = [(n_pad, items[b0:b0 + B])
              for n_pad in pad_sizes for items in [buckets[n_pad]]
              for b0 in range(0, len(items), B)]
    for n_pad, chunk in chunks:
        fill = B - len(chunk)
        chunk = chunk + [chunk[-1]] * fill
        data = [test_set[t] for (t, _), _ in chunk]
        shapes = jnp.asarray(np.stack([d["shape_emb"] for d in data]))
        counts = np.array([c for _, c in chunk])
        clouds = (jnp.asarray(np.stack([cloud_cache[t]
                                        for (t, _), _ in chunk]))
                  if guidance == "pointcloud" else None)
        # like cli/sample.py:182-183, tolerate packs without a bounds key
        # (bounds is optional in data/packs.py) instead of a KeyError
        bounds = (jnp.asarray(np.stack([d["bounds"] for d in data]))
                  if use_bound and all("bounds" in d for d in data)
                  else None)

        rng, sub = jax.random.split(rng)
        run = run_for(n_pad)
        if args.profile and first:
            with jax.profiler.trace(os.path.join(args.result_path,
                                                 "profile")):
                pos, v, mask = run(sub, shapes, jnp.asarray(counts),
                                   clouds, bounds)
                pos.block_until_ready()
            logger.info("profile trace saved")
        else:
            pos, v, mask = run(sub, shapes, jnp.asarray(counts), clouds,
                               bounds)
            pos.block_until_ready()
        first = False
        pos, v, mask = np.asarray(pos), np.asarray(v), np.asarray(mask)
        if n_pad < N:
            # one target's samples may span buckets — normalize to the
            # global pad so the per-target stack is rectangular. Padded v
            # rows get sentinel -1 (not a valid atom class) so consumers
            # that ignore node_mask cannot mistake padding for class-0
            # atoms; pos/v are only meaningful where node_mask is set.
            w = N - n_pad
            pos = np.pad(pos, ((0, 0), (0, w), (0, 0)))
            v = np.pad(v, ((0, 0), (0, w)), constant_values=-1)
            mask = np.pad(mask, ((0, 0), (0, w)))
        v = np.where(mask, v, -1)
        for row, ((t, s), _c) in enumerate(chunk[:B - fill]):
            results[t].append((pos[row], v[row], mask[row]))
        n_done += B - fill
        rate = n_done / (time.perf_counter() - t_start)
        logger.info(f"{n_done}/{len(work)} molecules ({rate:.2f} mol/s)")

        # flush completed targets
        for t in list(results):
            if len(results[t]) >= num_samples:
                datum = test_set[t]
                np.savez_compressed(
                    os.path.join(args.result_path, f"result_{t}.npz"),
                    pos=np.stack([r[0] for r in results[t]]),
                    v=np.stack([r[1] for r in results[t]]),
                    node_mask=np.stack([r[2] for r in results[t]]),
                    ref_pos=datum["pos"],
                    ref_v=np.where(datum["node_mask"], datum["v"], -1),
                    ref_node_mask=datum["node_mask"],
                    time_list=np.asarray([]), data_id=t,
                    atom_mode=atom_mode)
                del results[t]
    logger.info(f"sweep done: {n_done} molecules at "
                f"{n_done / (time.perf_counter() - t_start):.2f} mol/s")


if __name__ == "__main__":
    main()
