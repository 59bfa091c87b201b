"""Evaluation CLI: score generated molecules against references.

Usage:
  python -m shapemol_tpu.cli.evaluate <result_dir> [--num_workers 8]
      [--profiles empirical_profiles.json] [--out metrics.json]

Functional parity target: scripts/evaluate_diffusion_sim.py (glob
result_*, per-sample stability/reconstruction/completeness, per-target
similarity pool, aggregate report)."""
from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

from shapemol_tpu.chem import vocab
from shapemol_tpu.core import misc
from shapemol_tpu.eval import bond_length as eval_bond
from shapemol_tpu.eval.evaluate import evaluate_generation
from shapemol_tpu.chem.reconstruct import reconstruct_from_generated, MolReconsError


def main():
    # evaluation is pure host work (reconstruction, fingerprints, alignment);
    # never claim the TPU — a busy chip would block this process forever
    # (single-process TPU lock), and CPU is what the metrics need
    import jax
    jax.config.update("jax_platforms", "cpu")
    misc.enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("result_dir")
    p.add_argument("--num_workers", type=int, default=0)
    p.add_argument("--profiles", default=None,
                   help="empirical_profiles.json from "
                        "eval.bond_length.save_profiles (default: the "
                        "shipped real-MOSES2 profiles)")
    p.add_argument("--testset", default=None,
                   help="pickled RDKit molecules to use as references "
                        "(e.g. the reference's MOSES2_test_mol.pkl)")
    p.add_argument("--index_map", default=None,
                   help="data_id -> test-set index join table "
                        "(the reference's data/index_map.txt; "
                        "evaluate_diffusion_sim.py:101-106)")
    p.add_argument("--out", default=None)
    p.add_argument("--max_targets", type=int, default=None)
    p.add_argument("--eval_step", type=int, default=-1,
                   help="trajectory index to evaluate (requires results "
                        "sampled with --record_traj; -1 = final state — "
                        "reference evaluate_diffusion_sim.py:135)")
    p.add_argument("--holdout", default="0:100",
                   help="data_id half-open range of conditioning targets "
                        "held out of diffusion training (protocol: 0:100). "
                        "Metrics gain a by_split block when both splits "
                        "are present; 'none' disables")
    args = p.parse_args()

    logger = misc.get_logger("evaluate")
    files = sorted(glob.glob(os.path.join(args.result_dir, "result_*.npz")))
    if args.max_targets:
        files = files[:args.max_targets]
    if not files:
        raise SystemExit(f"no result_*.npz under {args.result_dir}")
    logger.info(f"found {len(files)} result files")

    # references: real test-set molecules via the index_map join when given
    # (the reference's own protocol), else reconstructed from the sampler's
    # stored reference arrays
    test_mols = index_map = None
    if args.testset:
        from shapemol_tpu.compat.rdkit_unpickle import (load_index_map,
                                                        load_rdkit_mol_pickle)
        test_mols = load_rdkit_mol_pickle(args.testset)
        index_map = (load_index_map(args.index_map) if args.index_map
                     else {k: k for k in range(len(test_mols))})
        logger.info(f"references: {len(test_mols)} test molecules "
                    f"(index_map join)")

    results = {}
    references = {}
    atom_mode = "add_aromatic"
    for f in files:
        data = np.load(f, allow_pickle=False)
        tid = int(data["data_id"])
        atom_mode = str(data["atom_mode"])
        use_traj = args.eval_step != -1
        if use_traj and "pos_traj" not in data:
            raise SystemExit(
                f"--eval_step {args.eval_step} needs trajectories; re-run "
                f"sampling with --record_traj ({f} has none)")
        samples = []
        for k in range(data["pos"].shape[0]):
            m = data["node_mask"][k]
            if use_traj:
                samples.append((data["pos_traj"][k][args.eval_step][m],
                                data["v_traj"][k][args.eval_step][m].tolist()))
            else:
                samples.append((data["pos"][k][m], data["v"][k][m].tolist()))
        results[tid] = samples
        if test_mols is not None:
            references[tid] = test_mols[index_map[tid]]
            continue
        rm = data["ref_node_mask"]
        ref_v = data["ref_v"][rm].tolist()
        ref_z = vocab.get_atomic_numbers(ref_v, atom_mode)
        ref_ar = vocab.get_aromatic_flags(ref_v, atom_mode)
        try:
            references[tid] = reconstruct_from_generated(
                data["ref_pos"][rm], ref_z, ref_ar, basic_mode=False)
        except MolReconsError:
            pass

    prof_path = args.profiles
    if prof_path is None:
        # shipped default: empirical profiles built from the real MOSES2
        # test molecules (cli/ingest_reference.py provenance note) —
        # replaces the reference's frozen eval_bond_length_config.py
        shipped = os.path.join(os.path.dirname(__file__), "..", "eval",
                               "profiles", "moses2.json")
        prof_path = shipped if os.path.exists(shipped) else None
    profiles = eval_bond.load_profiles(prof_path) if prof_path else None
    if prof_path:
        logger.info(f"JSD profiles: {prof_path}")
    holdout_ids = None
    if args.holdout and args.holdout.lower() != "none":
        lo, hi = (int(x) for x in args.holdout.split(":"))
        holdout_ids = range(lo, hi)
    metrics = evaluate_generation(results, references, atom_mode,
                                  empirical_profiles=profiles,
                                  num_workers=args.num_workers,
                                  holdout_ids=holdout_ids)
    per_target = metrics.pop("per_target", None)
    for k, v in metrics.items():
        if k == "by_split" and "holdout" in v:
            for axis in ("mol_stable", "complete", "JSD_CC_2A",
                         "rocs_mean", "ref_tanimoto_max"):
                logger.info(
                    f"by_split {axis}: holdout={v['holdout'].get(axis)} "
                    f"train_cond={v['train_cond'].get(axis)}")
            continue
        logger.info(f"{k}: {v}")
    out = args.out or os.path.join(args.result_dir, "metrics.json")
    with open(out, "w") as f:
        json.dump({"metrics": metrics, "per_target": per_target}, f,
                  indent=2, default=str)
    logger.info(f"saved {out}")


if __name__ == "__main__":
    main()
