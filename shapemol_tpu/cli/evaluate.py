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
    misc.enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("result_dir")
    p.add_argument("--num_workers", type=int, default=0)
    p.add_argument("--profiles", default=None,
                   help="empirical_profiles.json from "
                        "eval.bond_length.save_profiles")
    p.add_argument("--out", default=None)
    p.add_argument("--max_targets", type=int, default=None)
    args = p.parse_args()

    logger = misc.get_logger("evaluate")
    files = sorted(glob.glob(os.path.join(args.result_dir, "result_*.npz")))
    if args.max_targets:
        files = files[:args.max_targets]
    if not files:
        raise SystemExit(f"no result_*.npz under {args.result_dir}")
    logger.info(f"found {len(files)} result files")

    results = {}
    references = {}
    atom_mode = "add_aromatic"
    for f in files:
        data = np.load(f, allow_pickle=False)
        tid = int(data["data_id"])
        atom_mode = str(data["atom_mode"])
        samples = []
        for k in range(data["pos"].shape[0]):
            m = data["node_mask"][k]
            samples.append((data["pos"][k][m], data["v"][k][m].tolist()))
        results[tid] = samples
        rm = data["ref_node_mask"]
        ref_v = data["ref_v"][rm].tolist()
        ref_z = vocab.get_atomic_numbers(ref_v, atom_mode)
        ref_ar = vocab.get_aromatic_flags(ref_v, atom_mode)
        try:
            references[tid] = reconstruct_from_generated(
                data["ref_pos"][rm], ref_z, ref_ar, basic_mode=False)
        except MolReconsError:
            pass

    profiles = (eval_bond.load_profiles(args.profiles)
                if args.profiles else None)
    metrics = evaluate_generation(results, references, atom_mode,
                                  empirical_profiles=profiles,
                                  num_workers=args.num_workers)
    per_target = metrics.pop("per_target", None)
    for k, v in metrics.items():
        logger.info(f"{k}: {v}")
    out = args.out or os.path.join(args.result_dir, "metrics.json")
    with open(out, "w") as f:
        json.dump({"metrics": metrics, "per_target": per_target}, f,
                  indent=2, default=str)
    logger.info(f"saved {out}")


if __name__ == "__main__":
    main()
