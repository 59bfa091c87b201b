"""Build empirical bond/pair distance reference profiles from a dataset —
the provenance-tracked replacement for the reference's frozen
eval_bond_length_config.py histograms.

Usage:
  python -m shapemol_tpu.cli.build_profiles <train.sdf | pack_pattern.npz> \
      --out empirical_profiles.json [--max_mols 100000]

Accepts an SDF file of reference molecules or a processed pack pattern
(molecules are reconstructed from the stored coordinates/types)."""
from __future__ import annotations

import argparse

import numpy as np

from shapemol_tpu.core import misc
from shapemol_tpu.eval import bond_length as eval_bond


def main():
    p = argparse.ArgumentParser()
    p.add_argument("source", help=".sdf file or pack .npz pattern")
    p.add_argument("--out", default="empirical_profiles.json")
    p.add_argument("--max_mols", type=int, default=100000)
    p.add_argument("--atom_mode", default="add_aromatic")
    args = p.parse_args()
    logger = misc.get_logger("build_profiles")

    mols = []
    if args.source.endswith(".sdf"):
        from shapemol_tpu.chem.sdf import read_sdf
        mols = read_sdf(args.source)[:args.max_mols]
    else:
        from shapemol_tpu.chem import vocab
        from shapemol_tpu.chem.reconstruct import (MolReconsError,
                                                   reconstruct_from_generated)
        from shapemol_tpu.data.packs import PackDataset
        ds = PackDataset(args.source)
        for i in range(min(len(ds), args.max_mols)):
            item = ds[i]
            m = item["node_mask"]
            v = item["v"][m].tolist()
            try:
                mols.append(reconstruct_from_generated(
                    item["pos"][m], vocab.get_atomic_numbers(v, args.atom_mode),
                    vocab.get_aromatic_flags(v, args.atom_mode),
                    basic_mode=False))
            except MolReconsError:
                continue
    logger.info(f"building profiles from {len(mols)} molecules")
    bond_p, pair_p = eval_bond.build_empirical_profiles(mols)
    eval_bond.save_profiles(args.out, bond_p, pair_p)
    logger.info(f"saved {args.out} ({len(bond_p)} bond types)")


if __name__ == "__main__":
    main()
