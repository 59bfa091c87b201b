"""Corpus-quality ladder for the self-distillation flywheel.

Compares training corpora (real pack, distill v1, distill v2, ...) on the
same distributional axes the generation eval uses — atom-type JSD vs the
MOSES2 marginal, CC<2Å / All<12Å pair-distance JSD vs the frozen empirical
profiles, uniqueness, size stats. Diagnoses whether rejection-filtered
self-generated corpora *sharpen* toward the real distribution across
flywheel iterations or *drift* (accumulate model bias) — the
interpretation key for the v2-flywheel training result.

  python tools/corpus_stats.py processed_data/moses2_train_v1 \
      processed_data/moses2_distill_v1 processed_data/moses2_distill_v2

Pure host/CPU analysis (no chip): reads pack npz files (pos/v/node_mask/
smiles), reference profiles from processed_data/moses2_profiles.json
(built by cli/build_profiles.py from the reference's shipped molecules,
matching utils/evaluation/eval_bond_length_config.py's frozen histograms).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROFILES = "processed_data/moses2_profiles.json"


def corpus_rows(prefix: str, atom_mode: str):
    from shapemol_tpu.chem import vocab

    files = sorted(glob.glob(prefix + "*.npz"))
    if not files:
        raise SystemExit(f"no packs match {prefix}*.npz")
    rows = []
    smiles = []
    for f in files:
        with np.load(f) as z:
            pos_a, v_a, m_a = z["pos"], z["v"], z["node_mask"]
            if "smiles" in z.files:
                smiles.extend(z["smiles"].tolist())
            for s in range(pos_a.shape[0]):
                m = m_a[s].astype(bool)
                if not m.any():
                    continue
                nums = vocab.get_atomic_numbers(v_a[s][m].tolist(), atom_mode)
                rows.append((pos_a[s][m], nums))
    return rows, smiles


def analyze(prefix: str, atom_mode: str, pair_ref, sample_pairs: int):
    from shapemol_tpu.eval import atom_type, bond_length

    rows, smiles = corpus_rows(prefix, atom_mode)
    atom_counter = Counter()
    for _pos, nums in rows:
        atom_counter.update(nums)

    # pair-distance profiles: O(n^2) per molecule is cheap (<=32 atoms) but
    # 15k molecules x 500 pairs is still fast; subsample for very large packs
    rng = np.random.default_rng(0)
    idx = (rng.choice(len(rows), size=sample_pairs, replace=False)
           if len(rows) > sample_pairs else range(len(rows)))
    pair_lengths = []
    for i in idx:
        pos, nums = rows[i]
        pair_lengths.extend(bond_length.pair_distances_from_pos(pos, nums))
    pair_profile = bond_length.get_pair_length_profile(pair_lengths)
    pair_jsd = bond_length.eval_pair_length_profile(pair_profile, pair_ref)

    n_atoms = [len(nums) for _p, nums in rows]
    uniq = len(set(smiles)) / len(smiles) if smiles else float("nan")
    return {
        "corpus": os.path.basename(prefix),
        "n_mols": len(rows),
        "uniq_smiles": round(uniq, 4),
        "mean_atoms": round(float(np.mean(n_atoms)), 2),
        "atom_type_jsd_vs_moses2":
            round(atom_type.eval_atom_type_distribution(atom_counter), 4),
        "jsd_cc_2a": round(pair_jsd["JSD_CC_2A"], 4),
        "jsd_all_12a": round(pair_jsd["JSD_All_12A"], 4),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("prefixes", nargs="+",
                   help="pack path prefixes (glob '<prefix>*.npz')")
    p.add_argument("--atom_mode", default="add_aromatic")
    p.add_argument("--sample_pairs", type=int, default=4000,
                   help="max molecules used for pair-distance profiles")
    p.add_argument("--out", default=None, help="optional JSON output path")
    args = p.parse_args()

    from shapemol_tpu.eval import bond_length

    _bond_ref, pair_ref = bond_length.load_profiles(PROFILES)
    out = [analyze(pref, args.atom_mode, pair_ref, args.sample_pairs)
           for pref in args.prefixes]
    cols = list(out[0].keys())
    print(" | ".join(cols))
    for r in out:
        print(" | ".join(str(r[c]) for c in cols))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
