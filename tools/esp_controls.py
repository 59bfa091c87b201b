"""ESP-metric positive/negative controls through the EXACT production path
(VERDICT r3 item 4).

The esp_sim number reported for generated molecules has been wrong once
already (r2 scored unaligned poses). This tool anchors the metric by pushing
three control populations through the *same* code path the evaluator uses
(`eval.evaluate._target_similarity`: shape-overlap alignment via
`sim.align_by_overlap`, then `espsim.esp_sim` with Gasteiger charges —
reference semantics at utils/espsim/electrostatics.py:439-472):

  self        — the reference molecule vs a rigidly rotated+translated copy
                of itself. Expected ~1 (alignment must recover the pose).
  self+jitter — same, plus Gaussian coordinate noise (sigma 0.1/0.2/0.3 A),
                a conformer-variation surrogate: RDKit re-embedding is not
                available in this environment, so geometric jitter bounds
                how fast the metric decays off the exact pose.
  cross       — the reference vs a DIFFERENT randomly chosen reference
                molecule. Expected ~0 (signed-charge Carbo similarity of
                unrelated charge patterns centers at zero).

Where the generated-molecule esp_sim_mean sits between the self band and the
cross band is the interpretation anchor the raw number lacks.

Usage: python tools/esp_controls.py [--n 100] [--out STATUS fragment path]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shapemol_tpu.chem.mol import Molecule
from shapemol_tpu.compat.rdkit_unpickle import load_rdkit_mol_pickle
from shapemol_tpu.eval import similarity as sim
from shapemol_tpu.eval import espsim


def _rigid(pos: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    # uniform random rotation (QR of a Gaussian matrix) + translation
    q, r = np.linalg.qr(rng.standard_normal((3, 3)))
    q = q * np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return pos @ q.T + rng.uniform(-3.0, 3.0, 3)


def production_esp(probe: Molecule, ref: Molecule) -> float:
    """EXACTLY the evaluator's per-sample ESP path
    (eval/evaluate.py _target_similarity)."""
    aligned_pos, _t = sim.align_by_overlap(ref.pos, probe.pos)
    aligned = Molecule(probe.atomic_nums, aligned_pos, probe.bonds,
                       charges=probe.charges, aromatic=probe.aromatic)
    return espsim.esp_sim(aligned, ref)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--testset",
                   default="/root/reference/data/MOSES2_test_mol.pkl")
    p.add_argument("--n", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None, help="write the JSON table here")
    args = p.parse_args()

    mols = load_rdkit_mol_pickle(args.testset)
    rng = np.random.default_rng(args.seed)
    ids = rng.choice(len(mols), size=args.n, replace=False)

    rows = {"self": [], "self_j0.1": [], "self_j0.2": [], "self_j0.3": [],
            "cross": []}
    for i in ids:
        ref = mols[int(i)]
        probe = Molecule(ref.atomic_nums, _rigid(ref.pos, rng), ref.bonds,
                         charges=ref.charges, aromatic=ref.aromatic)
        rows["self"].append(production_esp(probe, ref))
        for s in (0.1, 0.2, 0.3):
            jit = probe.pos + rng.normal(scale=s, size=probe.pos.shape)
            pj = Molecule(ref.atomic_nums, jit, ref.bonds,
                          charges=ref.charges, aromatic=ref.aromatic)
            rows[f"self_j{s}"].append(production_esp(pj, ref))
        j = int(rng.integers(len(mols)))
        while j == i:
            j = int(rng.integers(len(mols)))
        other = mols[j]
        oprobe = Molecule(other.atomic_nums, _rigid(other.pos, rng),
                          other.bonds, charges=other.charges,
                          aromatic=other.aromatic)
        rows["cross"].append(production_esp(oprobe, ref))

    table = {}
    for k, v in rows.items():
        a = np.asarray(v, float)
        table[k] = dict(mean=float(a.mean()), std=float(a.std()),
                        p10=float(np.percentile(a, 10)),
                        p90=float(np.percentile(a, 90)), n=len(a))
    print(json.dumps(table, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(table, f, indent=2)


if __name__ == "__main__":
    main()
