"""Filtered self-distillation pack (attack on the 900-molecule data bound).

The reference paper trained on 1.6M MOSES2 molecules; this repo only has
the shipped 1000-molecule test pickle (900 train after split) — measured
in r3/r4 as THE bound on stability/geometry/shape. This script expands
the training set with the model's own generations, filtered by the
rule-based oracles (valence stability tables + reconstruction +
single-fragment completeness): rejection keeps only molecules that
satisfy chemistry the model itself gets wrong ~15% of the time, so the
filter injects real external signal (the empirical valence/bond tables),
not just model bias.

  python tools/make_distill_pack.py [--src results_full_ema] [--keep 7200]

--geom_filter adds the signal the valence oracles miss (the corpus-ladder
diagnostic, tools/corpus_stats.py, shows oracle-only packs carry the
generator's geometry bias through unchanged — CC-2Å JSD ~0.29 vs real
0.004): every oracle-passing candidate is scored by the mean negative
log-likelihood of its bond lengths under the empirical MOSES2 bond-length
profiles (the same histograms the JSD metric uses,
utils/evaluation/eval_bond_length_config.py semantics), and only the
best --keep are retained — rejection sampling on geometry itself.

Writes <out>.*.npz with the exact schema of the real train pack
(n_max 32, cloud kept, own-encoder shape_emb), so a training config can
glob both packs together.
"""
from __future__ import annotations

import argparse
import glob
import multiprocessing as mp
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

S1_CKPT = "logs_real/shape_ae_2026_08_16__21_14_54_real/checkpoints"
REAL_PACK = "processed_data/moses2_train_v1.shard000_00000.npz"
# ALL 1000 reference molecules (train 100-999 AND held-out 0-99): the
# novelty filter must reject a generation that reproduces a held-out
# molecule, or the flywheel leaks eval targets into the training corpus
# (protocol-hygiene fix, VERDICT r4 weak #2)
TEST_PACK = "processed_data/moses2_test_v1.shard000_00000.npz"
PROFILES = "processed_data/moses2_profiles.json"

_WORKER = {}


def _init_worker(atom_mode: str):
    # imports deferred so the pool forks cheaply and JAX stays unloaded
    from shapemol_tpu.eval import bond_length
    from shapemol_tpu.eval.evaluate import process_sample

    bond_ref, _pair = bond_length.load_profiles(PROFILES)
    _WORKER.update(process_sample=process_sample, atom_mode=atom_mode,
                   bond_ref=bond_ref, bond_length=bond_length)


def _geom_nll(mol) -> float:
    """Mean negative log-likelihood of the molecule's tracked bond lengths
    under the empirical reference histograms; +inf when no tracked bond
    (ranked last — no geometry evidence, don't trust it)."""
    bl = _WORKER["bond_length"]
    ref = _WORKER["bond_ref"]
    nll, n = 0.0, 0
    for bt, d in bl.bond_distances_from_mol(mol):
        prof = ref.get(bt)
        if prof is None:
            continue
        b = int(np.searchsorted(bl.DISTANCE_BINS, d))
        nll += -float(np.log(prof[b] + 1e-6))
        n += 1
    return nll / n if n else float("inf")


def _scan_file(path: str):
    """Oracle-filter one result file; returns (n_seen, [payload...]) where
    payload = (smiles, geom_nll, atomic_nums, pos, bonds, charges, aromatic)."""
    process_sample = _WORKER["process_sample"]
    out, n_seen = [], 0
    with np.load(path) as z:
        pos_a, v_a, m_a = z["pos"], z["v"], z["node_mask"]
    for s in range(pos_a.shape[0]):
        m = m_a[s].astype(bool)
        n_seen += 1
        r = process_sample(pos_a[s][m], v_a[s][m].tolist(),
                           _WORKER["atom_mode"])
        # rule-based oracles: valence-stable, reconstructable, single frag
        if r.mol is None or not r.stable or not r.complete:
            continue
        mol = r.mol
        out.append((r.smiles, _geom_nll(mol), mol.atomic_nums, mol.pos,
                    mol.bonds, mol.charges, mol.aromatic))
    return n_seen, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="results_full_ema",
                   help="result dir, or comma-separated dirs to pool "
                        "candidates from several generation runs")
    p.add_argument("--keep", type=int, default=7200)
    p.add_argument("--out", default="processed_data/moses2_distill_v1")
    p.add_argument("--atom_mode", default="add_aromatic")
    p.add_argument("--geom_filter", action="store_true",
                   help="rank oracle-passing candidates by bond-length NLL "
                        "vs the empirical profiles; keep the best --keep")
    p.add_argument("--geom_strat", action="store_true",
                   help="composition-stratified geometry filter (r5): "
                        "greedy accept in bond-length-NLL order, but only "
                        "while the running atomic-number distribution stays "
                        "within --strat_jsd of MOSES2 — keeps the v3geom "
                        "geometry win without its atom-type drift "
                        "(corpus ladder: 0.098 -> 0.138)")
    p.add_argument("--strat_jsd", type=float, default=0.095,
                   help="composition JSD cap for --geom_strat (the real "
                        "900-molecule corpus sits at 0.089)")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--cpu", action="store_true",
                   help="run the stage-1 encoder on host CPU (so the pack "
                        "build can proceed while the TPU chip is busy "
                        "training; the axon platform ignores JAX_PLATFORMS, "
                        "so this must be an in-process override)")
    p.add_argument("--exclude_cond_ids", default="0:100",
                   help="half-open data_id range whose generations never "
                        "enter the corpus (default: the held-out "
                        "conditioning targets 0-99, so distillation stays "
                        "blind to the eval split); 'none' disables")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from shapemol_tpu.chem.mol import Molecule
    from shapemol_tpu.core.misc import get_logger
    from shapemol_tpu.data.preprocess import preprocess_molecules

    logger = get_logger("distill")

    real_smiles = set(np.load(REAL_PACK)["smiles"].tolist())
    real_smiles |= set(np.load(TEST_PACK)["smiles"].tolist())
    files = []
    for src in [s.strip() for s in args.src.split(",") if s.strip()]:
        files += sorted(glob.glob(os.path.join(src, "result_*.npz")))

    if args.exclude_cond_ids.lower() != "none":
        lo, hi = (int(x) for x in args.exclude_cond_ids.split(":"))
        n_before = len(files)
        files = [f for f in files
                 if not lo <= int(np.load(f)["data_id"]) < hi]
        logger.info(f"excluded {n_before - len(files)} result files "
                    f"conditioned on held-out targets [{lo},{hi})")

    # scan result files in parallel; dedup/novelty in arrival order on the
    # parent so oracle-only mode reproduces the historical first-come packs
    geom_mode = args.geom_filter or args.geom_strat
    candidates, seen = [], set()
    n_seen = 0
    with mp.Pool(args.workers, initializer=_init_worker,
                 initargs=(args.atom_mode,)) as pool:
        for n_f, rows in pool.imap(_scan_file, files):
            n_seen += n_f
            for smiles, nll, nums, pos, bonds, charges, aromatic in rows:
                if smiles in seen or smiles in real_smiles:
                    continue
                seen.add(smiles)
                candidates.append(
                    (nll, Molecule(nums, pos, bonds, charges, aromatic)))
            if not geom_mode and len(candidates) >= args.keep:
                pool.terminate()
                break

    if args.geom_strat:
        # composition-stratified greedy: walk candidates in NLL order,
        # accept while the selected set's atomic-number distribution stays
        # within the JSD cap (or improves); backfill by NLL if the cap
        # leaves the pack short. The cap binds the one axis the plain
        # geometry filter degraded (atom drift), at the cost of admitting
        # slightly worse-NLL molecules rich in under-represented elements.
        from scipy.spatial.distance import jensenshannon
        from shapemol_tpu.eval.atom_type import MOSES2_ATOM_TYPE_DISTRIBUTION
        zs = sorted(MOSES2_ATOM_TYPE_DISTRIBUTION)
        ref_vec = np.array([MOSES2_ATOM_TYPE_DISTRIBUTION[z] for z in zs])

        def jsd_of(c):
            return (float(jensenshannon(ref_vec, c / c.sum()))
                    if c.sum() else 0.0)

        ordered = sorted(candidates, key=lambda t: t[0])
        counts = np.zeros(len(zs))
        selected, rest = [], []
        for nll, mol in ordered:
            if len(selected) >= args.keep:
                rest.append((nll, mol))
                continue
            vec = np.array([sum(1 for z in mol.atomic_nums if z == zz)
                            for zz in zs], dtype=float)
            new_jsd = jsd_of(counts + vec)
            if (len(selected) < 200 or new_jsd <= args.strat_jsd
                    or new_jsd <= jsd_of(counts)):
                selected.append((nll, mol))
                counts += vec
            else:
                rest.append((nll, mol))
        short = args.keep - len(selected)
        if short > 0:
            selected += rest[:short]
        kept_nll = [t[0] for t in selected if np.isfinite(t[0])]
        logger.info(f"stratified geometry filter: kept {len(selected)} "
                    f"(NLL mean {float(np.mean(kept_nll)):.3f}, "
                    f"composition JSD {jsd_of(counts):.4f}, "
                    f"backfilled {max(short, 0)}) "
                    f"of {len(candidates)} candidates")
        candidates = selected

    elif args.geom_filter:
        candidates.sort(key=lambda t: t[0])
        kept_nll = [t[0] for t in candidates[:args.keep] if np.isfinite(t[0])]
        cut_nll = [t[0] for t in candidates[args.keep:] if np.isfinite(t[0])]
        logger.info(
            f"geometry filter: kept NLL mean "
            f"{float(np.mean(kept_nll)):.3f} vs cut "
            f"{float(np.mean(cut_nll)):.3f} over {len(candidates)} candidates"
            if cut_nll else
            f"geometry filter: only {len(candidates)} candidates "
            f"(<= keep={args.keep}); filter is a no-op")
    mols = [m for _nll, m in candidates[:args.keep]]
    tag = ("+geom-stratified" if args.geom_strat
           else "+geom-ranked" if args.geom_filter else "")
    logger.info(f"kept {len(mols)} of {n_seen} generated molecules "
                f"(stable+complete+novel+unique{tag})")

    from shapemol_tpu.cli.train_diffusion import load_shape_encoder
    encoder_fn = load_shape_encoder(S1_CKPT, logger)
    paths = preprocess_molecules(
        mols, args.out, encoder_fn=encoder_fn,
        atom_mode=args.atom_mode, point_cloud_samples=512,
        keep_cloud=True, n_max=32, num_workers=8)
    logger.info(f"wrote {paths}")


if __name__ == "__main__":
    main()
