"""Ingest the reference's shipped MOSES2 artifacts into framework packs.

Usage:
  python -m shapemol_tpu.cli.ingest_reference \
      --test_pkl /root/reference/data/MOSES2_test_mol.pkl \
      --index_map /root/reference/data/index_map.txt \
      --se_model /root/reference/trained_models/se_model.pt \
      --out_dir processed_data [--eval_ids 100] [--profiles <json>]

Produces:
  * ``moses2_test_v1`` pack — one record per data_id (0..999), where record
    ``k`` is ``test_data[index_map[k]]`` exactly like the reference's eval
    join (scripts/evaluate_diffusion_sim.py:101-106,125).  Keeps surface
    clouds + bounds so every guidance mode works.
  * ``moses2_train_v1`` packs — the complement of the first ``--eval_ids``
    targets, used to train stage 2 when the reference's 1.6M-molecule
    training pickle is not mounted (only the 1000-molecule test set ships
    with the repo).  The split is by data_id so train and eval never share
    a molecule.
  * empirical bond/pair JSD profiles built from the real molecules
    (replaces the reference's frozen eval_bond_length_config.py histograms).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from shapemol_tpu.chem import vocab
from shapemol_tpu.compat.rdkit_unpickle import (load_index_map,
                                                load_rdkit_mol_pickle)
from shapemol_tpu.core import misc
from shapemol_tpu.data.packs import MoleculeRecord, write_pack
from shapemol_tpu.data.preprocess import featurize_molecule
from shapemol_tpu.eval import bond_length as eval_bond
from shapemol_tpu.geom import shape_emb as semb


def prep_records(mols, atom_mode: str, num_points: int, seed: int,
                 strict: bool = False):
    """Molecules -> (records-without-embeddings, clouds). strict=True
    requires every molecule to succeed (test pack must stay index-aligned)."""
    from shapemol_tpu.chem.smiles import to_smiles
    records, clouds, kept = [], [], []
    for k, mol in enumerate(mols):
        try:
            v = featurize_molecule(mol, atom_mode)
            if v is None:
                raise ValueError("outside atom vocabulary")
            cloud, center, bounds = semb.mol_surface_cloud(
                mol.atomic_nums, mol.pos, num_points,
                rng=np.random.default_rng(seed + k))
            records.append(MoleculeRecord(
                pos=(mol.pos - center).astype(np.float32), v=v,
                bounds=bounds.astype(np.float32),
                cloud=cloud.astype(np.float32), smiles=to_smiles(mol)))
            clouds.append(cloud.astype(np.float32))
            kept.append(k)
        except Exception as e:
            if strict:
                raise RuntimeError(f"molecule {k} failed ingest: {e}") from e
    return records, np.stack(clouds), kept


def main():
    misc.enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--test_pkl",
                   default="/root/reference/data/MOSES2_test_mol.pkl")
    p.add_argument("--index_map",
                   default="/root/reference/data/index_map.txt")
    p.add_argument("--se_model",
                   default="/root/reference/trained_models/se_model.pt")
    p.add_argument("--out_dir", default="./processed_data")
    p.add_argument("--eval_ids", type=int, default=100,
                   help="data_ids [0, eval_ids) are held out for sampling "
                        "eval; the rest become the training pack")
    p.add_argument("--atom_mode", default="add_aromatic")
    p.add_argument("--point_cloud_samples", type=int, default=512)
    p.add_argument("--n_max", type=int, default=32)
    p.add_argument("--profiles", default=None,
                   help="where to write the empirical JSD profiles "
                        "(default <out_dir>/moses2_profiles.json)")
    p.add_argument("--encode_batch_size", type=int, default=40)
    p.add_argument("--seed", type=int, default=2023)
    args = p.parse_args()

    logger = misc.get_logger("ingest")
    os.makedirs(args.out_dir, exist_ok=True)

    mols = load_rdkit_mol_pickle(args.test_pkl)
    idx_map = load_index_map(args.index_map)
    logger.info(f"loaded {len(mols)} reference molecules")

    # empirical profiles from ALL real molecules (provenance: the shipped
    # 1000-molecule MOSES2 test split — the 1.6M training set is not
    # redistributed by the reference)
    prof_path = args.profiles or os.path.join(args.out_dir,
                                              "moses2_profiles.json")
    bond_p, pair_p = eval_bond.build_empirical_profiles(mols)
    eval_bond.save_profiles(prof_path, bond_p, pair_p)
    logger.info(f"wrote JSD profiles -> {prof_path}")

    # stage-1 encoder (the reference's trained se_model.pt via the torch-free
    # importer)
    from shapemol_tpu.cli.train_diffusion import load_shape_encoder
    encoder_fn = load_shape_encoder(args.se_model, logger)

    from shapemol_tpu.data.preprocess import _batched_encode

    # ---- test pack: data_id order via index_map join
    ordered = [mols[idx_map[k]] for k in range(len(mols))]
    records, clouds, _ = prep_records(ordered, args.atom_mode,
                                      args.point_cloud_samples, args.seed,
                                      strict=True)
    latents = _batched_encode(encoder_fn, clouds, args.encode_batch_size)
    for r, z in zip(records, latents):
        r.shape_emb = np.asarray(z, np.float32)
    test_path = os.path.join(args.out_dir,
                             "moses2_test_v1.shard000_00000.npz")
    write_pack(test_path, records, n_max=args.n_max)
    logger.info(f"wrote test pack ({len(records)} records) -> {test_path}")

    # ---- train pack: complement of the eval targets (by data_id)
    eval_test_indices = {idx_map[k] for k in range(args.eval_ids)}
    train_mols = [m for i, m in enumerate(mols)
                  if i not in eval_test_indices]
    t_records, t_clouds, _ = prep_records(train_mols, args.atom_mode,
                                          args.point_cloud_samples,
                                          args.seed + 10_000)
    t_latents = _batched_encode(encoder_fn, t_clouds, args.encode_batch_size)
    for r, z in zip(t_records, t_latents):
        r.shape_emb = np.asarray(z, np.float32)
    train_path = os.path.join(args.out_dir,
                              "moses2_train_v1.shard000_00000.npz")
    write_pack(train_path, t_records, n_max=args.n_max)
    logger.info(f"wrote train pack ({len(t_records)} records, "
                f"{args.eval_ids} eval targets excluded) -> {train_path}")


if __name__ == "__main__":
    main()
