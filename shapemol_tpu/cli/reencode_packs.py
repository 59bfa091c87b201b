"""Re-encode the shape conditioning latents stored in existing packs.

After (re)training the stage-1 shape AE, the `shape_emb` arrays inside the
diffusion packs are stale — this tool recomputes them from the stored
surface clouds with a new encoder checkpoint, in place:

  python -m shapemol_tpu.cli.reencode_packs \
      --pack "processed_data/moses2_*_v1.*.npz" \
      --shape_ckpt logs_real/shape_ae_.../checkpoints

Reference analogue: the reference bakes ShapeAE embeddings into its LMDB at
dataset-build time (datasets/shape_mol_dataset.py:150-176); changing the
encoder there means rebuilding the whole LMDB. Packs keep the raw clouds,
so re-conditioning is one jitted encoder sweep.
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from shapemol_tpu.core import misc


def main():
    misc.enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--pack", required=True,
                   help="glob of pack shards to re-encode in place")
    p.add_argument("--shape_ckpt", required=True,
                   help="stage-1 checkpoint dir (orbax) or se_model.pt")
    p.add_argument("--batch_size", type=int, default=40)
    p.add_argument("--mode", choices=("pointAE", "voxelAE"),
                   default="pointAE",
                   help="pointAE: encode the stored surface clouds; "
                        "voxelAE: voxelize the stored (pos, v) atoms and "
                        "encode with a voxel-AE checkpoint (reference "
                        "get_shape_func 'voxelAE_shape', "
                        "datasets/shape_mol_dataset.py:153-165). The flat "
                        "voxel latent is reshaped to (z_dim/3, 3) to fit "
                        "the (S,3) conditioning interface")
    p.add_argument("--atom_mode", default="add_aromatic")
    p.add_argument("--out_suffix", default="",
                   help="write '<path><suffix>' instead of overwriting "
                        "(e.g. '.voxel' keeps the pointAE packs intact)")
    args = p.parse_args()

    logger = misc.get_logger("reencode")
    paths = sorted(glob.glob(args.pack))
    if not paths:
        raise FileNotFoundError(args.pack)

    from shapemol_tpu.data.preprocess import _batched_encode
    if args.mode == "voxelAE":
        from shapemol_tpu.cli.train_shape_ae import load_voxel_encoder
        encoder_fn = load_voxel_encoder(args.shape_ckpt, logger)
    else:
        from shapemol_tpu.cli.train_diffusion import load_shape_encoder
        encoder_fn = load_shape_encoder(args.shape_ckpt, logger)

    for path in paths:
        with np.load(path, allow_pickle=False) as z:
            arrays = {k: np.asarray(z[k]) for k in z.files}
        if args.mode == "voxelAE":
            from shapemol_tpu.geom.voxel import get_voxel_shape
            from shapemol_tpu.chem import vocab
            voxels = []
            for r in range(arrays["pos"].shape[0]):
                m = arrays["node_mask"][r].astype(bool)
                zs = vocab.get_atomic_numbers(
                    arrays["v"][r][m].tolist(), args.atom_mode)
                voxels.append(get_voxel_shape(zs,
                                              arrays["pos"][r][m])[..., None])
            latents = _batched_encode(encoder_fn, np.stack(voxels),
                                      args.batch_size)
            latents = np.asarray(latents, np.float32)
            if latents.shape[-1] % 3:
                raise ValueError(
                    f"voxel z_dim {latents.shape[-1]} must be divisible by "
                    f"3 to reshape into (S, 3) conditioning channels")
            latents = latents.reshape(latents.shape[0], -1, 3)
            n_src = len(voxels)
        else:
            if "cloud" not in arrays:
                raise ValueError(f"{path} has no stored surface clouds "
                                 "(rebuild with --keep_cloud)")
            latents = _batched_encode(encoder_fn, arrays["cloud"],
                                      args.batch_size)
            n_src = arrays["cloud"].shape[0]
        arrays["shape_emb"] = np.asarray(latents, np.float32)
        out = (path[:-len(".npz")] + args.out_suffix + ".npz"
               if args.out_suffix and path.endswith(".npz")
               else path + args.out_suffix if args.out_suffix else path)
        tmp = out + ".tmp.npz"
        np.savez_compressed(tmp, **arrays)
        os.replace(tmp, out)
        logger.info(f"re-encoded {n_src} records ({args.mode}) "
                    f"-> {out} (emb {arrays['shape_emb'].shape[1:]})")


if __name__ == "__main__":
    main()
