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
    args = p.parse_args()

    logger = misc.get_logger("reencode")
    paths = sorted(glob.glob(args.pack))
    if not paths:
        raise FileNotFoundError(args.pack)

    from shapemol_tpu.cli.train_diffusion import load_shape_encoder
    from shapemol_tpu.data.preprocess import _batched_encode
    encoder_fn = load_shape_encoder(args.shape_ckpt, logger)

    for path in paths:
        with np.load(path, allow_pickle=False) as z:
            arrays = {k: np.asarray(z[k]) for k in z.files}
        if "cloud" not in arrays:
            raise ValueError(f"{path} has no stored surface clouds "
                             "(rebuild with --keep_cloud)")
        latents = _batched_encode(encoder_fn, arrays["cloud"],
                                  args.batch_size)
        arrays["shape_emb"] = np.asarray(latents, np.float32)
        tmp = path + ".tmp.npz"
        np.savez_compressed(tmp, **arrays)
        os.replace(tmp, path)
        logger.info(f"re-encoded {arrays['cloud'].shape[0]} records "
                    f"-> {path} (emb {arrays['shape_emb'].shape[1:]})")


if __name__ == "__main__":
    main()
