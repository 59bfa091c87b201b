"""Stage-1 conditioning-ceiling probe (VERDICT r3 item 7).

How much of the remaining ROCS gap is stage-1 *encoder* quality vs
*diffusion* quality? Build two perturbed variants of the test pack and
compare sampling quality across three conditionings:

  own      — the target's own encoder latent (production path, the base
             test pack as-is).
  resample — the latent of a freshly re-sampled 512-point surface cloud of
             the SAME target (new RNG; measures how much latent jitter the
             finite cloud sample injects — the encoder consistency floor).
  shuffle  — a DIFFERENT target's latent (roll by one within the probed
             range; destroys the conditioning signal entirely — the ROCS
             floor any checkpoint gets "for free" from MOSES2 statistics).

ROCS(own) - ROCS(shuffle) is the conditioning signal the diffusion model
actually extracts; ROCS(own) - ROCS(resample) bounds the stage-1 encoder's
sampling-noise contribution (reference conditioning protocol:
utils/shape.py:240-284).

Usage:
  python tools/conditioning_ceiling.py build [--n 50]    # write packs
  # then sample each pack with cli/sample_sweep and evaluate:
  #   processed_data/ceiling_own.npz / _resample.npz / _shuffle.npz
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEST_PACK = "processed_data/moses2_test_v1.shard000_00000.npz"
S1_CKPT = "logs_real/shape_ae_2026_08_16__21_14_54_real/checkpoints"


def build(n: int, seed: int = 0):
    from shapemol_tpu.chem import vocab
    from shapemol_tpu.geom import shape_emb as semb
    from shapemol_tpu.cli.train_diffusion import load_shape_encoder

    class _Log:
        def info(self, m):
            print(m)

    encoder_fn = load_shape_encoder(S1_CKPT, _Log())
    base = dict(np.load(TEST_PACK, allow_pickle=False))
    sub = {k: v[:n] for k, v in base.items()}
    np.savez_compressed("processed_data/ceiling_own.npz", **sub)

    # resample: fresh surface cloud per target, same encoder
    atom_mode = "add_aromatic"
    new_emb = []
    for t in range(n):
        mask = sub["node_mask"][t]
        pos = sub["pos"][t][mask]
        z = np.asarray(vocab.get_atomic_numbers(sub["v"][t][mask],
                                                atom_mode))
        rng = np.random.default_rng(seed + 31337 + t)
        cloud, center, _b = semb.mol_surface_cloud(
            z, pos, sub["cloud"].shape[1], rng=rng)
        new_emb.append(np.asarray(
            encoder_fn(cloud[None].astype(np.float32)))[0])
    res = dict(sub)
    res["shape_emb"] = np.stack(new_emb).astype(np.float32)
    np.savez_compressed("processed_data/ceiling_resample.npz", **res)

    shuf = dict(sub)
    shuf["shape_emb"] = np.roll(sub["shape_emb"], 1, axis=0)
    np.savez_compressed("processed_data/ceiling_shuffle.npz", **shuf)
    print(f"wrote ceiling packs (n={n}): own / resample / shuffle")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["build"])
    p.add_argument("--n", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    build(a.n, a.seed)
