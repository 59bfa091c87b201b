"""Encoder-map validation (decoder-free): for each real molecule, encode two
INDEPENDENT surface-cloud samples; intra-molecule latent distance must be
far below inter-molecule distance. Works for any (S,3) encoder; quantifies
how informative/stable the shape->latent map is. Also reports rotation
equivariance error: z(R·cloud) vs R·z(cloud)."""
import json, sys
import numpy as np
import jax, jax.numpy as jnp
from shapemol_tpu.compat.rdkit_unpickle import load_rdkit_mol_pickle
from shapemol_tpu.geom import shape_emb as semb
from shapemol_tpu.core import misc

misc.enable_compilation_cache()
CKPT = sys.argv[1] if len(sys.argv) > 1 else '/root/reference/trained_models/se_model.pt'
N_MOLS, N_PTS, BS = 128, 512, 32

mols = load_rdkit_mol_pickle('/root/reference/data/MOSES2_test_mol.pkl')[:N_MOLS]
rng = np.random.default_rng(0)
c1, c2 = [], []
for m in mols:
    a, _, _ = semb.mol_surface_cloud(m.atomic_nums, m.pos, N_PTS, rng=rng)
    b, _, _ = semb.mol_surface_cloud(m.atomic_nums, m.pos, N_PTS, rng=rng)
    c1.append(a); c2.append(b)
c1 = np.stack(c1).astype(np.float32); c2 = np.stack(c2).astype(np.float32)

import logging
from shapemol_tpu.cli.train_diffusion import load_shape_encoder
enc = load_shape_encoder(CKPT, logging.getLogger("v"))

def encode(c):
    out = []
    for s in range(0, len(c), BS):
        blk = c[s:s+BS]
        if len(blk) < BS:
            blk = np.concatenate([blk, np.repeat(blk[-1:], BS-len(blk), 0)])
        out.append(np.asarray(enc(jnp.asarray(blk)))[:min(BS, len(c)-s)])
    return np.concatenate(out)

z1, z2 = encode(c1), encode(c2)
z1f, z2f = z1.reshape(N_MOLS, -1), z2.reshape(N_MOLS, -1)
intra = np.linalg.norm(z1f - z2f, axis=1)
inter = np.linalg.norm(z1f[:, None] - z1f[None, :], axis=-1)
inter = inter[~np.eye(N_MOLS, dtype=bool)]
# retrieval: for each z2, nearest z1 should be its own molecule
d = np.linalg.norm(z2f[:, None] - z1f[None, :], axis=-1)
top1 = float((d.argmin(1) == np.arange(N_MOLS)).mean())
# equivariance: z(R c) vs R z(c)
Q, _ = np.linalg.qr(np.random.default_rng(1).standard_normal((3, 3)))
if np.linalg.det(Q) < 0:      # VN nets are equivariant to PROPER rotations
    Q[:, 0] *= -1
zr = encode((c1 @ Q.T.astype(np.float32)))
err = np.linalg.norm(zr - z1 @ Q.T.astype(np.float32), axis=(1, 2))
ref = np.linalg.norm(z1, axis=(1, 2))
out = {"ckpt": CKPT, "intra_mean": float(intra.mean()),
       "inter_mean": float(inter.mean()),
       "separation": float(inter.mean() / max(intra.mean(), 1e-9)),
       "top1_retrieval": top1,
       "equivariance_rel_err": float((err / np.maximum(ref, 1e-9)).mean())}
print("RESULT " + json.dumps(out))
