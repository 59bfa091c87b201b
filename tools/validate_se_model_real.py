"""Validate the imported se_model.pt stage-1 AE on REAL MOSES2 molecules:
signed-distance MSE / accuracy / recall (the reference's val metrics,
models/shape_pointcloud_modelAE.py:134-144) over real surface clouds.
Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/validate_se_model_real.py
"""
import json, sys
import numpy as np
import jax, jax.numpy as jnp

from shapemol_tpu.compat.rdkit_unpickle import load_rdkit_mol_pickle
from shapemol_tpu.compat.torch_import import load_se_model
from shapemol_tpu.geom import shape_emb as semb
from shapemol_tpu.geom.surface import sample_sdf_points
from shapemol_tpu.models.shape_ae import shape_ae_val_metrics
from shapemol_tpu.core import misc

misc.enable_compilation_cache()
N_MOLS, N_PTS, N_Q, BS = 256, 512, 1024, 32

mols = load_rdkit_mol_pickle('/root/reference/data/MOSES2_test_mol.pkl')[:N_MOLS]
clouds, qpts, vals = [], [], []
rng = np.random.default_rng(0)
for m in mols:
    cloud, center, _ = semb.mol_surface_cloud(m.atomic_nums, m.pos, N_PTS, rng=rng)
    pts, sd = sample_sdf_points(m.atomic_nums, m.pos, cloud + center, N_Q, rng=rng)
    clouds.append(cloud); qpts.append(pts - center); vals.append(sd)
clouds = np.stack(clouds).astype(np.float32)
qpts = np.stack(qpts).astype(np.float32)
vals = np.stack(vals).astype(np.float32)
print("prepared", clouds.shape, flush=True)

model, variables = load_se_model('/root/reference/trained_models/se_model.pt')

@jax.jit
def fwd(c, q):
    _, pred = model.apply(variables, c, q, train=False)
    return pred

losses, accs, recs = [], [], []
for s in range(0, N_MOLS, BS):
    pred = fwd(jnp.asarray(clouds[s:s+BS]), jnp.asarray(qpts[s:s+BS]))
    l, a, r = shape_ae_val_metrics(pred, jnp.asarray(vals[s:s+BS]))
    losses.append(float(l)); accs.append(float(a)); recs.append(float(r))
    print(f"batch {s//BS}: loss {losses[-1]:.5f} acc {accs[-1]:.4f} rec {recs[-1]:.4f}", flush=True)

out = {"n_mols": N_MOLS, "sd_mse": float(np.mean(losses)),
       "sign_acc": float(np.mean(accs)), "recall": float(np.mean(recs))}
print("RESULT " + json.dumps(out))
