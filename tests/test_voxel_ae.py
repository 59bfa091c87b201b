"""Voxel shape-AE training path: dataset builder, query sampling, train/eval
steps, and encoding a voxel grid into a conditioning latent.

Reference parity: IM_AE (models/shape_modelAE.py:102-164) trained via
scripts/train_shapeAE.py on shape_type 'voxel' data
(datasets/shape_data.py:121-122,189-202); embedding precompute via
get_voxelAE_shape_emb (utils/shape.py:186-224)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shapemol_tpu.data.preprocess import (preprocess_voxel_dataset,
                                          VoxelPackDataset)
from shapemol_tpu.data.synthetic import random_dataset
from shapemol_tpu.geom.voxel import get_voxel_shape, sample_grids_for_voxel
from shapemol_tpu.models.voxel_ae import VoxelAE, VoxelAEConfig
from shapemol_tpu.train.loops import (make_voxel_ae_train_step,
                                      make_voxel_ae_eval_step)
from shapemol_tpu.train.train_state import create_train_state, make_optimizer

# G = int(2*8/0.5+1) = 33 -> conv chain 33->17->9->5->VALID(4,2)->1
MAX_DIST = 8.0


def test_sample_grids_for_voxel_semantics():
    rng = np.random.default_rng(0)
    vox = np.zeros((16, 16, 16), np.float32)
    vox[4:8, 4:8, 4:8] = 1.0
    pts, vals = sample_grids_for_voxel(vox, 64, rng)
    assert pts.shape == (64, 3) and vals.shape == (64,)
    # second half drawn from occupied cells -> value 1
    assert (vals[32:] == 1.0).all()
    # values equal the grid at the sampled cells
    ipts = pts.astype(int)
    np.testing.assert_array_equal(vals, vox[ipts[:, 0], ipts[:, 1],
                                            ipts[:, 2]])


@pytest.fixture(scope="module")
def voxel_packs(tmp_path_factory):
    mols = random_dataset(12, seed=3)
    out = str(tmp_path_factory.mktemp("vox") / "voxel_v1")
    paths = preprocess_voxel_dataset(mols, out, grid_resolution=0.5,
                                     max_dist=MAX_DIST)
    return paths


def test_voxel_dataset_builder(voxel_packs):
    ds = VoxelPackDataset(voxel_packs[0])
    assert len(ds) == 12 and ds.grid_size == 33
    b = ds.batch([0, 1, 2], num_samples=128,
                 rng=np.random.default_rng(0))
    assert b["voxel"].shape == (3, 33, 33, 33, 1)
    assert b["points"].shape == (3, 128, 3)
    assert b["values"].shape == (3, 128)
    assert b["voxel"].max() == 1.0                   # something occupied


def test_voxel_ae_trains_and_encodes(voxel_packs):
    ds = VoxelPackDataset(voxel_packs[0])
    model = VoxelAE(VoxelAEConfig(ef_dim=8, gf_dim=16, z_dim=32))
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v)
             for k, v in ds.batch(range(8), 256, rng).items()}
    variables = model.init(jax.random.PRNGKey(0), batch["voxel"],
                           batch["points"])
    tx = make_optimizer(lr=3e-3)
    state = create_train_state(variables["params"], None, tx)
    train_step = make_voxel_ae_train_step(model, tx)
    eval_step = make_voxel_ae_eval_step(model)

    losses = []
    for it in range(30):
        b = {k: jnp.asarray(v) for k, v in ds.batch(range(8), 256,
                                                    rng).items()}
        state, m = train_step(state, b)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]

    loss, acc, rec = eval_step(state, batch)
    assert np.isfinite(float(loss)) and 0 <= float(acc) <= 1

    # conditioning latent: (B, z_dim) in (0, 1), deterministic
    z = model.apply({"params": state.params}, batch["voxel"],
                    method=model.encode)
    assert z.shape == (8, 32)
    z = np.asarray(z)
    assert (z >= 0).all() and (z <= 1).all()   # sigmoid (may saturate in f32)
    assert z.std() > 0                          # not collapsed


def test_voxelae_shape_mode_in_preprocess(tmp_path):
    """preprocess_molecules(shape_mode='voxelAE') stores invariant latents."""
    from shapemol_tpu.data.preprocess import preprocess_molecules
    from shapemol_tpu.data.packs import PackDataset
    mols = random_dataset(6, seed=5)
    model = VoxelAE(VoxelAEConfig(ef_dim=8, gf_dim=16, z_dim=32))
    G = int(2 * 11.0 // 0.5 + 1)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, G, G, G, 1)),
                           jnp.zeros((1, 4, 3)))

    @jax.jit
    def encode(voxels):
        return model.apply(variables, voxels, method=model.encode)

    paths = preprocess_molecules(mols, str(tmp_path / "vx"),
                                 encoder_fn=encode, shape_mode="voxelAE",
                                 encode_batch_size=4)
    ds = PackDataset(paths[0])
    assert ds[0]["shape_emb"].shape == (32,)
