"""End-to-end sample_sweep CLI on CPU: tiny model checkpoint + tiny pack,
verifying the pad-size bucketing writes correct per-target result files."""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from shapemol_tpu.chem import vocab
from shapemol_tpu.core.checkpoint import save_checkpoint
from shapemol_tpu.core.config import build_score_model_config, AttrDict
from shapemol_tpu.data.packs import MoleculeRecord, write_pack
from shapemol_tpu.models.score_model import ShapeDiffusionNet
from shapemol_tpu.train.train_state import create_train_state, make_optimizer

MODEL_CFG = {
    "model_type": "uni_o2", "denoise_type": "diffusion",
    "model_mean_type": "C0",
    "schedule_pos": {"beta_schedule": "sigmoid", "beta_start": 1e-7,
                     "beta_end": 0.01, "s": 6},
    "schedule_v": {"beta_schedule": "cosine", "s": 0.01},
    "num_diffusion_timesteps": 8, "loss_v_weight": 100.0,
    "v_mode": "uniform", "v_net_type": "mlp", "loss_pos_type": "mse",
    "sample_time_method": "symmetric", "loss_weight_type": "noise_level",
    "time_emb_dim": 0, "center_pos_mode": "none",
    "atom_enc_mode": "add_aromatic", "num_blocks": 1, "num_layers": 1,
    "hidden_dim": 32, "n_heads": 4, "edge_feat_dim": 0,
    "num_r_gaussian": 8, "knn": 4, "num_node_types": 8, "act_fn": "relu",
    "norm": True, "cutoff_mode": "knn", "ew_net_type": "global",
    "num_x2h": 1, "num_h2x": 1, "r_max": 10.0, "x2h_out_fc": False,
    "sync_twoup": False, "shape_dim": 8, "shape_latent_dim": 8,
    "shape_type": "pointAE_shape", "cond_mask_prob": 0.0,
}


def test_sample_sweep_bucketed(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    num_classes = vocab.feature_dim("add_aromatic")

    # tiny checkpoint
    mc = build_score_model_config(AttrDict.convert(MODEL_CFG), num_classes)
    net = ShapeDiffusionNet(mc)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 3)),
                         jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), bool),
                         jnp.zeros((1, 8, 3)), jnp.zeros((1,), jnp.int32))
    state = create_train_state(variables["params"],
                               variables.get("batch_stats"), make_optimizer())
    ckpt_dir = tmp_path / "checkpoints"
    save_checkpoint(str(ckpt_dir), 1, state,
                    config={"model": MODEL_CFG})

    # tiny test pack: two size groups so the sweep uses two pad buckets
    records = []
    for k in range(4):
        n = 12 if k < 2 else 20          # -> buckets 16 and 24
        records.append(MoleculeRecord(
            pos=rng.standard_normal((n, 3)).astype(np.float32),
            v=rng.integers(0, 8, n).astype(np.int32),
            shape_emb=rng.standard_normal((8, 3)).astype(np.float32),
            smiles=f"C{k}"))
    pack = tmp_path / "toy_test_v1.shard000_00000.npz"
    write_pack(str(pack), records, n_max=24)

    cfg_yml = tmp_path / "sampling.yml"
    cfg_yml.write_text(
        "data:\n  name: shapemol\n  dataset: toy\n  version: toy\n"
        f"  processed_path: {tmp_path}\n"
        "  transform:\n    ligand_atom_mode: add_aromatic\n"
        "sample:\n  seed: 7\n  num_samples: 3\n  num_steps: 8\n"
        "  center_pos_mode: none\n  sample_num_atoms: size\n"
        "  guide_stren: 0.0\n  threshold_type: null\n")

    out_dir = tmp_path / "results"
    from shapemol_tpu.cli import sample_sweep
    monkeypatch.setattr(sys, "argv", [
        "sample_sweep", str(cfg_yml), "--ckpt", str(ckpt_dir),
        "--test_pack", str(pack), "--result_path", str(out_dir),
        "--batch_size", "4", "--max_atoms", "24",
        "--start", "0", "--end", "4",
        # pin the deterministic fallback buckets {16,24,...}: the shipped
        # pad_costs.json is a v5e measurement and would re-plan the buckets
        "--pad_costs", str(tmp_path / "no_such_costs.json")])
    sample_sweep.main()

    for t in range(4):
        f = out_dir / f"result_{t}.npz"
        assert f.exists(), f"missing result for target {t}"
        with np.load(f) as z:
            pos, v, mask = z["pos"], z["v"], z["node_mask"]
        assert pos.shape == (3, 24, 3)
        assert v.shape == (3, 24)
        assert np.isfinite(pos).all()
        want = 12 if t < 2 else 20
        assert (mask.sum(axis=1) == want).all()
        # cross-bucket normalization rows (>= bucket pad) are zero-filled
        bucket_pad = 16 if t < 2 else 24
        if bucket_pad < 24:
            assert np.abs(pos[:, bucket_pad:]).max() == 0.0
        assert (v[mask.astype(bool)] < vocab.feature_dim("add_aromatic")).all()
        # documented result-file contract (module docstring): padded v
        # rows — sampled AND reference — carry the -1 sentinel
        assert (v[~mask.astype(bool)] == -1).all()
        with np.load(f) as z:
            ref_v, ref_mask = z["ref_v"], z["ref_node_mask"]
        assert (ref_v[~ref_mask.astype(bool)] == -1).all()


def test_sample_sweep_guided(tmp_path, monkeypatch):
    """Point-cloud guidance in the sweep: per-target volume-filling
    Gaussian clouds (padded to a fixed size) ride the bucketed batches."""
    rng = np.random.default_rng(1)
    num_classes = vocab.feature_dim("add_aromatic")
    mc = build_score_model_config(AttrDict.convert(MODEL_CFG), num_classes)
    net = ShapeDiffusionNet(mc)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 3)),
                         jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), bool),
                         jnp.zeros((1, 8, 3)), jnp.zeros((1,), jnp.int32))
    state = create_train_state(variables["params"],
                               variables.get("batch_stats"), make_optimizer())
    ckpt_dir = tmp_path / "checkpoints"
    save_checkpoint(str(ckpt_dir), 1, state, config={"model": MODEL_CFG})

    records = []
    for k in range(2):
        records.append(MoleculeRecord(
            pos=rng.standard_normal((12, 3)).astype(np.float32),
            v=rng.integers(0, 8, 12).astype(np.int32),
            shape_emb=rng.standard_normal((8, 3)).astype(np.float32),
            smiles=f"C{k}"))
    pack = tmp_path / "toy_test_v1.shard000_00000.npz"
    write_pack(str(pack), records, n_max=16)

    cfg_yml = tmp_path / "sampling.yml"
    cfg_yml.write_text(
        "data:\n  name: shapemol\n  dataset: toy\n  version: toy\n"
        f"  processed_path: {tmp_path}\n"
        "  transform:\n    ligand_atom_mode: add_aromatic\n"
        "sample:\n  seed: 7\n  num_samples: 2\n  num_steps: 8\n"
        "  center_pos_mode: none\n  sample_num_atoms: size\n"
        "  guide_stren: 0.0\n  threshold_type: null\n"
        "  use_pointcloud: True\n  use_pointcloud_radius: 0.2\n"
        "  grad_step: 2\n")

    out_dir = tmp_path / "results"
    from shapemol_tpu.cli import sample_sweep
    monkeypatch.setattr(sys, "argv", [
        "sample_sweep", str(cfg_yml), "--ckpt", str(ckpt_dir),
        "--test_pack", str(pack), "--result_path", str(out_dir),
        "--batch_size", "4", "--max_atoms", "16",
        "--start", "0", "--end", "2",
        "--pad_costs", str(tmp_path / "no_such_costs.json")])
    sample_sweep.main()

    for t in range(2):
        with np.load(out_dir / f"result_{t}.npz") as z:
            pos, mask = z["pos"], z["node_mask"]
        assert np.isfinite(pos).all()
        # guided positions must stay near the target (clouds are centered
        # on the reference atoms; dummies live at 1e6 and must never pull)
        assert np.abs(pos[mask.astype(bool)]).max() < 100.0
