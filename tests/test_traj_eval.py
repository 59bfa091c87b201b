"""Trajectory recording + --eval_step evaluation (reference
evaluate_diffusion_sim.py:135: metrics at pred_pos[eval_step])."""
import json
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

from tests.test_sample_sweep_cli import MODEL_CFG


def test_sample_record_traj_and_eval_step(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    num_classes = vocab.feature_dim("add_aromatic")
    mc = build_score_model_config(AttrDict.convert(MODEL_CFG), num_classes)
    net = ShapeDiffusionNet(mc)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 3)),
                         jnp.zeros((1, 8), jnp.int32),
                         jnp.ones((1, 8), bool),
                         jnp.zeros((1, 8, 3)), jnp.zeros((1,), jnp.int32))
    state = create_train_state(variables["params"],
                               variables.get("batch_stats"),
                               make_optimizer())
    ckpt_dir = tmp_path / "checkpoints"
    save_checkpoint(str(ckpt_dir), 1, state, config={"model": MODEL_CFG})

    records = [MoleculeRecord(
        pos=rng.standard_normal((10, 3)).astype(np.float32),
        v=rng.integers(0, 8, 10).astype(np.int32),
        shape_emb=rng.standard_normal((8, 3)).astype(np.float32),
        smiles="C")]
    pack = tmp_path / "toy_test_v1.shard000_00000.npz"
    write_pack(str(pack), records, n_max=16)

    cfg_yml = tmp_path / "sampling.yml"
    cfg_yml.write_text(
        "data:\n  name: shapemol\n  dataset: toy\n  version: toy\n"
        f"  processed_path: {tmp_path}\n"
        "  transform:\n    ligand_atom_mode: add_aromatic\n"
        "sample:\n  seed: 7\n  num_samples: 2\n  num_steps: 8\n"
        "  center_pos_mode: none\n  sample_num_atoms: size\n"
        "  guide_stren: 0.0\n  threshold_type: null\n")

    out_dir = tmp_path / "results"
    from shapemol_tpu.cli import sample
    monkeypatch.setattr(sys, "argv", [
        "sample", str(cfg_yml), "--ckpt", str(ckpt_dir),
        "--test_pack", str(pack), "--result_path", str(out_dir),
        "--batch_size", "2", "--max_atoms", "16", "--record_traj"])
    sample.main()

    with np.load(out_dir / "result_0.npz") as z:
        assert z["pos_traj"].shape == (2, 8, 16, 3)
        assert z["v_traj"].shape == (2, 8, 16)
        # final trajectory entry == reported final state
        np.testing.assert_allclose(z["pos_traj"][:, -1], z["pos"])
        np.testing.assert_array_equal(z["v_traj"][:, -1], z["v"])

    # evaluate at an intermediate step runs end-to-end and differs from the
    # final-state metrics input (positions at step 3 != final)
    from shapemol_tpu.cli import evaluate
    monkeypatch.setattr(sys, "argv", [
        "evaluate", str(out_dir), "--eval_step", "3",
        "--out", str(tmp_path / "m3.json")])
    evaluate.main()
    monkeypatch.setattr(sys, "argv", [
        "evaluate", str(out_dir), "--out", str(tmp_path / "mf.json")])
    evaluate.main()
    m3 = json.load(open(tmp_path / "m3.json"))["metrics"]
    mf = json.load(open(tmp_path / "mf.json"))["metrics"]
    assert m3["n_samples"] == mf["n_samples"] == 2
