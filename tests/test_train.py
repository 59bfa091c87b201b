"""Train-state/scheduler/loops tests + voxel AE + checkpointing."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapemol_tpu.train.train_state import (PlateauScheduler, ExpMinScheduler,
                                            create_train_state,
                                            get_learning_rate, get_scheduler,
                                            make_optimizer, set_learning_rate,
                                            ema_update)


def test_plateau_scheduler():
    s = PlateauScheduler(factor=0.5, patience=2, min_lr=1e-5)
    lr = 1e-3
    lr = s.step(1.0, lr)          # best=1.0
    assert lr == 1e-3
    for _ in range(2):
        lr = s.step(1.0, lr)      # no improvement x2 (== patience)
    assert lr == 1e-3
    lr = s.step(1.0, lr)          # exceeds patience -> decay
    assert lr == pytest.approx(5e-4)
    lr = s.step(0.5, lr)          # improvement resets
    assert lr == pytest.approx(5e-4)
    # floors at min_lr
    for _ in range(100):
        lr = s.step(1.0, lr)
    assert lr >= 1e-5


def test_expmin_scheduler():
    s = get_scheduler("expmin", factor=0.5, min_lr=1e-4, lr=1e-3)
    lr = s.step()
    assert lr == pytest.approx(5e-4)
    for _ in range(50):
        lr = s.step()
    assert lr == 1e-4
    sm = get_scheduler("expmin_milestone", factor=0.5, min_lr=1e-6, lr=1e-3,
                       milestone=2)
    assert sm.step() == pytest.approx(1e-3)   # before milestone: no decay
    assert sm.step() == pytest.approx(1e-3)
    assert sm.step() == pytest.approx(5e-4)


def test_injected_lr_and_clipping():
    tx = make_optimizer(lr=1e-2, max_grad_norm=1.0)
    params = {"w": jnp.ones(4)}
    state = create_train_state(params, None, tx)
    assert get_learning_rate(state) == pytest.approx(1e-2)
    state = set_learning_rate(state, 5e-3)
    assert get_learning_rate(state) == pytest.approx(5e-3)
    # huge gradient is clipped to norm 1 -> adam step magnitude ~lr
    grads = {"w": jnp.full(4, 1e6)}
    updates, _ = tx.update(grads, state.opt_state, state.params)
    assert float(jnp.max(jnp.abs(updates["w"]))) <= 5.1e-3


def test_ema_update():
    ema = {"w": jnp.zeros(2)}
    p = {"w": jnp.ones(2)}
    out = ema_update(ema, p, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1)


def test_checkpoint_roundtrip(tmp_path):
    from shapemol_tpu.core.checkpoint import (latest_step, restore_checkpoint,
                                              save_checkpoint)
    tx = make_optimizer()
    params = {"w": jnp.arange(4, dtype=jnp.float32)}
    state = create_train_state(params, {"bn": jnp.ones(2)}, tx)
    save_checkpoint(str(tmp_path / "ck"), 10, state, config={"a": 1},
                    scheduler_state={"best": 0.5})
    save_checkpoint(str(tmp_path / "ck"), 20, state)
    assert latest_step(str(tmp_path / "ck")) == 20
    template = create_train_state({"w": jnp.zeros(4)},
                                  {"bn": jnp.zeros(2)}, tx)
    restored, meta = restore_checkpoint(str(tmp_path / "ck"), template, 10)
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.arange(4))
    assert meta["config"] == {"a": 1}


def test_voxel_ae():
    from shapemol_tpu.models.voxel_ae import (VoxelAE, VoxelAEConfig,
                                              voxel_ae_train_loss,
                                              reconstruct_voxel_grid)
    cfg = VoxelAEConfig(ef_dim=4, gf_dim=8, z_dim=16)
    model = VoxelAE(cfg)
    rng = np.random.default_rng(0)
    voxels = jnp.asarray(rng.random((2, 32, 32, 32, 1)) < 0.3, jnp.float32)
    points = jnp.asarray(rng.uniform(0, 32, (2, 64, 3)), jnp.float32)
    values = jnp.asarray(rng.random((2, 64)) < 0.3, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), voxels, points)
    z, out = model.apply(variables, voxels, points)
    assert z.shape == (2, 16) and out.shape == (2, 64)
    assert float(jnp.min(z)) >= 0 and float(jnp.max(z)) <= 1
    loss = voxel_ae_train_loss(model, variables, voxels, points, values)
    assert np.isfinite(float(loss))
    grid = reconstruct_voxel_grid(model, variables, z, 8)
    assert grid.shape == (2, 8, 8, 8)
    assert set(np.unique(np.asarray(grid))) <= {0, 1}


def test_config_yaml_roundtrip(tmp_path):
    from shapemol_tpu.core.config import load_config, dump_config, AttrDict
    cfg = {"model": {"hidden_dim": 64, "topo_emb_type": "None"},
           "train": {"lr": 1e-3}}
    path = str(tmp_path / "c.yml")
    dump_config(cfg, path)
    loaded = load_config(path)
    assert loaded.model.hidden_dim == 64
    # 'None' string normalized to real None (reference quirk Q4 fixed)
    assert loaded.model.topo_emb_type is None
    assert loaded.get_path("train.lr") == 1e-3
    assert loaded.get_path("missing.key", "dflt") == "dflt"


def test_build_score_model_config():
    from shapemol_tpu.core.config import (AttrDict, build_score_model_config,
                                          load_config)
    cfg = load_config("configs/training/diffusion.yml")
    mc = build_score_model_config(cfg.model, 15)
    assert mc.num_classes == 15
    assert mc.denoiser.num_layers == 8
    assert mc.denoiser.n_heads == 16
    assert mc.schedule_pos["beta_schedule"] == "sigmoid"
    sched = mc.make_schedule()
    assert sched.num_timesteps == 1000
