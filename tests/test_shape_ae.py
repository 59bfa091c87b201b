"""Shape autoencoder tests: encoder equivariance, decoder invariance,
loss plumbing (reference models/shape_pointcloud_modelAE.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapemol_tpu.models.shape_ae import (ShapeAEConfig, PointCloudAE,
                                          shape_ae_train_loss,
                                          shape_ae_val_metrics)

CFG = ShapeAEConfig(hidden_dim=16, latent_dim=8, layer_num=2, num_k=4)


@pytest.fixture(scope="module")
def model_and_vars():
    model = PointCloudAE(CFG)
    pts = jnp.zeros((2, 32, 3))
    qp = jnp.zeros((2, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), pts, qp)
    return model, variables


def test_shapes(model_and_vars):
    model, variables = model_and_vars
    pts = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 3)),
                      jnp.float32)
    qp = jnp.asarray(np.random.default_rng(1).standard_normal((2, 16, 3)),
                     jnp.float32)
    z, out = model.apply(variables, pts, qp)
    assert z.shape == (2, CFG.latent_dim, 3)
    assert out.shape == (2, 16)
    assert np.all(np.isfinite(np.asarray(out)))


def test_encoder_equivariance(model_and_vars, rot):
    """Rotating the input point cloud must rotate the latent vectors."""
    model, variables = model_and_vars
    pts = jnp.asarray(np.random.default_rng(2).standard_normal((2, 32, 3)),
                      jnp.float32)
    R = jnp.asarray(rot)
    z = model.apply(variables, pts, method=model.encode)
    z_rot = model.apply(variables, pts @ R, method=model.encode)
    np.testing.assert_allclose(np.asarray(z_rot), np.asarray(z @ R),
                               atol=2e-4)


def test_decoder_invariance(model_and_vars, rot):
    """Jointly rotating query points and latent must leave the signed
    distance prediction unchanged (the decoder uses only invariants)."""
    model, variables = model_and_vars
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.standard_normal((2, CFG.latent_dim, 3)), jnp.float32)
    qp = jnp.asarray(rng.standard_normal((2, 16, 3)), jnp.float32)
    R = jnp.asarray(rot)
    out = model.apply(variables, qp, z, method=model.decode)
    out_rot = model.apply(variables, qp @ R, z @ R, method=model.decode)
    np.testing.assert_allclose(np.asarray(out_rot), np.asarray(out),
                               atol=2e-4)


def test_full_pipeline_invariance(model_and_vars, rot):
    """encode(R·cloud) then decode(R·query) == decode(query | encode(cloud))."""
    model, variables = model_and_vars
    rng = np.random.default_rng(4)
    pts = jnp.asarray(rng.standard_normal((2, 32, 3)), jnp.float32)
    qp = jnp.asarray(rng.standard_normal((2, 16, 3)), jnp.float32)
    R = jnp.asarray(rot)
    _, out = model.apply(variables, pts, qp)
    _, out_rot = model.apply(variables, pts @ R, qp @ R)
    np.testing.assert_allclose(np.asarray(out_rot), np.asarray(out),
                               atol=2e-4)


def test_train_loss_and_grads(model_and_vars):
    model, variables = model_and_vars
    rng = np.random.default_rng(5)
    pts = jnp.asarray(rng.standard_normal((2, 32, 3)), jnp.float32)
    qp = jnp.asarray(rng.standard_normal((2, 16, 3)), jnp.float32)
    vals = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)

    params = {"params": variables["params"],
              "batch_stats": variables["batch_stats"]}

    def loss_fn(p):
        loss, _ = shape_ae_train_loss(
            model, {"params": p, "batch_stats": variables["batch_stats"]},
            None, pts, qp, vals)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # at least the registered encoder blocks get gradients (Q1 fix)
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert gnorm > 0


def test_val_metrics():
    pred = jnp.array([[0.9, 0.1, 0.6]])
    vals = jnp.array([[1.0, 0.0, 0.0]])
    loss, acc, rec = shape_ae_val_metrics(pred, vals)
    assert acc == pytest.approx(2 / 3)
    assert rec == pytest.approx(1.0)
