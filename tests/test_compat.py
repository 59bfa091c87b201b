"""Torch checkpoint importer tests against the real se_model.pt shipped with
the reference (read-only mount)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

SE_MODEL = "/root/reference/trained_models/se_model.pt"

pytestmark = pytest.mark.skipif(not os.path.exists(SE_MODEL),
                                reason="reference checkpoint not mounted")


@pytest.fixture(scope="module")
def loaded():
    from shapemol_tpu.compat.torch_import import load_se_model
    return load_se_model(SE_MODEL)


def test_structure_matches_model(loaded):
    """Imported variables must be apply-able without re-init (exact pytree
    structure match)."""
    model, variables = loaded
    pts = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 3)),
                      jnp.float32)
    z = model.apply(variables, pts, method=model.encode)
    assert z.shape == (2, 32, 3)
    assert np.all(np.isfinite(np.asarray(z)))


def test_imported_weights_values(loaded):
    """Spot-check tensor mapping (transpose) against the raw torch dict."""
    from shapemol_tpu.compat.torch_import import load_torch_checkpoint
    model, variables = loaded
    ckpt = load_torch_checkpoint(SE_MODEL)
    w = ckpt["model"]["encoder.conv_pos.map_to_feat.weight"].numpy()
    k = np.asarray(
        variables["params"]["encoder"]["conv_pos"]["map_to_feat"]["kernel"])
    np.testing.assert_allclose(k, w.T, atol=0)
    rm = ckpt["model"]["encoder.conv_c.batchnorm.bn.running_mean"].numpy()
    m = np.asarray(
        variables["batch_stats"]["encoder"]["conv_c"]["batchnorm"]["mean"])
    np.testing.assert_allclose(m, rm, atol=0)


def test_equivariance_of_imported_encoder(loaded, rot):
    model, variables = loaded
    pts = jnp.asarray(np.random.default_rng(1).standard_normal((1, 64, 3)),
                      jnp.float32)
    R = jnp.asarray(rot)
    z1 = model.apply(variables, pts, method=model.encode)
    z2 = model.apply(variables, pts @ R, method=model.encode)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1 @ R), atol=2e-3)


def test_decoder_runs(loaded):
    model, variables = loaded
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.standard_normal((1, 64, 3)), jnp.float32)
    qp = jnp.asarray(rng.standard_normal((1, 32, 3)) * 2, jnp.float32)
    z, sd = model.apply(variables, pts, qp)
    assert sd.shape == (1, 32)
    assert np.all(np.isfinite(np.asarray(sd)))


def test_replay_is_deterministic():
    from shapemol_tpu.compat.torch_import import _replay_init_weights
    a = _replay_init_weights(2021)
    b = _replay_init_weights(2021)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    # zero-init of decoder block fc_1 (reference nn.init.zeros_)
    assert np.all(a["generator.blocks.0.fc_1.weight"] == 0)
    # different seed -> different weights
    c = _replay_init_weights(7)
    assert not np.allclose(a["encoder.blocks.0.map_to_feat.weight"],
                           c["encoder.blocks.0.map_to_feat.weight"])
