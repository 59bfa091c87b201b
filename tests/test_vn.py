"""Equivariance property tests for the Vector-Neuron layer zoo
(reference models/shape_vn_layers.py): for every VN layer L and rotation R,
L(x R) == L(x) R (channels of 3-vectors transform by right-multiplication in
our (..., C, 3) layout)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapemol_tpu.nn import vn


def _apply(module, x, rot=None, **kwargs):
    variables = module.init(jax.random.PRNGKey(0), x, **kwargs)
    return module.apply(variables, x, **kwargs)


def _init_and_apply(module, x, **kwargs):
    variables = module.init(jax.random.PRNGKey(0), x, **kwargs)
    def f(y):
        return module.apply(variables, y, **kwargs)
    return f


@pytest.mark.parametrize("layer_fn", [
    lambda: vn.VNLinear(8),
    lambda: vn.VNLeakyReLU(6),
    lambda: vn.VNLeakyReLU(6, share_nonlinearity=True),
    lambda: vn.VNLinearLeakyReLU(6, 8, use_batchnorm=False),
    lambda: vn.VNResnetBlockFC(6, 8),
    lambda: vn.VNResnetBlockFC(6, 6),
])
def test_vn_layer_equivariance(layer_fn, rot):
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 5, 6, 3)),
                    jnp.float32)
    R = jnp.asarray(rot)
    f = _init_and_apply(layer_fn(), x)
    out_rot = f(x @ R)
    np.testing.assert_allclose(np.asarray(out_rot), np.asarray(f(x) @ R),
                               atol=1e-4)


def test_vn_batchnorm_equivariance(rot):
    x = jnp.asarray(np.random.default_rng(2).standard_normal((4, 7, 6, 3)),
                    jnp.float32)
    R = jnp.asarray(rot)
    m = vn.VNBatchNorm(6)
    variables = m.init(jax.random.PRNGKey(0), x)
    f = lambda y: m.apply(variables, y, mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(f(x @ R)), np.asarray(f(x) @ R),
                               atol=1e-4)


def test_vn_batchnorm_masked_stats_ignore_padding():
    rng = np.random.default_rng(3)
    x_valid = jnp.asarray(rng.standard_normal((2, 4, 6, 3)), jnp.float32)
    pad = jnp.asarray(100.0 * rng.standard_normal((2, 3, 6, 3)), jnp.float32)
    x_padded = jnp.concatenate([x_valid, pad], axis=1)
    mask = jnp.concatenate([jnp.ones((2, 4), bool), jnp.zeros((2, 3), bool)],
                           axis=1)
    m = vn.VNBatchNorm(6)
    variables = m.init(jax.random.PRNGKey(0), x_valid)
    out_ref, _ = m.apply(variables, x_valid, mutable=["batch_stats"])
    out_pad, _ = m.apply(variables, x_padded, mask=mask,
                         mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_pad[:, :4]),
                               np.asarray(out_ref), atol=1e-4)


def test_vn_linear_leaky_with_batchnorm_equivariance(rot):
    x = jnp.asarray(np.random.default_rng(4).standard_normal((3, 6, 4, 3)),
                    jnp.float32)
    R = jnp.asarray(rot)
    m = vn.VNLinearLeakyReLU(4, 8, use_batchnorm=True)
    variables = m.init(jax.random.PRNGKey(0), x)
    f = lambda y: m.apply(variables, y, mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(f(x @ R)), np.asarray(f(x) @ R),
                               atol=1e-4)


def test_knn_indices_match_bruteforce():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 30, 3)).astype(np.float32)
    idx = np.asarray(vn.knn_indices(jnp.asarray(x), k=5))
    for b in range(2):
        d = np.linalg.norm(x[b][:, None] - x[b][None], axis=-1)
        expect = np.argsort(d, axis=-1)[:, :5]
        got_sets = [set(row) for row in idx[b]]
        exp_sets = [set(row) for row in expect]
        assert got_sets == exp_sets
    # self is always among the neighbors (distance zero)
    assert all(i in set(idx[0, i]) for i in range(30))


def test_graph_feature_cross_equivariance(rot):
    x = jnp.asarray(np.random.default_rng(6).standard_normal((2, 12, 1, 3)),
                    jnp.float32)
    R = jnp.asarray(rot)
    f = lambda y: vn.get_graph_feature_cross(y, k=4, if_cross=True)
    np.testing.assert_allclose(np.asarray(f(x @ R)), np.asarray(f(x) @ R),
                               atol=1e-4)


def test_resnet_block_zero_init_is_identity():
    x = jnp.asarray(np.random.default_rng(7).standard_normal((5, 9)),
                    jnp.float32)
    m = vn.ResnetBlockFC(9)
    variables = m.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(m.apply(variables, x)),
                               np.asarray(x), atol=1e-6)


def test_vn_std_feature_invariance(rot):
    """VNStdFeature output must be rotation-INVARIANT (features projected
    onto an equivariant learned frame) and the frame equivariant."""
    x = jnp.asarray(np.random.default_rng(8).standard_normal((2, 8, 3)),
                    jnp.float32)
    R = jnp.asarray(rot)
    m = vn.VNStdFeature(8, normalize_frame=True)
    variables = m.init(jax.random.PRNGKey(0), x)
    std1, f1 = m.apply(variables, x)
    std2, f2 = m.apply(variables, x @ R)
    np.testing.assert_allclose(np.asarray(std2), np.asarray(std1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1 @ R), atol=2e-4)
    # orthonormal frame
    gram = np.asarray(jnp.einsum("...ij,...kj->...ik", f1, f1))
    np.testing.assert_allclose(gram, np.tile(np.eye(3), (2, 1, 1)),
                               atol=1e-4)
