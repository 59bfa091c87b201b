"""Golden numerics vs an independent torch implementation of the reference
formulas (reference models/shape_vn_layers.py:9-110, models/common.py:11-28).

These tests re-derive the VN layer math in torch inside the test (NOT by
importing the reference code) with the reference's (B, C, 3, N) layout, load
the SAME weights into our flax modules in the (B, N, C, 3) layout, and
require agreement to float tolerance — validating the layout reformulation
end to end."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from shapemol_tpu.nn import vn
from shapemol_tpu.nn.basic import GaussianSmearing, FIXED_RBF_OFFSETS

EPS = 1e-6


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32)


def torch_vn_leaky(x_bc3n, w_dir, negative_slope):
    """Reference VNLeakyReLU math (shape_vn_layers.py:30-39), torch,
    layout (B, C, 3, N)."""
    x = torch.from_numpy(x_bc3n)
    wd = torch.from_numpy(w_dir)
    d = (wd @ x.transpose(1, -1).unsqueeze(-1)).squeeze(-1).transpose(1, -1) \
        if False else torch.einsum("oc,bcdn->bodn", wd, x)
    dot = (x * d).sum(2, keepdim=True)
    mask = (dot >= 0).float()
    dns = (d * d).sum(2, keepdim=True)
    out = negative_slope * x + (1 - negative_slope) * (
        mask * x + (1 - mask) * (x - (dot / (dns + EPS)) * d))
    return out.numpy()


def test_vn_leaky_relu_golden():
    B, C, N = 2, 6, 5
    x = _rand((B, C, 3, N), 0)
    w = _rand((C, C), 1)

    expect = torch_vn_leaky(x, w, 0.2)

    layer = vn.VNLeakyReLU(C, negative_slope=0.2)
    # our layout: (B, N, C, 3)
    x_ours = jnp.asarray(np.transpose(x, (0, 3, 1, 2)))
    variables = {"params": {"map_to_dir": {"kernel": jnp.asarray(w.T)}}}
    out = layer.apply(variables, x_ours)
    out_ref_layout = np.transpose(np.asarray(out), (0, 2, 3, 1))
    np.testing.assert_allclose(out_ref_layout, expect, atol=1e-5)


def test_vn_linear_golden():
    B, C, O, N = 2, 4, 7, 5
    x = _rand((B, C, 3, N), 2)
    w = _rand((O, C), 3)
    expect = np.einsum("oc,bcdn->bodn", w, x)

    layer = vn.VNLinear(O)
    x_ours = jnp.asarray(np.transpose(x, (0, 3, 1, 2)))
    variables = {"params": {"map_to_feat": {"kernel": jnp.asarray(w.T)}}}
    out = layer.apply(variables, x_ours)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 2, 3, 1)),
                               expect, atol=1e-5)


def test_vn_linear_leaky_no_bn_golden():
    """Full VNLinearLeakyReLU (no batchnorm): direction from the INPUT,
    gating applied to the linear output (shape_vn_layers.py:95-110)."""
    B, C, O, N = 2, 3, 5, 4
    x = _rand((B, C, 3, N), 4)
    w_feat = _rand((O, C), 5)
    w_dir = _rand((O, C), 6)
    slope = 0.2

    xt = torch.from_numpy(x)
    p = torch.einsum("oc,bcdn->bodn", torch.from_numpy(w_feat), xt)
    d = torch.einsum("oc,bcdn->bodn", torch.from_numpy(w_dir), xt)
    dot = (p * d).sum(2, keepdim=True)
    mask = (dot >= 0).float()
    dns = (d * d).sum(2, keepdim=True)
    expect = (slope * p + (1 - slope) * (
        mask * p + (1 - mask) * (p - (dot / (dns + EPS)) * d))).numpy()

    layer = vn.VNLinearLeakyReLU(C, O, use_batchnorm=False,
                                 negative_slope=slope)
    x_ours = jnp.asarray(np.transpose(x, (0, 3, 1, 2)))
    variables = {"params": {
        "map_to_feat": {"kernel": jnp.asarray(w_feat.T)},
        "map_to_dir": {"kernel": jnp.asarray(w_dir.T)}}}
    out = layer.apply(variables, x_ours)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 2, 3, 1)),
                               expect, atol=1e-5)


def test_gaussian_smearing_fixed_table_golden():
    """The quirky fixed-offset RBF (models/common.py:19-28): 20 centers
    0..10 Å, coeff -0.5/(first gap)^2 regardless of constructor args."""
    dist = np.linspace(0, 11, 23).astype(np.float32)
    offsets = torch.tensor([0, 1, 1.25, 1.5, 1.75, 2, 2.25, 2.5, 2.75, 3,
                            3.5, 4, 4.5, 5, 5.5, 6, 7, 8, 9, 10])
    coeff = -0.5 / (offsets[1] - offsets[0]).item() ** 2
    d = torch.from_numpy(dist).view(-1, 1) - offsets.view(1, -1)
    expect = torch.exp(coeff * d.pow(2)).numpy()

    layer = GaussianSmearing(offsets="fixed")
    out = layer.apply({}, jnp.asarray(dist))
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-6)
    np.testing.assert_allclose(np.asarray(FIXED_RBF_OFFSETS),
                               offsets.numpy(), atol=0)


def test_decoder_invariants_golden():
    """DecoderInner input features (shape_pointcloud_modelAE.py:76-83):
    [<p,p>, p·z_l, <z, VNLinear(z)>_l] — checked against a torch re-derivation."""
    from shapemol_tpu.models.shape_ae import DecoderInner
    B, T, L, Hdim = 2, 6, 4, 8
    p = _rand((B, T, 3), 7)
    z = _rand((B, L, 3), 8)
    w_zin = _rand((L, L), 9)

    pt = torch.from_numpy(p)
    zt = torch.from_numpy(z)
    net_pp = (pt * pt).sum(2, keepdim=True)
    net_pz = torch.einsum("bmi,bni->bmn", pt, zt)
    z_dir = torch.einsum("oc,bci->boi", torch.from_numpy(w_zin), zt)
    z_inv = (zt * z_dir).sum(-1).unsqueeze(1).repeat(1, T, 1)
    expect_feat = torch.cat([net_pp, net_pz, z_inv], dim=2).numpy()

    dec = DecoderInner(latent_dim=L, hidden_dim=Hdim, layer_num=1)
    variables = dec.init(jax.random.PRNGKey(0), jnp.asarray(p),
                         jnp.asarray(z))
    # overwrite z_in with the torch weights, identity-fy fc_in to expose the
    # invariant features: use fc_in kernel = I (padded) and zero bias
    params = variables["params"]
    params["z_in"]["map_to_feat"]["kernel"] = jnp.asarray(w_zin.T)
    feat_dim = 2 * L + 1
    eye = np.zeros((feat_dim, Hdim), np.float32)
    eye[:feat_dim, :feat_dim] = np.eye(feat_dim)[:, :Hdim] if Hdim < feat_dim \
        else np.eye(feat_dim)
    params["fc_in"]["kernel"] = jnp.asarray(eye)
    params["fc_in"]["bias"] = jnp.zeros(Hdim)
    # zero the residual blocks and read through fc_out = first unit vector
    params["block_0"]["fc_0"]["kernel"] = jnp.zeros_like(
        params["block_0"]["fc_0"]["kernel"])
    params["block_0"]["fc_1"]["kernel"] = jnp.zeros_like(
        params["block_0"]["fc_1"]["kernel"])
    params["block_0"]["fc_0"]["bias"] = jnp.zeros_like(
        params["block_0"]["fc_0"]["bias"])
    params["block_0"]["fc_1"]["bias"] = jnp.zeros_like(
        params["block_0"]["fc_1"]["bias"])
    w_out = np.zeros((Hdim, 1), np.float32)
    w_out[0, 0] = 1.0
    params["fc_out"]["kernel"] = jnp.asarray(w_out)
    params["fc_out"]["bias"] = jnp.zeros(1)

    out = dec.apply({"params": params}, jnp.asarray(p), jnp.asarray(z))
    # fc_out(relu(feat @ eye)) = relu(feat[..., 0]) = relu(<p,p>) = <p,p>
    np.testing.assert_allclose(np.asarray(out), expect_feat[..., 0],
                               atol=1e-5)
