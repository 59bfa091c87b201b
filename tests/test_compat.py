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


def test_imported_encoder_matches_torch_forward():
    """End-to-end golden: the flax encoder with imported se_model.pt weights
    must reproduce a torch re-implementation of the reference VN-DGCNN
    forward (dense knn + graph features + VN linear/leaky/batchnorm in eval
    mode) on the same input, to float tolerance."""
    import torch
    from shapemol_tpu.compat.torch_import import (load_se_model,
                                                  load_torch_checkpoint,
                                                  _replay_init_weights)

    model, variables = load_se_model(SE_MODEL)
    ckpt = load_torch_checkpoint(SE_MODEL)
    sd = {k: v.clone() for k, v in ckpt["model"].items()}
    for k, v in _replay_init_weights(2021).items():
        sd.setdefault(k, torch.from_numpy(v))

    B, N, K, EPS = 1, 64, 20, 1e-6
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((B, N, 3)).astype(np.float32)

    # ---- torch forward in the reference layout (B, C, 3, N)
    def t_knn(xf, k):
        inner = -2 * torch.matmul(xf.transpose(2, 1), xf)
        xx = torch.sum(xf ** 2, dim=1, keepdim=True)
        pd = -xx - inner - xx.transpose(2, 1)
        return pd.topk(k=k, dim=-1)[1]

    def t_graph_feature(x, k):
        Bt, _, Nt = x.shape[0], x.shape[1], x.shape[3]
        xf = x.reshape(Bt, -1, Nt)
        idx = t_knn(xf, k)
        idx = (idx + torch.arange(Bt).view(-1, 1, 1) * Nt).view(-1).long()
        C = xf.shape[1] // 3
        xt = xf.transpose(2, 1).contiguous()
        feat = xt.view(Bt * Nt, -1)[idx, :].view(Bt, Nt, k, C, 3)
        xc = xt.view(Bt, Nt, 1, C, 3).repeat(1, 1, k, 1, 1)
        out = torch.cat((feat - xc, xc), dim=3).permute(0, 3, 4, 1, 2)
        return out.contiguous()

    def t_vnll(x, pre, use_bn=True):
        w_feat = sd[f"{pre}.map_to_feat.weight"]
        p = torch.einsum("oc,bc...->bo...", w_feat, x)
        if use_bn:
            # unregistered blocks carry fresh batch-norm state
            C_out = w_feat.shape[0]
            mean = sd.get(f"{pre}.batchnorm.bn.running_mean",
                          torch.zeros(C_out))
            var = sd.get(f"{pre}.batchnorm.bn.running_var",
                         torch.ones(C_out))
            gam = sd.get(f"{pre}.batchnorm.bn.weight", torch.ones(C_out))
            bet = sd.get(f"{pre}.batchnorm.bn.bias", torch.zeros(C_out))
            norm = torch.norm(p, dim=2) + EPS      # (B, C, ...)
            sh = [1, -1] + [1] * (norm.dim() - 2)
            nbn = (norm - mean.view(sh)) / torch.sqrt(var.view(sh) + 1e-5) \
                * gam.view(sh) + bet.view(sh)
            p = p / norm.unsqueeze(2) * nbn.unsqueeze(2)
        d = torch.einsum("oc,bc...->bo...", sd[f"{pre}.map_to_dir.weight"], x)
        dot = (p * d).sum(2, keepdim=True)
        mask = (dot >= 0).float()
        dns = (d * d).sum(2, keepdim=True)
        return 0.2 * p + 0.8 * (mask * p + (1 - mask) *
                                (p - (dot / (dns + EPS)) * d))

    x = torch.from_numpy(pts).unsqueeze(1).transpose(2, 3)  # (B,1,3,N)
    feat = t_graph_feature(x, K)                            # (B,2,3,N,K)
    hidden = t_vnll(feat, "encoder.conv_pos").mean(dim=-1)  # (B,128,3,N)
    hiddens = []
    for i in range(4):
        hf = t_graph_feature(hidden, K)
        hidden = t_vnll(hf, f"encoder.blocks.{i}").mean(dim=-1)
        hiddens.append(hidden)
    cat = torch.cat(hiddens, dim=1)                         # (B,512,3,N)
    lat = t_vnll(cat, "encoder.conv_c")                     # (B,32,3,N)
    expect = lat.mean(dim=-1).numpy()                       # (B,32,3)

    got = np.asarray(model.apply(variables, jnp.asarray(pts),
                                 method=model.encode))
    np.testing.assert_allclose(got, expect, atol=5e-4)
