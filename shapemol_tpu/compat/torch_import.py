"""Torch checkpoint importer for the reference's stage-1 weights
(trained_models/se_model.pt).

Background (SURVEY Q1): the reference keeps its encoder/decoder residual
blocks in plain Python lists, so se_model.pt holds only 19 tensors
(conv_pos, conv_c, z_in, fc_in, fc_out + batch-norm stats); the blocks ran
with *random weights fixed by seed_all(2021)* at construction time. To
reproduce the trained model's function exactly, this importer
  1. maps the 19 saved tensors into the flax PointCloudAE params
     (torch Linear weight (out, in) -> flax Dense kernel (in, out)), and
  2. replays torch's parameter-init RNG sequence (manual_seed(2021), module
     construction order of PointCloud_AE — shape_pointcloud_modelAE.py:
     105-119, 207-229, 21-60) to regenerate the unregistered block weights.

Requires torch (CPU) only for loading/replay; the result is pure numpy/flax.
"""
from __future__ import annotations

import sys
import types
from typing import Dict

import numpy as np


def _install_easydict_stub() -> None:
    if "easydict" in sys.modules:
        return
    m = types.ModuleType("easydict")

    class EasyDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    m.EasyDict = EasyDict
    sys.modules["easydict"] = m


def load_torch_checkpoint(path: str) -> Dict:
    _install_easydict_stub()
    import torch
    return torch.load(path, map_location="cpu", weights_only=False)


def _replay_init_weights(seed: int = 2021,
                         hidden: int = 128, latent: int = 32,
                         layer_num: int = 4):
    """Re-create every Linear of the reference PointCloud_AE in construction
    order under torch.manual_seed(seed); returns {name: np.ndarray}."""
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    out: Dict[str, np.ndarray] = {}

    def lin(name, i, o, bias):
        layer = nn.Linear(i, o, bias=bias)
        out[name + ".weight"] = layer.weight.detach().numpy().copy()
        if bias:
            out[name + ".bias"] = layer.bias.detach().numpy().copy()

    # VN_DGCNN_Encoder construction order (conv_pos, 4 blocks, conv_c)
    lin("encoder.conv_pos.map_to_feat", 2, hidden, False)
    lin("encoder.conv_pos.map_to_dir", 2, hidden, False)
    for i in range(layer_num):
        lin(f"encoder.blocks.{i}.map_to_feat", 2 * hidden, hidden, False)
        lin(f"encoder.blocks.{i}.map_to_dir", 2 * hidden, hidden, False)
    lin("encoder.conv_c.map_to_feat", layer_num * hidden, latent, False)
    lin("encoder.conv_c.map_to_dir", layer_num * hidden, 1, False)
    # DecoderInner construction order (z_in, fc_in, 4 ResnetBlockFC, fc_out)
    lin("generator.z_in.map_to_feat", latent, latent, False)
    lin("generator.fc_in", 2 * latent + 1, hidden, True)
    for i in range(layer_num):
        lin(f"generator.blocks.{i}.fc_0", hidden, hidden, True)
        lin(f"generator.blocks.{i}.fc_1", hidden, hidden, True)
        out[f"generator.blocks.{i}.fc_1.weight"] *= 0.0   # nn.init.zeros_
    lin("generator.fc_out", hidden, 1, True)
    return out


def _vnl(params, bstats, torch_sd, prefix_t, prefix_f, use_bn=True):
    """Map one VNLinearLeakyReLU (torch) -> flax."""
    params[prefix_f] = {
        "map_to_feat": {"kernel": np.ascontiguousarray(
            torch_sd[prefix_t + ".map_to_feat.weight"].T.astype(np.float32))},
        "map_to_dir": {"kernel": np.ascontiguousarray(
            torch_sd[prefix_t + ".map_to_dir.weight"].T.astype(np.float32))},
    }
    if use_bn:
        bn = prefix_t + ".batchnorm.bn"
        if bn + ".weight" in torch_sd:
            params[prefix_f]["batchnorm"] = {
                "scale": torch_sd[bn + ".weight"].astype(np.float32),
                "bias": torch_sd[bn + ".bias"].astype(np.float32)}
            bstats[prefix_f] = {"batchnorm": {
                "mean": torch_sd[bn + ".running_mean"].astype(np.float32),
                "var": torch_sd[bn + ".running_var"].astype(np.float32)}}
        else:
            # unregistered block: fresh batch-norm (weight=1, bias=0,
            # stats=0/1) — exactly what the reference ran with
            n = params[prefix_f]["map_to_feat"]["kernel"].shape[1]
            params[prefix_f]["batchnorm"] = {
                "scale": np.ones(n, np.float32),
                "bias": np.zeros(n, np.float32)}
            bstats[prefix_f] = {"batchnorm": {
                "mean": np.zeros(n, np.float32),
                "var": np.ones(n, np.float32)}}


def se_model_to_flax(ckpt: Dict, reproduce_blocks: bool = True,
                     seed: int = 2021):
    """se_model.pt checkpoint dict -> (ShapeAEConfig, flax variables)."""
    from shapemol_tpu.models.shape_ae import ShapeAEConfig

    mcfg = ckpt["config"]["model"]
    cfg = ShapeAEConfig(
        encoder=mcfg.get("encoder", "VN_DGCNN"),
        hidden_dim=int(mcfg.get("hidden_dim", 128)),
        latent_dim=int(mcfg.get("latent_dim", 32)),
        layer_num=int(mcfg.get("layer_num", 4)),
        num_k=int(mcfg.get("num_k", 20)),
        loss_type=mcfg.get("loss_type", "signed_distance"))

    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in ckpt["model"].items()}
    if reproduce_blocks:
        replay = _replay_init_weights(seed, cfg.hidden_dim, cfg.latent_dim,
                                      cfg.layer_num)
        for k, v in replay.items():
            sd.setdefault(k, v)

    enc_p, enc_b = {}, {}
    _vnl(enc_p, enc_b, sd, "encoder.conv_pos", "conv_pos")
    for i in range(cfg.layer_num):
        _vnl(enc_p, enc_b, sd, f"encoder.blocks.{i}", f"block_{i}")
    _vnl(enc_p, enc_b, sd, "encoder.conv_c", "conv_c")

    gen_p = {
        "z_in": {"map_to_feat": {"kernel": np.ascontiguousarray(
            sd["generator.z_in.map_to_feat.weight"].T.astype(np.float32))}},
        "fc_in": {"kernel": np.ascontiguousarray(
            sd["generator.fc_in.weight"].T.astype(np.float32)),
            "bias": sd["generator.fc_in.bias"].astype(np.float32)},
        "fc_out": {"kernel": np.ascontiguousarray(
            sd["generator.fc_out.weight"].T.astype(np.float32)),
            "bias": sd["generator.fc_out.bias"].astype(np.float32)},
    }
    for i in range(cfg.layer_num):
        gen_p[f"block_{i}"] = {
            "fc_0": {"kernel": np.ascontiguousarray(
                sd[f"generator.blocks.{i}.fc_0.weight"].T.astype(np.float32)),
                "bias": sd[f"generator.blocks.{i}.fc_0.bias"].astype(np.float32)},
            "fc_1": {"kernel": np.ascontiguousarray(
                sd[f"generator.blocks.{i}.fc_1.weight"].T.astype(np.float32)),
                "bias": sd[f"generator.blocks.{i}.fc_1.bias"].astype(np.float32)},
        }

    variables = {"params": {"encoder": enc_p, "generator": gen_p},
                 "batch_stats": {"encoder": enc_b}}
    return cfg, variables


def load_se_model(path: str, reproduce_blocks: bool = True):
    """One-call loader: path -> (PointCloudAE, variables)."""
    import jax.numpy as jnp
    from shapemol_tpu.models.shape_ae import PointCloudAE

    ckpt = load_torch_checkpoint(path)
    cfg, variables = se_model_to_flax(ckpt, reproduce_blocks)
    variables = {c: {k: _to_jnp(v) for k, v in sub.items()}
                 for c, sub in variables.items()}
    return PointCloudAE(cfg), variables


def _to_jnp(tree):
    import jax.numpy as jnp
    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)
