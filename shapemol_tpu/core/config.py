"""Config system: YAML files with attribute access + typed builders for the
model configs.

Functional parity target: utils/misc.py:22-24 (load_config -> EasyDict).
Kept the YAML surface (the reference's config/ files load unchanged modulo
paths) but with an explicit recursive AttrDict and typed conversion into the
framework's frozen dataclass configs. The reference's YAML `None` -> string
'None' quirk (SURVEY Q4) is normalized to real None here."""
from __future__ import annotations

from typing import Any, Dict

import yaml


class AttrDict(dict):
    """Recursive attribute-access dict."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    @classmethod
    def convert(cls, obj):
        if isinstance(obj, dict):
            return cls({k: cls.convert(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [cls.convert(v) for v in obj]
        if obj == "None":
            return None
        return obj

    def get_path(self, path: str, default=None):
        cur = self
        for part in path.split("."):
            if not isinstance(cur, dict) or part not in cur:
                return default
            cur = cur[part]
        return cur


def load_config(path: str) -> AttrDict:
    with open(path) as f:
        return AttrDict.convert(yaml.safe_load(f))


def dump_config(cfg: Dict[str, Any], path: str) -> None:
    def plain(o):
        if isinstance(o, dict):
            return {k: plain(v) for k, v in o.items()}
        if isinstance(o, list):
            return [plain(v) for v in o]
        return o
    with open(path, "w") as f:
        yaml.safe_dump(plain(cfg), f, sort_keys=False)


def build_score_model_config(model_cfg: AttrDict, num_classes: int):
    """YAML model section -> ScoreModelConfig (+DenoiserConfig)."""
    from shapemol_tpu.models.denoiser import DenoiserConfig
    from shapemol_tpu.models.score_model import ScoreModelConfig

    g = model_cfg.get
    den = DenoiserConfig(
        num_blocks=g("num_blocks", 1),
        num_layers=g("num_layers", 8),
        hidden_dim=g("hidden_dim", 128),
        n_heads=g("n_heads", 16),
        knn=g("knn", 8),
        num_r_gaussian=g("num_r_gaussian", 20),
        edge_feat_dim=g("edge_feat_dim", 0),
        num_node_types=g("num_node_types", 8),
        act_fn=g("act_fn", "relu"),
        norm=g("norm", True),
        cutoff_mode=g("cutoff_mode", "knn"),
        ew_net_type=g("ew_net_type", "global"),
        num_x2h=g("num_x2h", 1),
        num_h2x=g("num_h2x", 1),
        r_max=g("r_max", 10.0),
        x2h_out_fc=g("x2h_out_fc", False),
        sync_twoup=g("sync_twoup", False),
        shape_dim=g("shape_dim", 32),
        shape_latent_dim=g("shape_latent_dim", 32),
        topo_emb_type=g("topo_emb_type", None) or "none",
        num_topo=g("num_topo", 1),
        atom_enc_mode=g("atom_enc_mode", "add_aromatic"),
        dtype=g("dtype", "float32"),
    )
    return ScoreModelConfig(
        num_diffusion_timesteps=g("num_diffusion_timesteps", 1000),
        schedule_pos=dict(model_cfg.get("schedule_pos", {}) or
                          dict(beta_schedule="sigmoid", beta_start=1e-7,
                               beta_end=0.01, s=6)),
        schedule_v=dict(model_cfg.get("schedule_v", {}) or
                        dict(beta_schedule="cosine", s=0.01)),
        v_mode=g("v_mode", "uniform"),
        loss_v_weight=g("loss_v_weight", 100.0),
        loss_weight_type=g("loss_weight_type", "noise_level"),
        loss_geom_weight=g("loss_geom_weight", 0.0),
        geom_weight_mode=g("geom_weight_mode", "alpha_bar"),
        loss_pos_min_weight=g("loss_pos_min_weight", 0.0),
        loss_pos_max_weight=g("loss_pos_max_weight", 10.0),
        sample_time_method=g("sample_time_method", "symmetric"),
        center_pos_mode=g("center_pos_mode", "none"),
        cond_mask_prob=g("cond_mask_prob", 0.0),
        num_classes=num_classes,
        time_emb_dim=g("time_emb_dim", 8),
        hidden_dim=g("hidden_dim", 128),
        v_net_type=g("v_net_type", "mlp"),
        denoiser=den,
    )


def build_shape_ae_config(model_cfg: AttrDict):
    from shapemol_tpu.models.shape_ae import ShapeAEConfig
    g = model_cfg.get
    return ShapeAEConfig(
        encoder=g("encoder", "VN_DGCNN"),
        hidden_dim=g("hidden_dim", 128),
        latent_dim=g("latent_dim", 32),
        point_dim=g("point_dim", 3),
        layer_num=g("layer_num", 4),
        num_k=g("num_k", 20),
        loss_type=g("loss_type", "signed_distance"),
    )
