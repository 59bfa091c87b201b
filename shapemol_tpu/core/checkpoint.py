"""Checkpointing with Orbax: the same logical payload the reference saves
({config, model, optimizer/scheduler state, iteration} —
scripts/train_diffusion.py:234-241) as a pytree checkpoint, plus best-ckpt
bookkeeping and resume.

The reference keeps torch .pt dicts; here the model/optimizer live in one
TrainState pytree, LR-scheduler state is a small dict, and the config rides
along as metadata."""
from __future__ import annotations

import json
import os
from typing import Dict, Optional

import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, step: int, state, config: Optional[Dict] = None,
                    scheduler_state: Optional[Dict] = None,
                    keep: int = 3) -> str:
    """Save a TrainState (+config/scheduler metadata) at `step`."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"step_{step}")
    import jax
    if jax.process_count() > 1:
        # multi-host: orbax's multihost semantics (primary-host writes +
        # cross-host barriers) don't fit per-process log dirs, so each
        # process serializes its own host-local copy as a flat npz — no
        # coordination, identical logical payload (params are replicated)
        import numpy as _np
        state = jax.device_get(state)
        leaves = jax.tree_util.tree_leaves(state)
        os.makedirs(path, exist_ok=True)
        _np.savez(os.path.join(path, "state_local.npz"),
                  **{f"leaf_{i}": l for i, l in enumerate(leaves)})
    else:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.join(path, "state"), state, force=True)
    meta = {"step": step}
    if config is not None:
        meta["config"] = config
    if scheduler_state is not None:
        meta["scheduler"] = scheduler_state
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, default=str)
    _prune_old(ckpt_dir, keep)
    return path


def _prune_old(ckpt_dir: str, keep: int) -> None:
    steps = sorted(
        (int(d.split("_")[1]), d) for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and d.split("_")[1].isdigit())
    for _, d in steps[:-keep] if keep > 0 else []:
        import shutil
        shutil.rmtree(os.path.join(ckpt_dir, d), ignore_errors=True)


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
             if d.startswith("step_") and d.split("_")[1].isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, target, step: Optional[int] = None):
    """Restore a TrainState pytree (shape/dtype template = `target`).
    Returns (state, meta)."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    local_npz = os.path.join(path, "state_local.npz")
    if os.path.exists(local_npz):
        # per-process flat npz written under the multi-host runtime
        import jax
        import numpy as _np
        with _np.load(local_npz) as z:
            leaves = [z[f"leaf_{i}"] for i in range(len(z.files))]
        if target is None:
            state = leaves
        else:
            treedef = jax.tree_util.tree_structure(target)
            state = jax.tree_util.tree_unflatten(treedef, leaves)
    else:
        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(os.path.join(path, "state"), target)
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta
