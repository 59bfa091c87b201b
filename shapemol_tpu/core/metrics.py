"""Training-metrics emission: JSONL (machine-readable, always) +
TensorBoard event files (when tensorboard is installed).

Functional parity target: the reference's SummaryWriter scalar surface —
train/loss, train/loss_pos, train/loss_v, train/lr, train/grad_norm
(scripts/train_diffusion.py:155-166), val/loss + val/atom_auroc (217-220),
and the stage-1 equivalents (scripts/train_shapeAE.py:109-122,138-141).

The JSONL stream (`metrics.jsonl`: one {"step", "tag", "value"} object per
line) is the source of truth — greppable, plottable, and diffable without
TensorFlow; the TB events are a convenience view of the same scalars."""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a",
                           buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=os.path.join(log_dir, "tb"))
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._jsonl.write(json.dumps(
            {"step": int(step), "tag": tag, "value": float(value),
             "time": time.time()}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def scalars(self, values: Dict[str, float], step: int,
                prefix: str = "") -> None:
        for k, v in values.items():
            if v is None:
                continue
            try:
                self.scalar(prefix + k, float(v), step)
            except (TypeError, ValueError):
                pass

    def flush(self) -> None:
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def read_metrics(log_dir: str):
    """Load metrics.jsonl back as {tag: [(step, value), ...]}."""
    out: Dict[str, list] = {}
    path = os.path.join(log_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            out.setdefault(d["tag"], []).append((d["step"], d["value"]))
    return out
