"""Training state, optimizer factory and LR schedulers.

Functional parity targets (reference file:line):
  * get_optimizer  — utils/train.py:54-64 (adam, betas=(0.95, 0.999))
  * get_scheduler  — utils/train.py:66-88 (plateau / expmin / expmin_milestone)
  * ExponentialLR_with_minLr — utils/train.py:9-41
  * grad clipping  — scripts/train_*.py (max_grad_norm 8.0)

The plateau scheduler is host-side state (it reacts to validation loss), so
it lives outside the jitted step and feeds the LR in as a scalar — the
optimizer is optax.inject_hyperparams(adam) so the LR is a runtime input,
not a retrace trigger.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None

    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def make_optimizer(lr: float = 1e-3, beta1: float = 0.95,
                   beta2: float = 0.999, weight_decay: float = 0.0,
                   max_grad_norm: float = 8.0) -> optax.GradientTransformation:
    """Adam with the reference's betas + global-norm clipping, with LR
    injected as a runtime hyperparameter so host-side schedulers can drive
    it without recompiling."""
    opt = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            (optax.adamw(learning_rate, b1=beta1, b2=beta2,
                         weight_decay=weight_decay)
             if weight_decay > 0 else
             optax.adam(learning_rate, b1=beta1, b2=beta2)),
        ))(learning_rate=lr)
    return opt


def create_train_state(params, batch_stats, tx: optax.GradientTransformation,
                       ema: bool = False) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema else None,
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Update the injected LR hyperparameter in-place (host side)."""
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state)


def get_learning_rate(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


# --------------------------------------------------------------------------
# Host-side LR schedulers
# --------------------------------------------------------------------------

@dataclasses.dataclass
class PlateauScheduler:
    """ReduceLROnPlateau with min-lr floor (reference config: factor 0.6,
    patience 10, min_lr 1e-5 — torch.optim.lr_scheduler.ReduceLROnPlateau
    semantics: relative threshold 1e-4, 'min' mode)."""
    factor: float = 0.6
    patience: int = 10
    min_lr: float = 1e-5
    threshold: float = 1e-4
    best: float = float("inf")
    num_bad: int = 0

    def step(self, metric: float, lr: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.num_bad = 0
            return max(lr * self.factor, self.min_lr)
        return lr


@dataclasses.dataclass
class ExpMinScheduler:
    """Exponential decay to a floor: lr(e) = max(lr0 * gamma^e, min_lr),
    mirroring ExponentialLR_with_minLr (utils/train.py:9-41)."""
    gamma: float = 0.95
    min_lr: float = 1e-6
    lr0: float = 1e-3
    epoch: int = 0
    milestone: int = 0      # expmin_milestone: decay only past the milestone

    def step(self, metric: float = 0.0, lr: float = 0.0) -> float:
        self.epoch += 1
        e = max(self.epoch - self.milestone, 0)
        return max(self.lr0 * self.gamma ** e, self.min_lr)


def get_scheduler(kind: str, **kw):
    """plateau | expmin | expmin_milestone (reference utils/train.py:66-88)."""
    if kind == "plateau":
        return PlateauScheduler(factor=kw.get("factor", 0.6),
                                patience=kw.get("patience", 10),
                                min_lr=kw.get("min_lr", 1e-5))
    if kind == "expmin":
        return ExpMinScheduler(gamma=kw.get("factor", 0.95),
                               min_lr=kw.get("min_lr", 1e-6),
                               lr0=kw.get("lr", 1e-3))
    if kind == "expmin_milestone":
        return ExpMinScheduler(gamma=kw.get("factor", 0.95),
                               min_lr=kw.get("min_lr", 1e-6),
                               lr0=kw.get("lr", 1e-3),
                               milestone=kw.get("milestone", 0))
    raise NotImplementedError(f"Scheduler not supported: {kind}")


def ema_update(ema_params, params, decay: float = 0.999):
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)
