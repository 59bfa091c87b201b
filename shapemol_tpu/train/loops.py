"""Jitted, mesh-sharded train/eval steps for both stages.

TPU-native replacement for the reference's train loops
(scripts/train_diffusion.py:135-221, scripts/train_shapeAE.py:95-141):
the step is one jit'd function with batch arrays sharded over the data axis
and parameters replicated; XLA inserts the gradient all-reduce over ICI.
Gradient accumulation (reference n_acc_batch) becomes an extra leading axis
folded by lax.scan inside the same jit.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shapemol_tpu.models import diffusion as dfn
from shapemol_tpu.models.score_model import (ShapeDiffusionNet,
                                             diffusion_loss)
from shapemol_tpu.models.shape_ae import (PointCloudAE, shape_ae_val_metrics)
from shapemol_tpu.parallel.mesh import DATA_AXIS
from shapemol_tpu.train.train_state import TrainState, ema_update


def make_diffusion_train_step(net: ShapeDiffusionNet,
                              sched: dfn.DiffusionSchedule,
                              tx: optax.GradientTransformation,
                              mesh: Optional[Mesh] = None,
                              ema_decay: Optional[float] = None,
                              n_acc: int = 1):
    """Returns step(state, rng, batch) -> (state, metrics), jitted and (if a
    mesh is given) sharded: batch over 'dp', state replicated.

    n_acc > 1 enables gradient accumulation (reference n_acc_batch,
    scripts/train_diffusion.py:138-151): the batch's leading axis must be
    n_acc * micro_batch; micro-batches are folded by lax.scan inside the
    same jit and gradients averaged before the optimizer update."""

    def loss_and_grads(params, batch_stats, rng, batch):
        def loss_fn(p):
            variables = {"params": p}
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats
            loss, aux = diffusion_loss(
                net, sched, variables, rng, batch["pos"], batch["v"],
                batch["node_mask"], batch["shape_emb"], train=True)
            return loss, aux
        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def step(state: TrainState, rng, batch):
        if n_acc <= 1:
            (loss, aux), grads = loss_and_grads(state.params,
                                                state.batch_stats, rng,
                                                batch)
            loss_pos, loss_v = aux["loss_pos"], aux["loss_v"]
            new_bs = aux["updates"].get("batch_stats", state.batch_stats)
        else:
            micro = {k: v.reshape(n_acc, v.shape[0] // n_acc, *v.shape[1:])
                     for k, v in batch.items()}

            def acc_body(carry, mb):
                grads_acc, l_acc, lp_acc, lv_acc, bs, r = carry
                r, sub = jax.random.split(r)
                (loss, aux), grads = loss_and_grads(state.params, bs, sub,
                                                    mb)
                bs = aux["updates"].get("batch_stats", bs)
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc,
                                                   grads)
                return (grads_acc, l_acc + loss, lp_acc + aux["loss_pos"],
                        lv_acc + aux["loss_v"], bs, r), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, loss, loss_pos, loss_v, new_bs, _), _ = jax.lax.scan(
                acc_body,
                (zero_grads, 0.0, 0.0, 0.0, state.batch_stats, rng), micro)
            grads = jax.tree_util.tree_map(lambda g: g / n_acc, grads)
            loss, loss_pos, loss_v = (loss / n_acc, loss_pos / n_acc,
                                      loss_v / n_acc)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None and ema_decay is not None:
            ema = ema_update(ema, params, ema_decay)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_bs, opt_state=opt_state,
                                  ema_params=ema)
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss, "loss_pos": loss_pos,
                   "loss_v": loss_v, "grad_norm": gnorm}
        if n_acc <= 1 and "loss_geom" in aux:
            metrics["loss_geom"] = aux["loss_geom"]
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        step,
        in_shardings=(repl, repl,
                      {"pos": data, "v": data, "node_mask": data,
                       "shape_emb": data}),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_diffusion_train_step_multi(net: ShapeDiffusionNet,
                                    sched: dfn.DiffusionSchedule,
                                    tx: optax.GradientTransformation,
                                    n_steps: int,
                                    ema_decay: Optional[float] = None):
    """K full optimizer updates per dispatch: lax.scan over a (K, B, ...)
    stack of batches inside ONE jit call.

    Latency shaping for a remote-dispatched chip (the axon tunnel pays
    ~20 ms of host+RPC per execute; the b32 device step itself is ~7 ms):
    scanning K steps amortizes the round trip K-fold, taking the train
    loop from dispatch-bound to device-bound. Semantics are identical to
    K sequential calls of the single step: the injected LR is constant
    between host scheduler updates, so callers must align K with
    val_freq (cli/train_diffusion.py rounds K down to a common divisor
    of val_freq and the log period). Returned metrics are the LAST
    step's, matching what a caller polling every 100 iters would see.

    The inner update duplicates make_diffusion_train_step's n_acc=1 body
    (single-host, no grad accumulation — the only configuration the
    latency problem applies to); keep the two in lockstep."""

    def loss_and_grads(params, batch_stats, rng, batch):
        def loss_fn(p):
            variables = {"params": p}
            if batch_stats is not None:
                variables["batch_stats"] = batch_stats
            loss, aux = diffusion_loss(
                net, sched, variables, rng, batch["pos"], batch["v"],
                batch["node_mask"], batch["shape_emb"], train=True)
            return loss, aux
        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def one(state: TrainState, rng, batch):
        (loss, aux), grads = loss_and_grads(state.params, state.batch_stats,
                                            rng, batch)
        new_bs = aux["updates"].get("batch_stats", state.batch_stats)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None and ema_decay is not None:
            ema = ema_update(ema, params, ema_decay)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_bs, opt_state=opt_state,
                                  ema_params=ema)
        metrics = {"loss": loss, "loss_pos": aux["loss_pos"],
                   "loss_v": aux["loss_v"],
                   "grad_norm": optax.global_norm(grads)}
        if "loss_geom" in aux:
            metrics["loss_geom"] = aux["loss_geom"]
        return new_state, metrics

    def multi(state: TrainState, rng, batches):
        rngs = jax.random.split(rng, n_steps)

        def body(s, xs):
            r, b = xs
            return one(s, r, b)

        state, ms = jax.lax.scan(body, state, (rngs, batches))
        return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

    return jax.jit(multi, donate_argnums=(0,))


def make_diffusion_eval_step(net: ShapeDiffusionNet,
                             sched: dfn.DiffusionSchedule,
                             mesh: Optional[Mesh] = None):
    """Validation step at fixed timesteps (the reference sweeps 10 fixed
    timesteps per batch — scripts/train_diffusion.py:178)."""

    def step(state: TrainState, rng, batch, t):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        # t is a traced scalar (int32 array) — one compile serves every
        # validation timestep
        t_vec = jnp.full((batch["pos"].shape[0],), t, jnp.int32)
        loss, aux = diffusion_loss(
            net, sched, variables, rng, batch["pos"], batch["v"],
            batch["node_mask"], batch["shape_emb"], t=t_vec, train=False)
        return {"loss": loss, "loss_pos": aux["loss_pos"],
                "loss_v": aux["loss_v"],
                "pred_ligand_v": aux["pred_ligand_v"]}

    return jax.jit(step)


def make_shape_ae_train_step(model: PointCloudAE,
                             tx: optax.GradientTransformation,
                             mesh: Optional[Mesh] = None):
    """Stage-1 train step: MSE on signed distance / occupancy."""

    def step(state: TrainState, batch):
        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["point_cloud"], batch["query_points"], train=True,
                mutable=["batch_stats"])
            _, pred = out
            loss = jnp.mean((pred - batch["values"]) ** 2)
            return loss, updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        upd, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, upd)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=updates["batch_stats"],
                                  opt_state=opt_state)
        return new_state, {"loss": loss,
                           "grad_norm": optax.global_norm(grads)}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(step,
                   in_shardings=(repl, {"point_cloud": data,
                                        "query_points": data,
                                        "values": data}),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,))


def make_shape_ae_eval_step(model: PointCloudAE):
    def step(state: TrainState, batch):
        _, pred = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["point_cloud"], batch["query_points"], train=False)
        return shape_ae_val_metrics(pred, batch["values"])
    return jax.jit(step)


def make_voxel_ae_train_step(model, tx: optax.GradientTransformation,
                             mesh: Optional[Mesh] = None):
    """Voxel-AE train step: MSE on occupancy at sampled grid cells
    (reference models/shape_modelAE.py:115-128 via train_shapeAE.py)."""

    def step(state: TrainState, batch):
        def loss_fn(params):
            _, pred = model.apply({"params": params}, batch["voxel"],
                                  batch["points"])
            return jnp.mean((pred - batch["values"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        upd, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, upd)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        return new_state, {"loss": loss,
                           "grad_norm": optax.global_norm(grads)}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(step,
                   in_shardings=(repl, {"voxel": data, "points": data,
                                        "values": data}),
                   out_shardings=(repl, repl), donate_argnums=(0,))


def make_voxel_ae_eval_step(model):
    """Loss + occupancy accuracy/recall at 0.5 (reference
    models/shape_modelAE.py:130-141 semantics)."""
    def step(state: TrainState, batch):
        _, pred = model.apply({"params": state.params}, batch["voxel"],
                              batch["points"])
        loss = jnp.mean((pred - batch["values"]) ** 2)
        hit = (pred > 0.5) == (batch["values"] > 0.5)
        acc = jnp.mean(hit.astype(jnp.float32))
        pos_mask = batch["values"] > 0.5
        recall = (jnp.sum((pred > 0.5) & pos_mask)
                  / jnp.maximum(jnp.sum(pos_mask), 1))
        return loss, acc, recall
    return jax.jit(step)
