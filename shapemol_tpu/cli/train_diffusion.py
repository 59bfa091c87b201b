"""Stage-2 training CLI: the shape-conditioned diffusion model.

Usage:
  python -m shapemol_tpu.cli.train_diffusion configs/training/diffusion.yml \
      [--logdir logs] [--max_iters N] [--synthetic N] [--shape_ckpt dir]

Functional parity target: scripts/train_diffusion.py (config surface,
transforms, gradient clip, val sweep over 10 fixed timesteps + atom-type
AUROC, plateau scheduler on val loss, best-ckpt save, resume).
TPU-native: bucketed padded batches on a data-parallel mesh; shape
embeddings precomputed with the jitted stage-1 encoder.
"""
from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from shapemol_tpu.chem import vocab
from shapemol_tpu.core import misc
from shapemol_tpu.core.checkpoint import (restore_checkpoint, save_checkpoint,
                                          latest_step)
from shapemol_tpu.core.config import load_config, build_score_model_config
from shapemol_tpu.data.batching import BucketBatcher, split_moses2
from shapemol_tpu.data.packs import PackDataset
from shapemol_tpu.models.score_model import ShapeDiffusionNet
from shapemol_tpu.parallel.mesh import make_mesh
from shapemol_tpu.train.loops import (make_diffusion_eval_step,
                                      make_diffusion_train_step,
                                      make_diffusion_train_step_multi)
from shapemol_tpu.train.train_state import (create_train_state, get_scheduler,
                                            get_learning_rate, make_optimizer,
                                            set_learning_rate)


def atom_type_auroc(pred_logits, true_v, node_mask, num_classes):
    """One-vs-rest macro AUROC over valid atoms
    (reference scripts/train_diffusion.py:27-41)."""
    from sklearn.metrics import roc_auc_score
    m = np.asarray(node_mask).reshape(-1)
    probs = jax.nn.softmax(jnp.asarray(pred_logits), -1)
    probs = np.asarray(probs).reshape(-1, probs.shape[-1])[m]
    true = np.asarray(true_v).reshape(-1)[m]
    present = [c for c in range(num_classes) if (true == c).any()]
    if len(present) < 2:
        return float("nan")
    onehot = np.eye(num_classes)[true][:, present]
    return float(roc_auc_score(onehot, probs[:, present], average="macro"))


def build_dataset(cfg, args, logger):
    pack_pattern = cfg.data.get("pack_pattern") or os.path.join(
        cfg.data.get("processed_path", "./processed_data"),
        f"shapemol_{cfg.data.get('version', 'v1')}.*.npz")
    # comma-joined multi-corpus patterns (PackDataset semantics): every
    # part must resolve, else preprocessing would be triggered spuriously
    # and write shards to a prefix derived from the mangled joined string
    parts = [p.strip() for p in pack_pattern.split(",") if p.strip()]
    if not all(glob.glob(p) if "*" in p else os.path.exists(p)
               for p in parts):
        if len(parts) > 1:
            missing = [p for p in parts
                       if not (glob.glob(p) if "*" in p else os.path.exists(p))]
            raise SystemExit(
                f"multi-corpus pack_pattern has unresolved parts {missing}; "
                "build each pack first (cli.ingest_reference / "
                "tools/make_distill_pack.py) — auto-preprocessing only "
                "supports a single-pattern corpus")
        if args.synthetic:
            from shapemol_tpu.data.synthetic import random_dataset
            mols = random_dataset(args.synthetic, seed=2021)
        elif str(cfg.data.path).endswith(".pkl"):
            # pickled RDKit molecules (the reference's dataset format) via
            # the torch-free binary-Mol reader
            from shapemol_tpu.compat.rdkit_unpickle import load_rdkit_mol_pickle
            mols = load_rdkit_mol_pickle(cfg.data.path)
        else:
            from shapemol_tpu.chem.sdf import read_sdf
            mols = read_sdf(cfg.data.path)
        logger.info(f"preprocessing {len(mols)} molecules")
        encoder_fn = None
        shape_ckpt = args.shape_ckpt or cfg.data.get_path("shape.checkpoint")
        if shape_ckpt and os.path.exists(str(shape_ckpt)):
            encoder_fn = load_shape_encoder(shape_ckpt, logger)
        else:
            logger.warning("no stage-1 checkpoint — using a randomly "
                           "initialized frozen encoder for shape embeddings")
            encoder_fn = random_shape_encoder(cfg)
        from shapemol_tpu.data.preprocess import preprocess_molecules
        preprocess_molecules(
            mols, pack_pattern.replace(".*.npz", ""),
            encoder_fn=encoder_fn,
            atom_mode=cfg.data.get_path("transform.ligand_atom_mode",
                                        "add_aromatic"),
            point_cloud_samples=cfg.data.get_path("shape.point_cloud_samples",
                                                  512),
            keep_cloud=bool(getattr(args, "keep_cloud", False)),
            num_workers=args.num_workers)
    return PackDataset(pack_pattern)


def random_shape_encoder(cfg, latent_dim: int = 32):
    import jax
    from shapemol_tpu.models.shape_ae import PointCloudAE, ShapeAEConfig
    ae = PointCloudAE(ShapeAEConfig(latent_dim=latent_dim))
    P = cfg.data.get_path("shape.point_cloud_samples", 512)
    variables = ae.init(jax.random.PRNGKey(2021),
                        jnp.zeros((1, P, 3)), jnp.zeros((1, 8, 3)))

    @jax.jit
    def encode(clouds):
        return ae.apply(variables, clouds, method=ae.encode)
    return encode


def load_shape_encoder(ckpt_path: str, logger):
    """Load a stage-1 checkpoint (orbax dir from train_shape_ae, or a torch
    se_model.pt via the compat importer)."""
    from shapemol_tpu.models.shape_ae import PointCloudAE, ShapeAEConfig
    if str(ckpt_path).endswith(".pt"):
        from shapemol_tpu.compat.torch_import import load_se_model
        model, variables = load_se_model(ckpt_path)
    else:
        from shapemol_tpu.core.config import build_shape_ae_config, AttrDict
        import json
        step = latest_step(ckpt_path)
        with open(os.path.join(ckpt_path, f"step_{step}", "meta.json")) as f:
            meta = json.load(f)
        mcfg = build_shape_ae_config(AttrDict.convert(meta["config"]["model"]))
        model = PointCloudAE(mcfg)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 512, 3)), jnp.zeros((1, 8, 3)))
        from shapemol_tpu.train.train_state import (create_train_state,
                                                    make_optimizer)
        template = create_train_state(variables["params"],
                                      variables.get("batch_stats"),
                                      make_optimizer())
        state, _ = restore_checkpoint(ckpt_path, template, step)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
    logger.info(f"loaded stage-1 encoder from {ckpt_path}")

    @jax.jit
    def encode(clouds):
        return model.apply(variables, clouds, method=model.encode)
    return encode


def main():
    misc.enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--logdir", default="./logs")
    p.add_argument("--tag", default="")
    p.add_argument("--max_iters", type=int, default=None)
    p.add_argument("--val_freq", type=int, default=None)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--num_workers", type=int, default=0)
    p.add_argument("--shape_ckpt", default=None)
    p.add_argument("--resume", default=None,
                   help="checkpoint dir to resume from")
    p.add_argument("--mesh", type=int, default=0,
                   help="data-parallel mesh size (0 = all devices)")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address host:port "
                        "(or env JAX_COORDINATOR_ADDRESS)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--keep_cloud", action="store_true",
                   help="store the surface point clouds in the packs "
                        "(needed for point-cloud guidance at sampling time)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of train iterations "
                        "200-210 into <logdir>/profile")
    p.add_argument("--steps_per_call", type=int, default=0,
                   help="optimizer updates per device dispatch (lax.scan "
                        "inside one jit — amortizes the remote-dispatch "
                        "round trip). 0 = auto (20 on single-host/no-acc "
                        "runs, rounded to divide val_freq and the log "
                        "period); 1 disables")
    args = p.parse_args()

    cfg = load_config(args.config)
    misc.seed_all(cfg.train.seed)

    # multi-host runtime: join the distributed coordinator BEFORE any device
    # query; the mesh below spans the GLOBAL device set
    from shapemol_tpu.parallel import distributed as dist
    is_dist = dist.initialize(args.coordinator, args.num_processes,
                              args.process_id)
    pid, pcount = dist.process_shard()

    log_dir = misc.get_new_log_dir(args.logdir, prefix="diffusion",
                                   tag=(args.tag + (f"p{pid}" if is_dist
                                                    else "")))
    logger = misc.get_logger("train_diffusion", log_dir)
    logger.info(f"process {pid}/{pcount}, devices: {jax.devices()}")
    from shapemol_tpu.core.metrics import MetricsWriter
    mw = MetricsWriter(log_dir)

    dataset = build_dataset(cfg, args, logger)
    atom_mode = cfg.data.get_path("transform.ligand_atom_mode", "add_aromatic")
    num_classes = vocab.feature_dim(atom_mode)
    split = split_moses2(len(dataset))
    logger.info(f"dataset: {len(dataset)} molecules, "
                f"{len(split['train'])} train / {len(split['val'])} val")

    model_cfg = build_score_model_config(cfg.model, num_classes)
    net = ShapeDiffusionNet(model_cfg)
    dsched = model_cfg.make_schedule()

    n_acc = int(cfg.train.get("n_acc_batch", 1))
    # importance-weighted corpus mixing: when a comma-glob joins a small
    # real pack with a large self-distillation pack, data.real_mix keeps
    # the real corpus at a fixed expected share of every batch instead of
    # letting it be drowned at the corpus-size ratio
    sample_weights = None
    mix = cfg.data.get("real_mix", None)
    if mix:
        real_idx = dataset.indices_from(str(mix["pattern"]))
        frac = float(mix["fraction"])
        n_real, n_syn = len(real_idx), len(dataset) - len(real_idx)
        if not (0.0 < frac < 1.0) or n_real == 0 or n_syn == 0:
            raise SystemExit(
                f"data.real_mix: fraction must be in (0,1) and pattern "
                f"{mix['pattern']!r} must split the dataset (matched "
                f"{n_real} of {len(dataset)})")
        sample_weights = np.ones(len(dataset), dtype=np.float64)
        sample_weights[real_idx] = (frac / (1.0 - frac)) * (n_syn / n_real)
        logger.info(f"corpus mixing: {n_real} real molecules weighted to "
                    f"{frac:.0%} of every batch ({n_syn} synthetic)")
    # per-host loading: every process follows the same rng stream (same
    # bucket -> same static shapes) but gathers only its own slice of each
    # global batch (reusing the preprocessing shard convention)
    batcher = BucketBatcher(dataset, cfg.train.batch_size * n_acc,
                            sample_weights=sample_weights,
                            random_rotate=bool(cfg.data.get_path(
                                "transform.random_rot", False)),
                            pos_jitter=float(cfg.data.get_path(
                                "transform.pos_jitter", 0.0)),
                            seed=cfg.train.seed, indices=split["train"],
                            process_index=pid, process_count=pcount)
    val_batcher = BucketBatcher(dataset, cfg.train.batch_size,
                                seed=7, indices=split["val"],
                                process_index=pid, process_count=pcount)
    it_batches = iter(batcher)
    example = next(it_batches)

    rng = jax.random.PRNGKey(cfg.train.seed)
    variables = net.init(rng, jnp.asarray(example["pos"]),
                         jnp.asarray(example["v"]),
                         jnp.asarray(example["node_mask"]),
                         jnp.asarray(example["shape_emb"]),
                         jnp.zeros((example["pos"].shape[0],), jnp.int32))
    logger.info(f"params: {misc.count_parameters(variables['params']):,}")

    tx = make_optimizer(lr=cfg.train.optimizer.lr,
                        beta1=cfg.train.optimizer.get("beta1", 0.95),
                        beta2=cfg.train.optimizer.get("beta2", 0.999),
                        weight_decay=cfg.train.optimizer.get("weight_decay", 0),
                        max_grad_norm=cfg.train.get("max_grad_norm", 8.0))
    state = create_train_state(variables["params"],
                               variables.get("batch_stats"), tx,
                               ema=cfg.train.get("ema_decay") is not None)
    start_it = 1
    if args.resume:
        state, meta = restore_checkpoint(args.resume, state)
        start_it = int(meta.get("step", 0)) + 1
        logger.info(f"resumed from {args.resume} at step {start_it - 1}")

    sched = get_scheduler(cfg.train.scheduler.type,
                          **{k: v for k, v in cfg.train.scheduler.items()
                             if k != "type"})
    # multi-host runs always need the sharded step over the global mesh
    mesh = (make_mesh(args.mesh) if args.mesh > 1
            else (make_mesh() if is_dist else None))
    n_acc = int(cfg.train.get("n_acc_batch", 1))
    train_step = make_diffusion_train_step(
        net, dsched, tx, mesh=mesh,
        ema_decay=cfg.train.get("ema_decay", None), n_acc=n_acc)
    eval_step = make_diffusion_eval_step(net, dsched)

    val_batches = val_batcher.fixed_batches(
        max(1, min(4, len(split["val"]) // cfg.train.batch_size)), seed=7)
    val_ts = np.linspace(0, model_cfg.num_diffusion_timesteps - 1, 10
                         ).astype(int)

    max_iters = args.max_iters or cfg.train.max_iters
    val_freq = args.val_freq or cfg.train.val_freq
    best_val = float("inf")

    # ---- dispatch amortization: K optimizer updates per device call.
    # LR only changes at val boundaries and logs read every 100 iters, so
    # K must divide both; also the remaining iteration count, so chunk
    # ends land exactly on max_iters.
    import math
    K = args.steps_per_call
    if K == 0:
        K = (20 if (mesh is None and not is_dist and n_acc == 1
                    and not args.profile) else 1)
    K = math.gcd(math.gcd(K, val_freq), math.gcd(100,
                                                 max_iters - start_it + 1))
    K = max(K, 1)
    if K > 1:
        train_step_multi = make_diffusion_train_step_multi(
            net, dsched, tx, K, ema_decay=cfg.train.get("ema_decay", None))
        logger.info(f"steps_per_call: {K}")

    def to_device(batch):
        jb = {"pos": jnp.asarray(batch["pos"]),
              "v": jnp.asarray(batch["v"]),
              "node_mask": jnp.asarray(batch["node_mask"]),
              "shape_emb": jnp.asarray(batch["shape_emb"])}
        if is_dist:
            jb = dist.host_local_to_global(jb, mesh)
        return jb

    if K > 1:
        # stack K same-bucket batches into (K, B, ...) for the scanned
        # multi-step; grouping by bucket keeps shapes static per dispatch
        # (one compile per bucket, same as the single-step path)
        def chunk_same_bucket(it, k):
            buf: dict = {}
            for b in it:
                key = b["pos"].shape[1]
                buf.setdefault(key, []).append(b)
                if len(buf[key]) == k:
                    chunk = buf.pop(key)
                    yield {f: np.stack([c[f] for c in chunk])
                           for f in ("pos", "v", "node_mask", "shape_emb")}

        it_batches = chunk_same_bucket(it_batches, K)

    if is_dist:
        # multi-host assembly stays on the main thread (collective-ordered)
        it_device = (to_device(b) for b in it_batches)
    else:
        # background-thread device prefetch: the host gather + H2D transfer
        # (tens of ms RTT through the axon tunnel) overlap with the device
        # step instead of serializing with it — measured 33 -> ~2x it/s on
        # the single-CPU VM. Depth 2 is enough: the queue only needs to
        # hide one transfer latency.
        import queue
        import threading

        def _prefetch(it, depth=2):
            q: "queue.Queue" = queue.Queue(maxsize=depth)
            _END = object()

            def worker():
                try:
                    for b in it:
                        q.put(to_device(b))
                except BaseException as e:     # surface errors in the loop
                    q.put((_END, e))

            threading.Thread(target=worker, daemon=True).start()
            while True:
                item = q.get()
                if isinstance(item, tuple) and len(item) == 2 \
                        and item[0] is _END:
                    raise item[1]
                yield item

        it_device = _prefetch(it_batches)

    for it in range(start_it + K - 1, max_iters + 1, K):
        jb = next(it_device)
        rng, step_rng = jax.random.split(rng)
        if args.profile and it == 200:
            jax.profiler.start_trace(os.path.join(log_dir, "profile"))
        state, metrics = (train_step(state, step_rng, jb) if K == 1
                          else train_step_multi(state, step_rng, jb))
        if args.profile and it == 210:
            jax.tree_util.tree_leaves(state.params)[0].block_until_ready()
            jax.profiler.stop_trace()
            logger.info(f"profile trace saved to {log_dir}/profile")
        if it % 100 == 0 or it == start_it + K - 1:
            geom = (f"geom {float(metrics['loss_geom']):.4f} "
                    if "loss_geom" in metrics else "")
            logger.info(f"[train] it {it} loss {float(metrics['loss']):.4f} "
                        f"pos {float(metrics['loss_pos']):.4f} "
                        f"v {float(metrics['loss_v']):.4f} " + geom +
                        f"grad {float(metrics['grad_norm']):.3f} "
                        f"lr {get_learning_rate(state):.2e}")
            # reference scalar surface (scripts/train_diffusion.py:155-166)
            scalars = {"loss": metrics["loss"],
                       "loss_pos": metrics["loss_pos"],
                       "loss_v": metrics["loss_v"],
                       "grad_norm": metrics["grad_norm"],
                       "lr": get_learning_rate(state)}
            if "loss_geom" in metrics:
                scalars["loss_geom"] = metrics["loss_geom"]
            mw.scalars(scalars, it, prefix="train/")
        if it % val_freq == 0 or it == max_iters:
            losses, aurocs = [], []
            for vb in val_batches:
                jvb = {k: jnp.asarray(v) for k, v in vb.items()
                       if k in ("pos", "v", "node_mask", "shape_emb")}
                # host-local eval on a fetched copy of the (replicated)
                # global state — a local jit must not mix device sets
                eval_state = (jax.device_get(state) if is_dist else state)
                for t in val_ts:
                    rng, er = jax.random.split(rng)
                    out = eval_step(eval_state, er, jvb, jnp.int32(t))
                    losses.append(float(out["loss"]))
                    if t == val_ts[len(val_ts) // 2]:
                        aurocs.append(atom_type_auroc(
                            out["pred_ligand_v"], vb["v"], vb["node_mask"],
                            num_classes))
            # every host evaluates its local val shard; average across
            # hosts so all processes drive the LR scheduler identically
            val_loss = dist.all_processes_mean(float(np.mean(losses)))
            logger.info(f"[val] it {it} loss {val_loss:.4f} "
                        f"auroc {np.nanmean(aurocs):.4f}")
            mw.scalars({"loss": val_loss,
                        "atom_auroc": float(np.nanmean(aurocs))}, it,
                       prefix="val/")
            new_lr = sched.step(val_loss, get_learning_rate(state))
            state = set_learning_rate(state, new_lr)
            if val_loss < best_val:
                best_val = val_loss
                path = save_checkpoint(os.path.join(log_dir, "checkpoints"),
                                       it, state, config=dict(cfg),
                                       scheduler_state=vars(sched))
                logger.info(f"[ckpt] best val {best_val:.4f} -> {path}")
    logger.info("done")


if __name__ == "__main__":
    main()
