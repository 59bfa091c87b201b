"""Logging, seeding, run-dir management.

Functional parity target: utils/misc.py (get_logger, get_new_log_dir,
seed_all, BlackHole, count_parameters)."""
from __future__ import annotations

import logging
import os
import random
import time
from typing import Optional

import numpy as np


class BlackHole:
    """Absorbs any call/attribute access (used as a null logger/writer)."""

    def __setattr__(self, name, value):
        pass

    def __call__(self, *args, **kwargs):
        return self

    def __getattr__(self, name):
        return self


def get_logger(name: str, log_dir: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if logger.handlers:
        return logger
    fmt = logging.Formatter("[%(asctime)s::%(name)s::%(levelname)s] %(message)s")
    sh = logging.StreamHandler()
    sh.setLevel(logging.DEBUG)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_dir:
        fh = logging.FileHandler(os.path.join(log_dir, "log.txt"))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def get_new_log_dir(root: str = "./logs", prefix: str = "",
                    tag: str = "") -> str:
    fn = time.strftime("%Y_%m_%d__%H_%M_%S", time.localtime())
    if prefix:
        fn = f"{prefix}_{fn}"
    if tag:
        fn = f"{fn}_{tag}"
    log_dir = os.path.join(root, fn)
    os.makedirs(log_dir, exist_ok=True)
    return log_dir


def seed_all(seed: int) -> None:
    """Seed host-side RNGs. Device randomness in this framework flows through
    explicit jax.random keys (derive them from this seed at call sites)."""
    random.seed(seed)
    np.random.seed(seed)


def count_parameters(params) -> int:
    import jax
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))


def enable_compilation_cache(path: str = "~/.cache/shapemol_tpu_xla") -> None:
    """Persistent XLA compilation cache: repeat CLI invocations (e.g. one
    sample job per --data_id) skip the multi-minute remote compile."""
    import os

    import jax

    cache_dir = os.path.expanduser(os.environ.get("SHAPEMOL_XLA_CACHE",
                                                  path))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass            # older jax without the knobs
