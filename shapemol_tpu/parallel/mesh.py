"""Device-mesh utilities: data-parallel sharding over ICI.

The reference is single-GPU (SURVEY §2.4 — no DP/TP/PP/SP); its only
concurrency is host multiprocessing. The TPU-native scaling axis is data
parallelism over a 1-D (or 2-D pod) mesh: molecules are sharded over the
'dp' axis, parameters are replicated, and XLA inserts the psum gradient
all-reduce over ICI automatically. Sequence-style parallelism is
structurally unnecessary here (molecules are 8-40 atoms; clouds are 512
points — everything fits in one chip's VMEM), which we document as a
deliberate design decision rather than an omission.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (molecule) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put every array in the pytree with its leading axis sharded
    over the mesh's data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
