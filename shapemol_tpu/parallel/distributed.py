"""Multi-host (multi-process) runtime: jax.distributed + per-host data.

The reference is a single-process, single-GPU code base (SURVEY §2.4); its
only concurrency is host multiprocessing pools. The TPU-native scaling story
is the standard JAX multi-controller runtime:

  * every host calls :func:`initialize` (jax.distributed.initialize) so the
    processes form one runtime sharing a global device set — ICI collectives
    within a slice, DCN across slices, both inserted by GSPMD;
  * the mesh is built over ``jax.devices()`` (GLOBAL devices) on every host;
  * each host loads only its own batch shard
    (``process_index``/``process_count`` reuse the preprocessing
    ``shard_index``/``num_shards`` convention) and assembles a global jax
    Array from host-local data before feeding the sharded train step.

Single-process runs (including the virtual 8-device CPU mesh used in tests)
pass through unchanged: ``initialize`` is a no-op without coordinator info,
and :func:`host_local_to_global` is the identity when process_count == 1.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shapemol_tpu.parallel.mesh import DATA_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[str] = None) -> bool:
    """Join the multi-process runtime. Returns True when distributed mode is
    active.

    Arguments fall back to the standard env vars
    (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID,
    JAX_LOCAL_DEVICE_IDS); when neither flags nor env provide a coordinator
    this is a no-op and the run stays single-process.
    """
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if not coordinator_address:
        return False
    # already joined (e.g. one CLI invoking another in-process)? Checked
    # via the runtime-state client rather than jax.process_count(), which
    # would initialize the backend prematurely.
    try:
        from jax._src import distributed as _jd
        if getattr(_jd.global_state, "client", None) is not None:
            return True
    except ImportError:
        pass
    kw: dict = {"coordinator_address": coordinator_address}
    num_processes = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    process_id = (process_id if process_id is not None
                  else os.environ.get("JAX_PROCESS_ID"))
    local_device_ids = (local_device_ids
                        or os.environ.get("JAX_LOCAL_DEVICE_IDS"))
    if num_processes is not None:
        kw["num_processes"] = int(num_processes)
    if process_id is not None:
        kw["process_id"] = int(process_id)
    if local_device_ids:
        kw["local_device_ids"] = [int(x) for x
                                  in str(local_device_ids).split(",")]
    jax.distributed.initialize(**kw)
    return True


def process_shard() -> tuple:
    """(process_index, process_count) — the per-host data shard key."""
    return jax.process_index(), jax.process_count()


def host_local_to_global(batch: Any, mesh: Mesh) -> Any:
    """Per-host batch shard -> global jax.Array sharded over DATA_AXIS.

    Every process passes its LOCAL slice (local_batch = global_batch /
    process_count rows); the result is a global array whose addressable
    shards are exactly the local data. Identity under a single process.
    """
    if jax.process_count() == 1:
        return batch
    from jax.experimental import multihost_utils
    return multihost_utils.host_local_array_to_global_array(
        batch, mesh, P(DATA_AXIS))


def local_batch_size(global_batch_size: int) -> int:
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(f"global batch {global_batch_size} not divisible "
                         f"by process count {n}")
    return global_batch_size // n


def sync_global_devices(name: str = "barrier") -> None:
    """Cross-host barrier (no-op single-process)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def all_processes_mean(value: float) -> float:
    """Mean of a host-local scalar across processes (e.g. per-host val loss
    -> one global number so every host drives the LR scheduler identically).
    Identity under a single process."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils
    vals = multihost_utils.process_allgather(np.asarray(value,
                                                        np.float32))
    return float(np.mean(vals))
