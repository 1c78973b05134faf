"""Data-parallel mesh utilities (TPU-native replacement for DDP/NCCL).

The reference's only parallelism is data parallelism over NCCL DDP
(``pt/engine/trainer.py:92-95``; SURVEY.md section 2.3). The JAX equivalent: one
``Mesh`` with a 'data' axis; batches sharded on 'data', params replicated; jit's
SPMD partitioner inserts the gradient all-reduce over ICI automatically. The teacher
EMA is a replicated functional update — zero communication (vs the reference's
host-side state_dict walk, ``trainer.py:431-449``).

Multi-slice scaling is a mesh extension ('data' spanning DCN), not new code.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Place every array leaf with its leading dim sharded over the mesh axis.

    Single-process: a plain device_put. Multi-host (pod): each process feeds its
    LOCAL slice of the global batch (the loader is built with
    world_size=process_count) and the pieces are assembled into global arrays
    with jax.make_array_from_process_local_data — the JAX-native equivalent of
    the reference's per-rank DataLoader shards (``pt/data/build.py:173-187``).
    """
    sharding = NamedSharding(mesh, P(axis_name))

    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

    def put(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def host_max(value: float) -> float:
    """Max of a host-side scalar across processes.

    The reference reduces per-rank ``data_time`` as max-across-ranks through
    ``comm.gather`` (``pt/engine/trainer.py:403-411``); this is the JAX-native
    equivalent (no-op single-process; one tiny allgather on a pod, called only
    at writer cadence).
    """
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray(float(value)))
    return float(np.max(arr))
