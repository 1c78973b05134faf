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
    """Place every array leaf with its leading dim sharded over the mesh axis."""
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
