"""2-process multi-host (pod) path test, subprocess-driven (VERDICT r1 #4).

Spawns two real processes that ``jax.distributed.initialize`` against each
other over a local coordinator, each owning 2 virtual CPU devices, and drives
``shard_batch``'s ``make_array_from_process_local_data`` branch + an SPMD step
whose loss reduction crosses the process boundary + ``host_max``.

Reference behaviors matched: DDP all-reduce (``pt/engine/trainer.py:92-95``),
per-rank batch slicing (``pt/data/build.py:173-187``), max-across-ranks
data_time (``trainer.py:403-411``).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_step():
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu via jax.config
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", coord],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    for o in outs:
        assert o["global_devices"] == 4
        # analytic: global x = [0,1,2,3], w=0 -> loss 3.5, updated w 1.5
        assert np.isclose(o["loss"], 3.5, atol=1e-6), o
        assert np.isclose(o["w"], 1.5, atol=1e-6), o
        assert np.isclose(o["data_time_max"], 0.75), o
    # both ranks computed the SAME global loss (DDP equivalence)
    assert outs[0]["loss"] == outs[1]["loss"]
