"""Probe: does the JAX persistent compilation cache work on the axon backend?

VERDICT r4 Weak #2: warm compile 155 s vs cold 163 s => the on-disk cache is
either not written, not read, or keyed unstably. This probe compiles a small
conv+matmul graph with cache debug logging enabled and reports what the cache
layer actually did, plus the cache dir contents. Run twice (two processes) to
test cross-process reuse.
"""

import logging
import os
import sys
import time

CACHE = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.jax_cache_probe"
os.makedirs(CACHE, exist_ok=True)

logging.basicConfig(level=logging.DEBUG)
for noisy in ("jax._src.dispatch", "jax._src.interpreters", "jax._src.xla_bridge"):
    logging.getLogger(noisy).setLevel(logging.WARNING)
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
try:
    jax.config.update("jax_explain_cache_misses", True)
except Exception:
    pass

dev = jax.devices()[0]
print(f"backend platform={dev.platform} kind={dev.device_kind}", flush=True)


@jax.jit
def f(x, w):
    y = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.tanh(y).sum()


x = jnp.ones((2, 64, 64, 16), jnp.bfloat16)
w = jnp.ones((3, 3, 16, 16), jnp.bfloat16)
t0 = time.time()
print(float(f(x, w)), flush=True)
print(f"compile+run took {time.time()-t0:.2f}s", flush=True)
print("cache dir contents:", os.listdir(CACHE), flush=True)
