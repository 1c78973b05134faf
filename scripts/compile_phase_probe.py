"""Phase-split the bench graph's cold/warm startup (VERDICT r4 Weak #2).

BENCH_r04 showed warm compile 155 s vs cold 163 s despite the persistent
compilation cache being enabled. scripts/cacheprobe.py proved the cache layer
itself works cross-process on the axon backend (3.3 s -> 0.4 s), so the miss
must be inside the real program's startup path. This script builds the exact
bench mutual-step graph and times each phase separately:

  import -> build (model init + optimizer) -> trace+lower -> XLA compile ->
  first execution (input upload + run)

with compilation-cache hit/miss logging on. Run it twice (fresh processes) and
diff the phases: whatever does NOT shrink on the warm run is the real cost.

Usage: python scripts/compile_phase_probe.py [cache_dir]
"""

import logging
import os
import sys
import time

CACHE = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.jax_cache"
os.makedirs(CACHE, exist_ok=True)

logging.basicConfig(level=logging.WARNING)
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)

T0 = time.perf_counter()


def mark(label, t_prev=[T0]):
    now = time.perf_counter()
    print(f"[phase] {label}: {now - t_prev[0]:.1f} s", flush=True)
    t_prev[0] = now


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_explain_cache_misses", True)

import bench  # noqa: E402

mark("imports")

mutual, state, (limg, lgt, uimg) = bench.build(
    8, (608, 1216), 16, True, (12000, 2000, 512, 512, 100), "exact", -1, -1, -1)
key = jax.random.key(0)
mark("build (init + optimizer + input upload)")

lowered = mutual.lower(state, limg, lgt, uimg, key)
mark("trace + lower")

compiled = lowered.compile()
mark("XLA compile")

state, m = compiled(state, limg, lgt, uimg, key)
float(m["total_loss"])
mark("first execution (sync)")

print(f"[phase] TOTAL: {time.perf_counter() - T0:.1f} s", flush=True)
