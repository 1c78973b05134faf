#!/usr/bin/env python
"""First-conv + relu/pool layout probes on the real chip.

The round-2 trace shows conv1_1 (3->64) running at ~5 TF/s behind a 30 GB/s
input-layout copy, and ~18 ms of separate relu/layout passes. Each probe fn is
jitted to return ONE scalar (sum of the full output, a fixed ~0.4 ms bandwidth
pass) so the timing loop only moves scalars over the tunnel, pipelined one
iteration behind. Run: python scripts/convprobe2.py
"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    prev = None
    for _ in range(iters):
        out = fn(*args)
        if prev is not None:
            float(prev)
        prev = out
    float(prev)
    return (time.perf_counter() - t0) / iters * 1e3


def conv(x, k):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)


B, H, W = 8, 608, 1216
rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
k3 = jnp.asarray(rng.rand(3, 3, 3, 64), jnp.bfloat16)
img16 = img.astype(jnp.bfloat16)

f_a = jax.jit(lambda x, k: jnp.sum(conv(x.astype(jnp.bfloat16), k).astype(jnp.float32)))
print(f"A conv3->64, f32 in : {timeit(f_a, img, k3):7.2f} ms", flush=True)

f_b = jax.jit(lambda x, k: jnp.sum(conv(x, k).astype(jnp.float32)))
print(f"B conv3->64, bf16 in: {timeit(f_b, img16, k3):7.2f} ms", flush=True)

for c in (4, 8):
    kp = jnp.pad(k3, ((0, 0), (0, 0), (0, c - 3), (0, 0)))
    f_d = jax.jit(lambda x, k: jnp.sum(
        conv(jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, k.shape[2] - 3))), k).astype(jnp.float32)))
    print(f"D conv{c}->64 bf16, pad inside jit: {timeit(f_d, img16, kp):7.2f} ms", flush=True)

# relu fusion check at block-1 sizes (64ch)
k64 = jnp.asarray(rng.rand(3, 3, 64, 64), jnp.bfloat16)
x64 = jnp.asarray(rng.rand(B, H, W, 64), jnp.bfloat16)
f_e = jax.jit(lambda x, k: jnp.sum(conv(x, k).astype(jnp.float32)))
t1 = timeit(f_e, x64, k64)
f_f = jax.jit(lambda x, k: jnp.sum(conv(jax.nn.relu(conv(x, k) + 1.0), k).astype(jnp.float32)))
t2 = timeit(f_f, x64, k64)
print(f"E conv64: {t1:7.2f} ms; conv+bias+relu+conv: {t2:7.2f} ms (delta {t2-2*t1:+.2f} vs 2x conv)", flush=True)

# block3-equivalent (256ch at quarter res) for reference
k256 = jnp.asarray(rng.rand(3, 3, 256, 256), jnp.bfloat16)
x256 = jnp.asarray(rng.rand(B, H // 4, W // 4, 256), jnp.bfloat16)
f_g = jax.jit(lambda x, k: jnp.sum(conv(x, k).astype(jnp.float32)))
print(f"G conv256 (H/4): {timeit(f_g, x256, k256):7.2f} ms", flush=True)

# sum-only baseline (the scalar-reduce overhead present in every probe)
f_s = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
print(f"S sum(x64) baseline: {timeit(f_s, x64):7.2f} ms", flush=True)
