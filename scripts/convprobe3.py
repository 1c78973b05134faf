#!/usr/bin/env python
"""First-conv variants, timed with an in-jit dependence chain (escapes the
~28 ms tunnel dispatch floor: N chained convs inside ONE jit, scalar out).

Run on the chip: python scripts/convprobe3.py [--batch 8] [--chain 10]
"""
import argparse
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def conv(x, k):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)


def timed(name, fn, *args, iters=5):
    out = fn(*args); float(out)
    t0 = time.perf_counter()
    prev = None
    for _ in range(iters):
        out = fn(*args)
        if prev is not None: float(prev)
        prev = out
    float(prev)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)


def chain_fn(kshape, cin, chain, dtype=jnp.bfloat16):
    def f(x, k):
        def body(i, acc):
            y = conv(x + acc, k)
            # data dependence: tiny slice of y feeds the next input
            return acc + y[..., :cin].astype(x.dtype) * jnp.asarray(1e-30, x.dtype)
        acc = jax.lax.fori_loop(0, chain, body, jnp.zeros_like(x))
        return jnp.sum(acc.astype(jnp.float32))
    return jax.jit(f)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--chain", type=int, default=10)
    args = p.parse_args()
    B, H, W = args.batch, 608, 1216
    rng = np.random.RandomState(0)
    CH = args.chain

    x3 = jnp.asarray(rng.rand(B, H, W, 3), jnp.bfloat16)
    k3 = jnp.asarray(rng.rand(3, 3, 3, 64), jnp.bfloat16)
    timed(f"A conv3->64 bf16  x{CH} (per-conv below)", chain_fn((3,3,3,64), 3, CH), x3, k3, iters=3)

    x8 = jnp.pad(x3, ((0,0),(0,0),(0,0),(0,5)))
    k8 = jnp.pad(k3, ((0,0),(0,0),(0,5),(0,0)))
    timed(f"B conv8->64 bf16  x{CH}", chain_fn((3,3,8,64), 8, CH), x8, k8, iters=3)

    x3f = x3.astype(jnp.float32)
    k3f = k3.astype(jnp.float32)
    timed(f"C conv3->64 f32   x{CH}", chain_fn((3,3,3,64), 3, CH), x3f, k3f, iters=3)

    # s2d shape probe: (B, H/2, W/2, 12) -> 256 (3x3 kernel as the exact
    # transform requires); measures the SHAPE's throughput only
    xs = jnp.asarray(rng.rand(B, H//2, W//2, 12), jnp.bfloat16)
    ks = jnp.asarray(rng.rand(3, 3, 12, 256), jnp.bfloat16)
    timed(f"D s2d conv12->256 x{CH} (4x flops of A)", chain_fn((3,3,12,256), 12, CH), xs, ks, iters=3)

    # block1 conv2 (64->64) and a fused conv+relu pair for reference
    x64 = jnp.asarray(rng.rand(B, H, W, 64), jnp.bfloat16)
    k64 = jnp.asarray(rng.rand(3, 3, 64, 64), jnp.bfloat16)
    timed(f"E conv64->64 bf16 x{CH}", chain_fn((3,3,64,64), 64, CH), x64, k64, iters=3)

    # does relu fuse into the conv? compare conv vs relu(conv)
    def relu_chain(x, k):
        def body(i, acc):
            y = jax.nn.relu(conv(x + acc, k) + jnp.asarray(1.0, x.dtype))
            return acc + y[..., :64] * jnp.asarray(1e-30, x.dtype)
        acc = jax.lax.fori_loop(0, CH, body, jnp.zeros_like(x))
        return jnp.sum(acc.astype(jnp.float32))
    timed(f"F relu(conv64)    x{CH}", jax.jit(relu_chain), x64, k64, iters=3)


if __name__ == "__main__":
    main()
