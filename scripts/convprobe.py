#!/usr/bin/env python
"""Raw conv fwd/bwd timing probe on the chip: is XLA conv near peak?"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def conv(x, k):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=dn)


def main():
    rng = np.random.RandomState(0)
    cases = [
        ("conv1_2 608x1216x64->64", (4, 608, 1216, 64), (3, 3, 64, 64)),
        ("conv3_2 152x304x256->256", (4, 152, 304, 256), (3, 3, 256, 256)),
        ("conv5_2 38x76x512->512", (4, 38, 76, 512), (3, 3, 512, 512)),
    ]
    for name, xs, ks in cases:
        for dt in (jnp.bfloat16,):
            x = jnp.asarray(rng.randn(*xs), dt)
            k = jnp.asarray(rng.randn(*ks), dt)
            f = jax.jit(lambda a, b: conv(a, b).sum())
            g = jax.jit(lambda a, b: jax.grad(lambda aa, bb: conv(aa, bb).sum(),
                                              argnums=(0, 1))(a, b))
            tf_ = timeit(f, x, k)
            tg = timeit(g, x, k)
            flops = 2 * np.prod(xs) * ks[0] * ks[1] * ks[3]
            print(f"{name} {dt.__name__}: fwd {tf_*1e3:7.2f} ms ({flops/tf_/1e12:6.1f} TF/s)"
                  f"  fwd+bwd {tg*1e3:7.2f} ms ({3*flops/tg/1e12:6.1f} TF/s)")


if __name__ == "__main__":
    main()
