#!/usr/bin/env python
"""A/B the ROIAlign backward in isolation on the real chip.

The mutual step's ROIAlign work: student sup 8x512 + student unsup 8x512 ROIs
on (B, 38, 76, 512) bf16 features, 7x7 out, sampling_ratio 2 (both need
gradients); the teacher's 8x2000 is forward-only. The einsum backward
materializes the (N, R, x, H, C) interp intermediate (the multi-GB HBM tensor
the fused kernel avoids). Prints fwd / fwd+bwd ms for einsum vs fused.

Usage: python scripts/roialign_bwd_bench.py [--batch 8] [--rois 512]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def timed(fn, args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(jnp.asarray(x).ravel()[0].astype(jnp.float32)), out)
    t0 = time.perf_counter()
    prev = None
    for _ in range(iters):
        out = fn(*args)
        if prev is not None:
            float(jnp.asarray(jax.tree_util.tree_leaves(prev)[0]).ravel()[0]
                  .astype(jnp.float32))
        prev = out
    float(jnp.asarray(jax.tree_util.tree_leaves(prev)[0]).ravel()[0]
          .astype(jnp.float32))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--rois", type=int, default=512)
    p.add_argument("--hw", type=int, nargs=2, default=[38, 76])
    p.add_argument("--chans", type=int, default=512)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import probabilisticteacher_tpu.ops.roi_align_pallas as RP

    n, r, (h, w), c = args.batch, args.rois, args.hw, args.chans
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32)).astype(jnp.bfloat16)
    boxes = rng.rand(n, r, 4).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + boxes[..., 2:] * 400
    boxes = jnp.asarray(boxes * np.array([16.0, 8.0, 16.0, 8.0]))
    g = jnp.ones((n, r, 7, 7, c), jnp.bfloat16)

    for fused in (False, True):
        RP.FUSED_BWD = fused

        def roi(f, b):
            return RP.roi_align_pallas(f, b, 1.0 / 16, 7, 2, False)

        fwd = jax.jit(roi)
        t_f = timed(fwd, (feats, boxes), args.iters)

        def loss(f, b):
            return jnp.sum(roi(f, b).astype(jnp.float32))

        bwd = jax.jit(jax.grad(loss))
        # grad is fresh-traced per FUSED_BWD value (module flag read at trace)
        t_b = timed(bwd, (feats, boxes), args.iters)
        print(f"fused={fused}: fwd {t_f:.2f} ms, fwd+bwd {t_b:.2f} ms "
              f"(shapes {n}x{r} rois on {h}x{w}x{c})")


if __name__ == "__main__":
    main()
