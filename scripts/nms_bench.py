#!/usr/bin/env python
"""A/B the blocked-greedy NMS on the real chip at production shapes.

Shapes mirror the mutual step: 24-image vmapped RPN NMS (12000 -> 2000 @ 0.7)
plus the 8-image teacher class-aware NMS (2000 -> 100 @ 0.5).

Usage: python scripts/nms_bench.py [--block 1024] [--unroll 8] [--iters 20]
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


def boxes_like_rpn(rng, n_img, k, hw=(608, 1216)):
    """Clustered boxes (objects attract proposals) — worst-ish suppression chains."""
    h, w = hw
    n_clusters = 30
    cx = rng.uniform(0, w, (n_img, n_clusters, 1))
    cy = rng.uniform(0, h, (n_img, n_clusters, 1))
    sel = rng.randint(0, n_clusters, (n_img, k))
    jitter = rng.normal(0, 40, (n_img, k, 4))
    bw = rng.uniform(30, 300, (n_img, k))
    bh = rng.uniform(30, 300, (n_img, k))
    x1 = np.take_along_axis(cx[..., 0], sel, 1) - bw / 2 + jitter[..., 0]
    y1 = np.take_along_axis(cy[..., 0], sel, 1) - bh / 2 + jitter[..., 1]
    b = np.stack([x1, y1, x1 + bw + jitter[..., 2].clip(0), y1 + bh + jitter[..., 3].clip(0)], -1)
    return np.clip(b, 0, max(h, w)).astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--block", type=int, default=1024)
    p.add_argument("--unroll", type=int, default=0, help="0 = module default")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--impl", default="block", choices=("block", "pallas"),
                   help="block = ops.nms fixed-point; pallas = ops.nms_pallas scan")
    p.add_argument("--roi-cands", type=int, default=16000,
                   help="teacher class-NMS candidate count (the real mutual "
                        "step flattens P*K = 2000*8 = 16000, detector.py:560)")
    args = p.parse_args()

    import probabilisticteacher_tpu.ops.nms as N

    if args.unroll:
        orig = N._fixed_point_keep
        N._fixed_point_keep = lambda s, e, unroll=args.unroll: orig(s, e, unroll)

    rng = np.random.RandomState(0)
    rpn_boxes = jnp.asarray(boxes_like_rpn(rng, 24, 12000))
    rpn_scores = jnp.asarray(rng.rand(24, 12000).astype(np.float32))
    valid = jnp.ones((24, 12000), bool)

    rc = args.roi_cands
    roi_boxes = jnp.asarray(boxes_like_rpn(rng, 8, rc))
    roi_scores = jnp.asarray(rng.rand(8, rc).astype(np.float32))
    roi_cls = jnp.asarray(rng.randint(0, 8, (8, rc)), jnp.int32)
    roi_valid = jnp.ones((8, rc), bool)

    if args.impl == "pallas":
        import probabilisticteacher_tpu.ops.nms_pallas as NP

        @jax.jit
        def run(rb, rs, rv, tb, ts, tc, tv):
            i1, v1 = jax.vmap(lambda b, s, v: NP.nms(b, s, v, 0.7, 2000))(rb, rs, rv)
            i2, v2 = jax.vmap(lambda b, s, c, v: NP.batched_nms(b, s, c, v, 0.5, 100))(
                tb, ts, tc, tv)
            return (jnp.sum(v1.astype(jnp.int32)) + jnp.sum(v2.astype(jnp.int32)),
                    jnp.sum(i1) + jnp.sum(i2))
    else:
        @jax.jit
        def run(rb, rs, rv, tb, ts, tc, tv):
            i1, v1 = jax.vmap(lambda b, s, v: N.nms(b, s, v, 0.7, 2000, args.block))(rb, rs, rv)
            i2, v2 = jax.vmap(lambda b, s, c, v: N.batched_nms(
                b, s, c, v, 0.5, 100, min(args.block, 256)))(tb, ts, tc, tv)
            return (jnp.sum(v1.astype(jnp.int32)) + jnp.sum(v2.astype(jnp.int32)),
                    jnp.sum(i1) + jnp.sum(i2))

    out = run(rpn_boxes, rpn_scores, valid, roi_boxes, roi_scores, roi_cls, roi_valid)
    print("kept:", int(out[0]))
    t0 = time.perf_counter()
    prev = None
    for _ in range(args.iters):
        out = run(rpn_boxes, rpn_scores, valid, roi_boxes, roi_scores, roi_cls, roi_valid)
        if prev is not None:
            int(prev[0])
        prev = out
    int(prev[0])
    dt = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"impl={args.impl} block={args.block} unroll={args.unroll or 'default'} "
          f"roi_cands={args.roi_cands}: {dt:.2f} ms/iter")


if __name__ == "__main__":
    main()
