#!/usr/bin/env python
"""Benchmark: mutual-learning train-step throughput (images/sec/chip).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The counted images per iteration follow the reference recipe accounting
(``pt/engine/trainer.py:263-392``): one mutual iteration processes
2*B_label supervised views + B_unlabel student unsup + B_unlabel teacher
inference = 4*B images for B_label == B_unlabel == B.

Baseline: the reference publishes NO throughput (SURVEY.md section 6). We anchor
vs_baseline to an estimated 55 img/s for the V100 recipe (VGG16 Faster R-CNN at
600px, 64 images/iter across 4 forwards, ~1.1 s/iter on 1x V100 — typical
detectron2-class numbers for this model); BASELINE.json's bar is >= 3x that.

Modes:
    python bench.py            # real chip, representative shapes
    python bench.py --smoke    # tiny CPU sanity run (same code path)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

V100_BASELINE_IMG_PER_SEC = 55.0


def build(batch: int, canvas, vgg_depth: int, amp: bool, budgets, maxpool_nms=False):
    import jax

    from probabilisticteacher_tpu.config import get_cfg
    from probabilisticteacher_tpu.engine.steps import create_train_state, make_train_steps
    from probabilisticteacher_tpu.modeling.detector import Arch, PTDetector
    from probabilisticteacher_tpu.parallel import make_mesh, replicate, shard_batch
    from probabilisticteacher_tpu.solver import build_optimizer

    cfg = get_cfg()
    cfg.MODEL.VGG.DEPTH = vgg_depth
    cfg.MODEL.VGG.PRETRAIN = ""
    cfg.SOLVER.AMP.ENABLED = amp
    cfg.SOLVER.IMG_PER_BATCH_LABEL = batch
    cfg.SOLVER.IMG_PER_BATCH_UNLABEL = batch
    cfg.UNSUPNET.BURN_UP_STEP = 0
    (cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN, cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN,
     cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE, cfg.UNSUPNET.UNSUP_ROI_BUDGET,
     cfg.TEST.DETECTIONS_PER_IMAGE) = budgets
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = budgets[0]
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = budgets[1]
    if maxpool_nms:
        cfg.MODEL.RPN.NMS_IMPL = "maxpool"

    arch = Arch.from_cfg(cfg)
    det = PTDetector(arch)
    mesh = make_mesh()
    params = det.init(jax.random.key(0), canvas)
    tx = build_optimizer(cfg, params)
    state = replicate(mesh, create_train_state(det, tx, jax.random.key(0), canvas))
    _, mutual = make_train_steps(cfg, det, tx)

    rng = np.random.RandomState(0)
    h, w = canvas
    import jax.numpy as jnp

    from probabilisticteacher_tpu.structures import GroundTruth, ImageBatch

    def mk_images(n):
        return ImageBatch(
            image=jnp.asarray(rng.randint(0, 255, (n, h, w, 3)).astype(np.float32)),
            image_hw=jnp.asarray([[float(h), float(w)]] * n),
        )

    g = 24
    boxes = rng.uniform(0, min(h, w) // 2, (batch, g, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(8, min(h, w) // 3, (batch, g, 2))
    gt = GroundTruth(jnp.asarray(boxes),
                     jnp.asarray(rng.randint(0, 8, (batch, g)), jnp.int32),
                     jnp.ones((batch, g), bool))
    limg = shard_batch(mesh, mk_images(batch))
    lgt = shard_batch(mesh, gt)
    uimg = shard_batch(mesh, mk_images(batch))
    return mutual, state, (limg, lgt, uimg)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true", help="tiny CPU sanity run")
    p.add_argument("--batch", type=int, default=0)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--maxpool-nms", action="store_true",
                   help="opt-in approximate RPN NMS (MODEL.RPN.NMS_IMPL maxpool)")
    args = p.parse_args(argv)

    if args.smoke:
        import jax

        # the axon plugin overrides the JAX_PLATFORMS env var; force via config
        jax.config.update("jax_platforms", "cpu")
        batch = args.batch or 2
        canvas, depth, amp = (48, 96), 11, False
        budgets = (32, 16, 8, 8, 4)
        iters = 2
    else:
        # batch 4 keeps the driver run on the persistent-compile-cache fast path
        # (.jax_cache); use --batch 8 for the larger-amortization number.
        batch = args.batch or 4
        canvas, depth, amp = (608, 1216), 16, True
        budgets = (12000, 2000, 512, 512, 100)
        iters = args.iters

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    try:
        return _run(batch, canvas, depth, amp, budgets, iters, args.maxpool_nms)
    except Exception as e:  # TPU worker crash / OOM: retry smaller before giving up
        print(f"bench failed at batch {batch}: {e}", file=sys.stderr)
        if batch > 2 and not args.smoke:
            return _run(max(2, batch // 2), canvas, depth, amp, budgets, iters, args.maxpool_nms)
        raise


def _run(batch, canvas, depth, amp, budgets, iters, maxpool_nms=False):
    import jax

    mutual, state, batches = build(batch, canvas, depth, amp, budgets, maxpool_nms)
    limg, lgt, uimg = batches
    key = jax.random.key(0)

    # compile + warmup (float() forces a real host sync — block_until_ready does
    # NOT block on tunneled backends, so every timed iteration must fetch a scalar;
    # the fetch of step i-1 is pipelined behind step i to hide the RPC latency)
    state, m = mutual(state, limg, lgt, uimg, key)
    float(m["total_loss"])

    t0 = time.perf_counter()
    prev = None
    for _ in range(iters):
        state, m = mutual(state, limg, lgt, uimg, key)
        if prev is not None:
            float(prev)
        prev = m["total_loss"]
    float(prev)
    dt = (time.perf_counter() - t0) / iters

    n_chips = jax.device_count()
    imgs_per_iter = 4 * batch  # 2B sup views + B student unsup + B teacher
    value = imgs_per_iter / dt / n_chips
    out = {
        "metric": "mutual-step train throughput",
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / V100_BASELINE_IMG_PER_SEC, 3),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
