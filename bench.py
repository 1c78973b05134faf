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
import os
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
        # uint8, like the production loader ships them (4x less host->device
        # traffic; the in-graph preprocess casts to the compute dtype)
        return ImageBatch(
            image=jnp.asarray(rng.randint(0, 255, (n, h, w, 3), dtype=np.uint8)),
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


def bench_e2e(batch: int, iters: int, data_root: str):
    """End-to-end throughput: SemiSupLoader -> shard -> fused mutual step.

    Includes host decode/aug/collate (the reference's hot loop includes
    dataloading, ``pt/engine/trainer.py:267-270``). Needs the DAOD proxy tree
    (scripts/make_daod_proxy.py) at ``data_root``. Reports img/s/chip plus the
    host data_time share.
    """
    import time

    import jax

    from probabilisticteacher_tpu.config import get_cfg
    from probabilisticteacher_tpu.data.datasets import load_voc_instances
    from probabilisticteacher_tpu.data.loader import SemiSupLoader
    from probabilisticteacher_tpu.engine.trainer import PTrainer

    cfg = get_cfg()
    cfg.merge_from_file("configs/pt/final_c2f.yaml")
    cfg.MODEL.VGG.PRETRAIN = ""
    cfg.SOLVER.IMG_PER_BATCH_LABEL = batch
    cfg.SOLVER.IMG_PER_BATCH_UNLABEL = batch
    cfg.UNSUPNET.BURN_UP_STEP = 0
    cfg.SOLVER.MAX_ITER = iters
    cfg.INPUT.MIN_SIZE_TRAIN = (600,)
    cfg.INPUT.CANVAS.WIDE = (608, 1216)
    cfg.INPUT.CANVAS.TALL = (1216, 608)
    cfg.TEST.EVAL_PERIOD = 0
    cfg.SOLVER.CHECKPOINT_PERIOD = 0
    cfg.OUTPUT_DIR = "/tmp/bench_e2e"
    from probabilisticteacher_tpu.data.datasets import CLASS_NAMES_8

    label = load_voc_instances(
        os.path.join(data_root, "data/VOC2007_citytrain"), "train", CLASS_NAMES_8)
    unlabel = load_voc_instances(
        os.path.join(data_root, "data/VOC2007_foggytrain"), "train", CLASS_NAMES_8)

    trainer = PTrainer(cfg)
    loader_iter = iter(SemiSupLoader(cfg, label, unlabel, seed=0))

    trainer.iter = 0
    trainer.run_step(loader_iter)  # compile
    float(trainer.pending_metrics["total_loss"])
    t0 = time.perf_counter()
    data_t = 0.0
    prev = None
    for i in range(iters):
        trainer.iter = i + 1
        trainer.run_step(loader_iter)
        data_t += trainer.last_data_time
        if prev is not None:
            float(prev)
        prev = trainer.pending_metrics["total_loss"]
    float(prev)
    dt = (time.perf_counter() - t0) / iters
    n_chips = jax.device_count()
    value = 4 * batch / dt / n_chips
    out = {
        "metric": "e2e train throughput (loader in loop)",
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / V100_BASELINE_IMG_PER_SEC, 3),
        "data_time_share": round(data_t / iters / dt, 3),
    }
    print(json.dumps(out))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true", help="tiny CPU sanity run")
    p.add_argument("--batch", type=int, default=0)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--maxpool-nms", action="store_true",
                   help="opt-in approximate RPN NMS (MODEL.RPN.NMS_IMPL maxpool)")
    p.add_argument("--e2e", action="store_true",
                   help="loader-in-the-loop throughput on the DAOD proxy tree")
    p.add_argument("--data-root", default="/root/repo/.proxy_data")
    args = p.parse_args(argv)

    if args.e2e:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
        return bench_e2e(args.batch or 4, args.iters, args.data_root)

    if args.smoke:
        import jax

        # the axon plugin overrides the JAX_PLATFORMS env var; force via config
        jax.config.update("jax_platforms", "cpu")
        batch = args.batch or 2
        canvas, depth, amp = (48, 96), 11, False
        budgets = (32, 16, 8, 8, 4)
        iters = 2
    else:
        # batch 8 is the measured sweet spot: 2*8+8=24 images in the fused
        # student pass (8-aligned, so no sublane padding) + teacher 8; batch 16
        # measured identical img/s/chip and batch 4 ~20% lower (round-2 logs).
        batch = args.batch or 8
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
