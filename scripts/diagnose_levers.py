#!/usr/bin/env python
"""Isolate which throughput lever degrades teacher pseudo-labels.

Loads the proxy source-only checkpoint on CPU, runs the teacher weak pass
(`pseudo_labels`) on real foggy proxy images under each lever config, and
compares against the exact path: pseudo-box counts above the confidence taus,
and greedy IoU agreement with the exact set. Run after a proxy collapse to
attribute it (hybrid RPN NMS vs teacher budgets vs candidate prefilter)
without spending chip time on full 3000-iter ablations.

Usage: python scripts/diagnose_levers.py [--n 8] [--short 480]
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--short", type=int, default=480)
    p.add_argument("--data", default=os.path.join(REPO, ".proxy_data"))
    p.add_argument("--weights",
                   default=os.path.join(REPO, ".proxy_runs/source_only/model_0003000"))
    args = p.parse_args()

    from probabilisticteacher_tpu.checkpoint import load_weights
    from probabilisticteacher_tpu.config import get_cfg
    from probabilisticteacher_tpu.data.datasets import CLASS_NAMES_8, load_voc_instances
    from probabilisticteacher_tpu.data.loader import Mapper
    from probabilisticteacher_tpu.engine.steps import TrainState
    from probabilisticteacher_tpu.modeling.detector import Arch, PTDetector
    from probabilisticteacher_tpu.ops import boxes as box_ops
    from probabilisticteacher_tpu.structures import ImageBatch

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs/pt/final_c2f.yaml"))
    cfg.merge_from_list([
        "UNSUPNET.TAU", "[0.5,0.5]",
        "MODEL.ANCHOR_GENERATOR.NAME", "DifferentiableAnchorGenerator",
        "MODEL.VGG.PRETRAIN", "",
        "INPUT.MIN_SIZE_TRAIN", f"({args.short},)",
        "INPUT.CANVAS.WIDE", f"({args.short}, {args.short * 992 // 480})",
        "INPUT.CANVAS.TALL", f"({args.short * 992 // 480}, {args.short})",
        "SOLVER.AMP.ENABLED", "False",
    ])
    canvas = (args.short, args.short * 992 // 480)

    records = load_voc_instances(
        os.path.join(args.data, "data/VOC2007_foggytrain"), "train", CLASS_NAMES_8)
    mapper = Mapper(cfg, is_train=True)
    rng = np.random.default_rng(0)
    imgs = []
    for rec in records:
        out = mapper(rec, rng)
        if out["image"].shape[:2] == canvas:
            imgs.append(out)
        if len(imgs) == args.n:
            break
    assert len(imgs) == args.n, f"only {len(imgs)} wide-canvas records"
    batch = ImageBatch(
        image=jnp.asarray(np.stack([o["image"] for o in imgs]).astype(np.float32)),
        image_hw=jnp.asarray(np.stack([o["image_hw"] for o in imgs])),
    )

    base_arch = Arch.from_cfg(cfg)
    pre_test = base_arch.rpn_pre_nms_topk[0]
    variants = {
        "exact": {},
        "hybrid": {"rpn_nms_impl": "hybrid"},
        "teacher1000": {"teacher_pre_nms_topk": 6000, "teacher_post_nms_topk": 1000},
        "cand2048": {"teacher_nms_candidates": 2048},
        "pre4000": {"rpn_pre_nms_topk": (pre_test, 4000)},
        "combo": {"rpn_pre_nms_topk": (pre_test, 4000),
                  "teacher_pre_nms_topk": 4000, "teacher_post_nms_topk": 1000,
                  "teacher_nms_candidates": 2048},
        "combo_hybrid": {"rpn_nms_impl": "hybrid",
                         "rpn_pre_nms_topk": (pre_test, 4000),
                         "teacher_pre_nms_topk": 4000,
                         "teacher_post_nms_topk": 1000,
                         "teacher_nms_candidates": 2048},
    }

    det0 = PTDetector(base_arch)
    params = det0.init(jax.random.key(0), canvas)
    state = TrainState(student=params, teacher=params,
                       opt_state={}, step=jnp.asarray(0, jnp.int32))
    state = load_weights(args.weights, state)
    # a source-only checkpoint's TEACHER slot is still at init (burn-in never
    # updates it; the boundary copy happens at mutual start) — the converged
    # model is the STUDENT, which is what the mutual phase copies into the
    # teacher at BURN_UP_STEP. Diagnose with that.
    teacher_params = state.student
    taus = tuple(cfg.UNSUPNET.TAU)

    def stats(pl):
        probs = jax.nn.softmax(pl.logits, axis=-1)[..., :-1]
        conf = jnp.max(probs, axis=-1)
        n_tau = float(jnp.sum((conf >= taus[0]) & pl.valid)) / args.n
        n_all = float(jnp.sum(pl.valid)) / args.n
        return n_all, n_tau

    results, ref_boxes = {}, None
    for name, over in variants.items():
        arch = base_arch.__class__(**{**base_arch.__dict__, **over})
        det = PTDetector(arch)
        pl = jax.jit(det.pseudo_labels)(teacher_params, batch)
        n_all, n_tau = stats(pl)
        probs = np.asarray(jax.nn.softmax(pl.logits, axis=-1)[..., :-1])
        conf = probs.max(-1)
        keep = (conf >= taus[0]) & np.asarray(pl.valid)
        boxes = [np.asarray(pl.boxes[i])[keep[i]] for i in range(args.n)]
        if name == "exact":
            ref_boxes = boxes
            recall = 1.0
        else:
            hit = tot = 0
            for i in range(args.n):
                if not len(ref_boxes[i]):
                    continue
                tot += len(ref_boxes[i])
                if len(boxes[i]):
                    iou = np.asarray(box_ops.pairwise_iou(
                        jnp.asarray(ref_boxes[i]), jnp.asarray(boxes[i])))
                    hit += int((iou.max(axis=1) >= 0.5).sum())
            recall = hit / max(tot, 1)
        results[name] = (n_all, n_tau, recall)
        print(f"{name:>22}: dets/img {n_all:5.1f}  conf>=tau/img {n_tau:5.1f}  "
              f"recall-vs-exact@0.5 {recall:5.1%}", flush=True)


if __name__ == "__main__":
    main()
