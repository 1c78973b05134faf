#!/usr/bin/env python
"""Isolate which throughput lever degrades teacher pseudo-labels.

Loads the proxy source-only checkpoint on CPU, runs the teacher weak pass
(`pseudo_labels`) on real foggy proxy images under each lever config, and
compares against the exact path: pseudo-box counts above the confidence taus,
and greedy IoU agreement with the exact set. Run after a proxy collapse to
attribute it (hybrid RPN NMS vs teacher budgets vs candidate prefilter)
without spending chip time on full 3000-iter ablations.

Blind spot: this sees only the TEACHER weak pass. Levers that touch the
student's training path (PRE_NMS_TOPK_TRAIN, hybrid NMS during training) need
`diagnose_student_path.py` as well — run J degraded with 100% recall here.

Usage: python scripts/diagnose_levers.py [--n 8] [--short 480]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _proxy_common import REPO, load_proxy_setup

import jax
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

    from probabilisticteacher_tpu.modeling.detector import PTDetector
    from probabilisticteacher_tpu.ops import boxes as box_ops

    cfg, base_arch, teacher_params, batch, _ = load_proxy_setup(
        args.n, args.short, args.data, args.weights)
    taus = tuple(cfg.UNSUPNET.TAU)

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
        # run-K production candidate: teacher-side only, student bit-exact
        "teacher1000_cand2048": {"teacher_pre_nms_topk": 6000,
                                 "teacher_post_nms_topk": 1000,
                                 "teacher_nms_candidates": 2048},
    }

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
