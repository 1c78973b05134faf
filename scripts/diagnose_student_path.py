#!/usr/bin/env python
"""Quantify what a throughput lever does to the STUDENT's training path.

`diagnose_levers.py` measures the teacher weak pass (pseudo-label recall),
which is blind to levers that reshape the student's proposal distribution —
exactly the blind spot run J exposed for `MODEL.RPN.PRE_NMS_TOPK_TRAIN 4000`
(REPORT_accuracy.md round 3). This script runs the student RPN proposal path
in TRAINING mode (train budgets, sigma-rescored NMS) on real labeled proxy
images and reports, per lever variant:

  * gt-recall@0.5 — fraction of GT boxes covered by >=1 post-NMS proposal at
    IoU >= 0.5: an upper bound on which objects can contribute foreground ROI
    samples at all (matcher fg threshold is 0.5, `ops/matcher.py`);
  * fg-pool/img — mean number of proposals with max-IoU-to-GT >= 0.5: the
    candidate pool the 512@0.25 ROI subsample draws its foregrounds from;
  * agreement-vs-exact — fraction of the parity path's proposals reproduced
    (IoU >= 0.9 match): how far the lever moves the training distribution.

CPU-only, seconds per variant — run before spending a 3000-iter chip
ablation on any lever that touches the student path.

Usage: python scripts/diagnose_student_path.py [--n 8] [--short 480]
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

    # labeled foggy-train records: the student's unsup view domain (the sup
    # path sees cityscapes-clean; foggy is the harder of the two for the RPN)
    _, base_arch, student, batch, imgs = load_proxy_setup(
        args.n, args.short, args.data, args.weights, require_gt=True)
    gts = [np.asarray(o["gt_boxes"])[np.asarray(o["gt_valid"]).astype(bool)]
           for o in imgs]

    pre_test = base_arch.rpn_pre_nms_topk[0]
    variants = {
        "exact (pre 6000)": {},
        "pre4000": {"rpn_pre_nms_topk": (pre_test, 4000)},
        "hybrid": {"rpn_nms_impl": "hybrid"},
        "hybrid+pre4000": {"rpn_nms_impl": "hybrid",
                           "rpn_pre_nms_topk": (pre_test, 4000)},
        "pre2000": {"rpn_pre_nms_topk": (pre_test, 2000)},
    }

    def proposals_for(arch):
        det = PTDetector(arch)

        def fwd(params, images):
            feat = det.features(params, images)
            obj, deltas = det.rpn_predict(params, feat)
            anchors = det.anchors(params, feat.shape[1], feat.shape[2])
            return det.predict_proposals(anchors, obj, deltas, images.image_hw,
                                         training=True, grid_hw=feat.shape[1:3])

        pr = jax.jit(fwd)(student, batch)
        return [np.asarray(pr.boxes[i])[np.asarray(pr.valid[i]).astype(bool)]
                for i in range(args.n)]

    ref = None
    for name, over in variants.items():
        props = proposals_for(base_arch.__class__(**{**base_arch.__dict__, **over}))
        gt_hit = gt_tot = 0
        fg_pool = 0.0
        agree_hit = agree_tot = 0
        for i in range(args.n):
            if len(gts[i]):
                iou = np.asarray(box_ops.pairwise_iou(
                    jnp.asarray(gts[i]), jnp.asarray(props[i])))
                gt_tot += len(gts[i])
                gt_hit += int((iou.max(axis=1) >= 0.5).sum())
                fg_pool += int((iou.max(axis=0) >= 0.5).sum())
            if ref is not None and len(ref[i]) and len(props[i]):
                aiou = np.asarray(box_ops.pairwise_iou(
                    jnp.asarray(ref[i]), jnp.asarray(props[i])))
                agree_tot += len(ref[i])
                agree_hit += int((aiou.max(axis=1) >= 0.9).sum())
        if ref is None:
            ref, agree = props, 1.0
        else:
            agree = agree_hit / max(agree_tot, 1)
        print(f"{name:>18}: gt-recall@0.5 {gt_hit / max(gt_tot, 1):6.1%}  "
              f"fg-pool/img {fg_pool / args.n:7.1f}  "
              f"agreement-vs-exact@0.9 {agree:6.1%}", flush=True)


if __name__ == "__main__":
    main()
