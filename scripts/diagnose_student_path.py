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

    # labeled foggy-train records: the student's unsup view domain (the sup
    # path sees cityscapes-clean; foggy is the harder of the two for the RPN)
    records = load_voc_instances(
        os.path.join(args.data, "data/VOC2007_foggytrain"), "train", CLASS_NAMES_8)
    mapper = Mapper(cfg, is_train=True)
    rng = np.random.default_rng(0)
    imgs = []
    for rec in records:
        out = mapper(rec, rng)
        if out["image"].shape[:2] == canvas and int(out["gt_valid"].sum()) > 0:
            imgs.append(out)
        if len(imgs) == args.n:
            break
    assert len(imgs) == args.n, f"only {len(imgs)} wide-canvas records with gt"
    batch = ImageBatch(
        image=jnp.asarray(np.stack([o["image"] for o in imgs]).astype(np.float32)),
        image_hw=jnp.asarray(np.stack([o["image_hw"] for o in imgs])),
    )
    gts = [np.asarray(o["gt_boxes"])[np.asarray(o["gt_valid"]).astype(bool)]
           for o in imgs]

    base_arch = Arch.from_cfg(cfg)
    pre_test = base_arch.rpn_pre_nms_topk[0]
    variants = {
        "exact (pre 6000)": {},
        "pre4000": {"rpn_pre_nms_topk": (pre_test, 4000)},
        "hybrid": {"rpn_nms_impl": "hybrid"},
        "hybrid+pre4000": {"rpn_nms_impl": "hybrid",
                           "rpn_pre_nms_topk": (pre_test, 4000)},
        "pre2000": {"rpn_pre_nms_topk": (pre_test, 2000)},
    }

    det0 = PTDetector(base_arch)
    params = det0.init(jax.random.key(0), canvas)
    state = TrainState(student=params, teacher=params,
                       opt_state={}, step=jnp.asarray(0, jnp.int32))
    state = load_weights(args.weights, state)
    student = state.student  # converged source-only model (see diagnose_levers)

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
