"""pycocotools-parity COCO evaluator tests (analytic goldens).

pycocotools is not importable in this environment; each case below is small
enough that the exact COCOeval output is derivable by hand from the published
algorithm (matcher in cocoeval.py, accumulate with the 101-point recall grid).
Reference behavior: pycocotools.cocoeval.COCOeval, used by detectron2's
COCOEvaluator at ``/root/reference/pt/engine/trainer.py:131-133``.
"""

import numpy as np
import pytest

from probabilisticteacher_tpu.cocoeval import COCOEvaluator, iou_xywh


def ev1(classes=("car",)):
    return COCOEvaluator(list(classes))


def test_iou_xywh_basic_and_crowd():
    d = np.array([[0.0, 0.0, 10.0, 10.0]])
    g = np.array([[0.0, 0.0, 10.0, 5.0]])
    iou = iou_xywh(d, g, np.array([False]))
    assert np.isclose(iou[0, 0], 50.0 / 100.0)  # inter 50, union 100+50-50
    # crowd: denominator is the det area alone
    d2 = np.array([[0.0, 0.0, 10.0, 10.0]])
    g2 = np.array([[0.0, 0.0, 100.0, 100.0]])
    assert np.isclose(iou_xywh(d2, g2, np.array([True]))[0, 0], 1.0)
    assert np.isclose(iou_xywh(d2, g2, np.array([False]))[0, 0], 100.0 / 10000.0)


def test_perfect_detection_all_metrics_100():
    ev = ev1()
    ev.add_ground_truth("a", np.array([[10, 10, 60, 60]]), np.array([0]))  # 50x50 medium
    ev.add_detections("a", np.array([[10, 10, 60, 60]]), np.array([0.9]), np.array([0]))
    r = ev.evaluate()
    assert np.isclose(r["bbox/AP"], 100.0)
    assert np.isclose(r["bbox/AP50"], 100.0)
    assert np.isclose(r["bbox/AP75"], 100.0)
    assert np.isclose(r["bbox/APm"], 100.0)   # 2500 px^2 -> medium
    assert np.isnan(r["bbox/APs"])            # no small GT -> -1 -> nan
    assert np.isnan(r["bbox/APl"])
    assert np.isclose(r["bbox/AR@1"], 100.0)
    assert np.isclose(r["mAP50"], 100.0)


def test_high_scoring_fp_after_tp_does_not_hurt_ap():
    # pycocotools property: TP at rank 1, FP at rank 2 -> rc=[1,1], pr=[1,.5];
    # searchsorted(left) hits the FIRST index with rc>=r -> precision 1.0 at every
    # recall point -> AP stays 100.
    ev = ev1()
    ev.add_ground_truth("a", np.array([[10, 10, 60, 60]]), np.array([0]))
    ev.add_detections("a", np.array([[10, 10, 60, 60], [200, 200, 250, 250]]),
                      np.array([0.9, 0.8]), np.array([0, 0]))
    r = ev.evaluate()
    assert np.isclose(r["bbox/AP"], 100.0)


def test_fp_ranked_above_tp_halves_ap():
    # FP at rank 1, TP at rank 2 -> rc=[0,1], pr=[0,.5]; envelope lifts pr[0] to .5;
    # every recall point reads 0.5 -> AP = 50.
    ev = ev1()
    ev.add_ground_truth("a", np.array([[10, 10, 60, 60]]), np.array([0]))
    ev.add_detections("a", np.array([[200, 200, 250, 250], [10, 10, 60, 60]]),
                      np.array([0.9, 0.8]), np.array([0, 0]))
    r = ev.evaluate()
    assert np.isclose(r["bbox/AP"], 50.0)
    assert np.isclose(r["bbox/AP50"], 50.0)


def test_iou_exactly_half_matches_only_t50():
    # det IoU = 0.5 with GT: matches at t=0.5 only (ious < thr skips; == passes)
    ev = ev1()
    ev.add_ground_truth("a", np.array([[0, 0, 100, 100]]), np.array([0]))
    ev.add_detections("a", np.array([[0, 0, 100, 50]]), np.array([0.9]), np.array([0]))
    r = ev.evaluate()
    assert np.isclose(r["bbox/AP50"], 100.0)
    assert np.isclose(r["bbox/AP75"], 0.0)
    assert np.isclose(r["bbox/AP"], 10.0)  # mean([100] + [0]*9)


def test_crowd_match_is_ignored_not_fp():
    ev = ev1()
    # one normal GT + one crowd region; det2 inside the crowd must not count as FP
    ev.add_ground_truth("a", np.array([[10, 10, 60, 60], [100, 100, 300, 300]]),
                        np.array([0, 0]), iscrowd=np.array([False, True]))
    ev.add_detections("a", np.array([[10, 10, 60, 60], [150, 150, 180, 180]]),
                      np.array([0.9, 0.8]), np.array([0, 0]))
    r = ev.evaluate()
    assert np.isclose(r["bbox/AP"], 100.0)

    # control: without the crowd flag the same det IS an FP ranked last -> AP 100
    # (rank-2 FP doesn't hurt), but with the det ranked FIRST AP drops
    ev2 = ev1()
    ev2.add_ground_truth("a", np.array([[10, 10, 60, 60], [100, 100, 300, 300]]),
                         np.array([0, 0]), iscrowd=np.array([False, True]))
    ev2.add_detections("a", np.array([[150, 150, 180, 180], [10, 10, 60, 60]]),
                       np.array([0.95, 0.8]), np.array([0, 0]))
    assert np.isclose(ev2.evaluate()["bbox/AP"], 100.0)  # ignored, not FP


def test_difficult_gt_excluded_from_npos_and_match_ignored():
    ev = ev1()
    ev.add_ground_truth("a", np.array([[10, 10, 60, 60], [100, 100, 160, 160]]),
                        np.array([0, 0]), difficult=np.array([False, True]))
    # perfect det on the normal GT; det on the difficult GT must be ignored
    ev.add_detections("a", np.array([[10, 10, 60, 60], [100, 100, 160, 160]]),
                      np.array([0.9, 0.8]), np.array([0, 0]))
    r = ev.evaluate()
    assert np.isclose(r["bbox/AP"], 100.0)
    assert np.isclose(r["bbox/AR@100"], 100.0)  # npos counts only the normal GT


def test_maxdets_limits_recall():
    ev = ev1()
    ev.add_ground_truth("a", np.array([[10, 10, 60, 60], [100, 100, 150, 150]]),
                        np.array([0, 0]))
    ev.add_detections("a", np.array([[10, 10, 60, 60], [100, 100, 150, 150]]),
                      np.array([0.9, 0.8]), np.array([0, 0]))
    r = ev.evaluate()
    assert np.isclose(r["bbox/AR@1"], 50.0)
    assert np.isclose(r["bbox/AR@10"], 100.0)
    assert np.isclose(r["bbox/AR@100"], 100.0)


def test_area_range_gt_ignored_and_unmatched_det_outside_range_ignored():
    ev = ev1()
    # small GT (20x20=400) and large GT (200x200=40000)
    ev.add_ground_truth("a", np.array([[0, 0, 20, 20], [300, 300, 500, 500]]),
                        np.array([0, 0]))
    # perfect det on each
    ev.add_detections("a", np.array([[0, 0, 20, 20], [300, 300, 500, 500]]),
                      np.array([0.9, 0.8]), np.array([0, 0]))
    r = ev.evaluate()
    assert np.isclose(r["bbox/APs"], 100.0)
    assert np.isclose(r["bbox/APl"], 100.0)
    assert np.isnan(r["bbox/APm"])
    assert np.isclose(r["bbox/AP"], 100.0)

    # an unmatched LARGE det must not poison the small-area AP
    ev.add_detections("a", np.array([[0, 300, 200, 500]]), np.array([0.95]),
                      np.array([0]))
    r2 = ev.evaluate()
    assert np.isclose(r2["bbox/APs"], 100.0)


def test_multiclass_mean_excludes_absent_class():
    ev = COCOEvaluator(["car", "person"])
    ev.add_ground_truth("a", np.array([[10, 10, 60, 60]]), np.array([0]))
    ev.add_detections("a", np.array([[10, 10, 60, 60]]), np.array([0.9]), np.array([0]))
    r = ev.evaluate()
    # person has no GT anywhere -> precision -1 -> excluded from the mean
    assert np.isclose(r["bbox/AP"], 100.0)
    assert np.isclose(r["AP50-car"], 100.0)
    assert np.isnan(r["AP50-person"])


def test_match_prefers_higher_iou_not_first():
    # two GTs overlap the det; the greedy matcher must take the higher-IoU one,
    # leaving the other for the second det.
    ev = ev1()
    ev.add_ground_truth("a", np.array([[0, 0, 100, 100], [0, 0, 100, 52]]),
                        np.array([0, 0]))
    ev.add_detections("a", np.array([[0, 0, 100, 50], [0, 0, 100, 100]]),
                      np.array([0.9, 0.8]), np.array([0, 0]))
    r = ev.evaluate()
    # det1 (0.9) matches GT2 (IoU 50/52~0.96) not GT1 (0.5); det2 matches GT1 -> AP50=100
    assert np.isclose(r["bbox/AP50"], 100.0)


def test_factory_routes_coco_style():
    from probabilisticteacher_tpu.evaluation import DetectionEvaluator

    ev = DetectionEvaluator(["car"], style="coco")
    assert isinstance(ev, COCOEvaluator)
    ev.add_ground_truth("a", np.array([[10, 10, 60, 60]]), np.array([0]))
    ev.add_detections("a", np.array([[10, 10, 60, 60]]), np.array([0.9]), np.array([0]))
    r = ev.evaluate()
    assert {"bbox/AP", "bbox/AP50", "bbox/AP75", "bbox/APs", "bbox/APm", "bbox/APl",
            "bbox/AR@1", "bbox/AR@10", "bbox/AR@100"} <= set(r)
