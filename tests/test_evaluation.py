"""Evaluator golden tests (VOC07 11-point AP protocol)."""

import numpy as np

from probabilisticteacher_tpu.evaluation import DetectionEvaluator, _voc_ap


def test_voc_ap_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert abs(_voc_ap(rec, prec, True) - 1.0) < 1e-9


def test_voc_ap_known_value():
    # one TP then one FP over 2 gt: rec [0.5, 0.5], prec [1.0, 0.5]
    rec = np.array([0.5, 0.5])
    prec = np.array([1.0, 0.5])
    # 11-pt: t in {0,...,0.5} -> p=1 (6 points), t>0.5 -> 0 => AP = 6/11
    assert abs(_voc_ap(rec, prec, True) - 6 / 11) < 1e-9


def test_evaluator_end_to_end():
    ev = DetectionEvaluator(["car", "person"], style="voc")
    ev.add_ground_truth("img1", np.array([[10, 10, 50, 50], [60, 60, 90, 90]]),
                        np.array([0, 1]))
    ev.add_ground_truth("img2", np.array([[0, 0, 30, 30]]), np.array([0]))
    # perfect car detections, one false person detection scoring higher than none
    ev.add_detections("img1", np.array([[10, 10, 50, 50]]), np.array([0.9]), np.array([0]))
    ev.add_detections("img2", np.array([[0, 0, 30, 30]]), np.array([0.8]), np.array([0]))
    ev.add_detections("img1", np.array([[0, 0, 5, 5]]), np.array([0.7]), np.array([1]))
    res = ev.evaluate()
    assert abs(res["AP50-car"] - 100.0) < 1e-6
    assert res["AP50-person"] == 0.0
    assert abs(res["mAP50"] - 50.0) < 1e-6


def test_evaluator_duplicate_detection_is_fp():
    ev = DetectionEvaluator(["car"], style="voc")
    ev.add_ground_truth("img1", np.array([[10, 10, 50, 50]]), np.array([0]))
    # two detections on the same gt: second is a FP (VOC greedy matching)
    ev.add_detections("img1", np.array([[10, 10, 50, 50], [11, 11, 51, 51]]),
                      np.array([0.9, 0.8]), np.array([0, 0]))
    res = ev.evaluate()
    assert abs(res["AP50-car"] - 100.0) < 1e-6  # recall 1 reached at rank 1


def test_evaluator_difficult_ignored():
    ev = DetectionEvaluator(["car"], style="voc")
    ev.add_ground_truth("img1", np.array([[10, 10, 50, 50], [60, 60, 90, 90]]),
                        np.array([0, 0]), difficult=np.array([False, True]))
    ev.add_detections("img1", np.array([[10, 10, 50, 50], [60, 60, 90, 90]]),
                      np.array([0.9, 0.8]), np.array([0, 0]))
    res = ev.evaluate()
    # difficult gt: not counted in npos, its detection neither TP nor FP
    assert abs(res["AP50-car"] - 100.0) < 1e-6


def test_coco_style_runs():
    ev = DetectionEvaluator(["car"], style="coco")
    ev.add_ground_truth("img1", np.array([[10, 10, 50, 50]]), np.array([0]))
    ev.add_detections("img1", np.array([[10, 10, 50, 50]]), np.array([0.9]), np.array([0]))
    res = ev.evaluate()
    assert res["bbox/AP50"] > 99.0
    assert res["bbox/AP"] > 99.0
