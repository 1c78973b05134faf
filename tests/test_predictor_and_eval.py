"""Predictor API + batched EvalLoader tests (CPU, tiny shapes)."""

import os
import sys

import numpy as np
import pytest

from probabilisticteacher_tpu.config import get_cfg
from probabilisticteacher_tpu.data.datasets import load_voc_instances
from probabilisticteacher_tpu.data.loader import EvalLoader

from synthetic_data import CLASSES, make_voc_dataset


def tiny_cfg():
    cfg = get_cfg()
    cfg.MODEL.VGG.DEPTH = 11
    cfg.MODEL.VGG.PRETRAIN = ""
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.INPUT.CANVAS.WIDE = (48, 96)
    cfg.INPUT.CANVAS.TALL = (96, 48)
    cfg.INPUT.MAX_GT = 8
    return cfg


def test_eval_loader_batched_padding(tmp_path):
    root = make_voc_dataset(str(tmp_path / "d"), "val", num_images=3, seed=4)
    dicts = load_voc_instances(root, "val", CLASSES)
    cfg = tiny_cfg()
    cfg.TEST.IMS_PER_BATCH = 2
    batches = list(EvalLoader(cfg, dicts))
    # 3 wide images at batch 2 -> 2 batches, second padded with image_id None
    assert len(batches) == 2
    assert all(b["image"].shape[0] == 2 for b in batches)
    ids = [i for b in batches for i in b["image_id"]]
    assert ids.count(None) == 1
    assert len([i for i in ids if i is not None]) == 3


def test_predictor_roundtrip():
    import jax

    from probabilisticteacher_tpu.predictor import Predictor

    cfg = tiny_cfg()
    pred = Predictor(cfg)
    img = np.random.RandomState(0).randint(0, 255, (60, 100, 3)).astype(np.uint8)
    out = pred(img)
    assert set(out) == {"boxes", "scores", "classes"}
    if len(out["boxes"]):
        assert (out["boxes"][:, 2] <= 100 + 1e-3).all()
        assert (out["boxes"][:, 3] <= 60 + 1e-3).all()
        assert (out["scores"] >= 0).all()
