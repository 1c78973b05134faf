"""End-to-end smoke tests: data pipeline, trainer loop (burn-in + mutual), CLI, eval.

This is the SURVEY.md section 4 "smoke run on a synthetic 2-image VOC dataset"
strategy, exercising the full stack the way train.sh does, at micro scale.
"""

import os
import sys

import numpy as np
import pytest

from probabilisticteacher_tpu.config import get_cfg
from probabilisticteacher_tpu.data.datasets import (DatasetCatalog,
                                                    load_voc_instances,
                                                    register_pascal_voc)
from probabilisticteacher_tpu.data.loader import SemiSupLoader, TestLoader

from synthetic_data import CLASSES, make_voc_dataset


def micro_cfg(tmp, label_name, unlabel_name, test_name):
    cfg = get_cfg()
    cfg.OUTPUT_DIR = os.path.join(tmp, "output")
    cfg.MODEL.VGG.DEPTH = 11
    cfg.MODEL.VGG.PRETRAIN = ""
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 8
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.UNSUPNET.UNSUP_ROI_BUDGET = 8
    cfg.UNSUPNET.BURN_UP_STEP = 2
    cfg.UNSUPNET.EMA_KEEP_RATE = 0.5
    cfg.SOLVER.MAX_ITER = 4
    cfg.SOLVER.IMG_PER_BATCH_LABEL = 2
    cfg.SOLVER.IMG_PER_BATCH_UNLABEL = 2
    # micro batches on the 8-virtual-device CPU mesh: opt into the subset
    cfg.PARALLEL.ALLOW_DEVICE_SUBSET = True
    cfg.SOLVER.BASE_LR = 0.001
    cfg.SOLVER.CHECKPOINT_PERIOD = 4
    cfg.SOLVER.AMP.ENABLED = False
    cfg.TEST.EVAL_PERIOD = 4  # exercise periodic eval of BOTH models once
    cfg.TEST.EVALUATOR = "VOCeval"
    cfg.INPUT.MIN_SIZE_TRAIN = (48,)
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.INPUT.CANVAS.WIDE = (48, 96)
    cfg.INPUT.CANVAS.TALL = (96, 48)
    cfg.INPUT.MAX_GT = 8
    cfg.DATASETS.TRAIN_LABEL = (label_name,)
    cfg.DATASETS.TRAIN_UNLABEL = (unlabel_name,)
    cfg.DATASETS.TEST = (test_name,)
    return cfg


@pytest.fixture(scope="module")
def voc_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("voc"))
    make_voc_dataset(os.path.join(root, "src"), "train", num_images=4, seed=0)
    make_voc_dataset(os.path.join(root, "tgt"), "train", num_images=4, seed=1)
    make_voc_dataset(os.path.join(root, "val"), "val", num_images=2, seed=2)
    return root


def test_voc_parser(voc_tree):
    dicts = load_voc_instances(os.path.join(voc_tree, "src"), "train", CLASSES)
    assert len(dicts) == 4
    d = dicts[0]
    assert os.path.exists(d["file_name"])
    assert d["height"] == 80 and d["width"] == 120
    assert len(d["annotations"]) == 3
    for a in d["annotations"]:
        x1, y1, x2, y2 = a["bbox"]
        assert 0 <= x1 < x2 <= 120 and 0 <= y1 < y2 <= 80
        assert 0 <= a["category_id"] < 8


def test_semisup_loader(voc_tree):
    cfg = micro_cfg(voc_tree, "l", "u", "v")
    label = load_voc_instances(os.path.join(voc_tree, "src"), "train", CLASSES)
    unlabel = load_voc_instances(os.path.join(voc_tree, "tgt"), "train", CLASSES)
    loader = SemiSupLoader(cfg, label, unlabel, seed=0)
    batch = next(iter(loader))
    li, ui = batch["label"], batch["unlabel"]
    assert li["image"].shape == (2, 48, 96, 3)
    assert ui["image"].shape == (2, 48, 96, 3)
    assert li["gt_boxes"].shape == (2, 8, 4)
    assert li["gt_valid"].any()
    # boxes inside the valid region
    for i in range(2):
        hw = li["image_hw"][i]
        v = li["gt_valid"][i]
        assert (li["gt_boxes"][i][v][:, 2] <= hw[1] + 1e-5).all()
        assert (li["gt_boxes"][i][v][:, 3] <= hw[0] + 1e-5).all()


@pytest.mark.slow
def test_trainer_end_to_end(voc_tree, tmp_path):
    """Full loop: 2 burn-in + 2 mutual steps, checkpoint, eval, resume."""
    name = "synttrain_e2e"
    register_pascal_voc(name + "_l", os.path.join(voc_tree, "src"), "train", CLASSES)
    register_pascal_voc(name + "_u", os.path.join(voc_tree, "tgt"), "train", CLASSES)
    register_pascal_voc(name + "_v", os.path.join(voc_tree, "val"), "val", CLASSES)
    cfg = micro_cfg(str(tmp_path), name + "_l", name + "_u", name + "_v")
    cfg.freeze()

    from probabilisticteacher_tpu.engine.trainer import PTrainer

    trainer = PTrainer(cfg)
    trainer.resume_or_load(resume=False)
    results = trainer.train()
    assert "mAP50" in results
    assert np.isfinite(results["mAP50"])
    assert int(trainer.state.step) == 4
    # checkpoint written + marker
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "last_checkpoint"))
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))

    # resume restores the step counter
    trainer2 = PTrainer(cfg)
    trainer2.resume_or_load(resume=True)
    assert trainer2.start_iter == 4

    # LossEvalHook-equivalent: mean supervised losses over the val set
    vl = trainer2.validation_loss(trainer2.state.student, name + "_v", max_batches=2)
    assert set(vl) == {"val_loss_rpn_cls", "val_loss_rpn_loc", "val_loss_cls", "val_loss_box_reg"}
    assert all(np.isfinite(v) for v in vl.values())


def test_mapper_random_crop(voc_tree):
    """INPUT.CROP path (dataset_mapper.py:51-59; off in all PT configs)."""
    from probabilisticteacher_tpu.data.loader import Mapper, random_crop

    img = np.zeros((80, 120, 3), np.uint8)
    boxes = np.asarray([[10.0, 10.0, 60.0, 50.0]], np.float32)
    rng = np.random.Generator(np.random.PCG64(0))
    out, ob = random_crop(img, boxes.copy(), "relative", (0.5, 0.5), rng)
    assert out.shape == (40, 60, 3)
    assert (ob[:, 0::2] <= 60).all() and (ob[:, 1::2] <= 40).all()
    out2, _ = random_crop(img, boxes.copy(), "absolute", (32, 48), rng)
    assert out2.shape == (32, 48, 3)

    cfg = micro_cfg(voc_tree, "l", "u", "v")
    cfg.INPUT.CROP.ENABLED = True
    m = Mapper(cfg, is_train=True)
    assert not m.use_native  # crop falls back to the PIL path
    from probabilisticteacher_tpu.data.datasets import load_voc_instances
    from synthetic_data import CLASSES
    d = load_voc_instances(os.path.join(voc_tree, "src"), "train", CLASSES)[0]
    rec = m(d, rng)
    assert rec["image"].shape == (48, 96, 3)


def test_unlabeled_stream_without_annotations(voc_tree):
    """COCO-unlabeled-style target stream: records with no annotations flow through."""
    cfg = micro_cfg(voc_tree, "l", "u", "v")
    label = load_voc_instances(os.path.join(voc_tree, "src"), "train", CLASSES)
    unlabel = load_voc_instances(os.path.join(voc_tree, "tgt"), "train", CLASSES)
    for d in unlabel:
        d["annotations"] = []  # unlabeled: images only (builtin.py:86-118)
    loader = SemiSupLoader(cfg, label, unlabel, seed=0)
    batch = next(iter(loader))
    assert not batch["unlabel"]["gt_valid"].any()
    assert batch["label"]["gt_valid"].any()


def test_multi_dataset_eval_prefixes(voc_tree, tmp_path):
    """With >1 DATASETS.TEST entries, results are dataset-prefixed (detectron2
    multi-dataset convention) so a second test set cannot overwrite the first."""
    register_pascal_voc("mde_l", os.path.join(voc_tree, "src"), "train", CLASSES)
    register_pascal_voc("mde_v1", os.path.join(voc_tree, "val"), "val", CLASSES)
    register_pascal_voc("mde_v2", os.path.join(voc_tree, "src"), "train", CLASSES)
    cfg = micro_cfg(str(tmp_path), "mde_l", "mde_l", "mde_v1")
    cfg.DATASETS.TEST = ("mde_v1", "mde_v2")
    cfg.TEST.EVAL_PERIOD = 0
    cfg.freeze()

    from probabilisticteacher_tpu.engine.trainer import PTrainer

    trainer = PTrainer(cfg)
    res = trainer.test(trainer.state.student)
    assert any(k.startswith("mde_v1/") for k in res)
    assert any(k.startswith("mde_v2/") for k in res)
    assert "mde_v1/mAP50" in res and "mde_v2/mAP50" in res
