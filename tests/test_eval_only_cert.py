"""CLI-level released-weights certification path (VERDICT r4 Next #7).

Drives a synthetic detectron2-format EnsembleTSModel checkpoint through the
real CLI — ``train_net.py --eval-only MODEL.WEIGHTS <ckpt.pth>`` — the exact
command a user runs to certify the published reference weights
(``/root/reference/train_net.py:63-74`` builds the ensemble, loads
``cfg.MODEL.WEIGHTS`` through DetectionCheckpointer, and evaluates
``modelStudent``). Library-level import parity (layout conversions, bit-equal
detect outputs) is proved in test_d2_import.py; this test proves the
end-to-end wiring: CLI args -> PTrainer.resume_or_load -> is_d2_checkpoint ->
load_detectron2_weights -> test() -> mAP dict. docs/get_started.md
"Certifying the released weights" documents the same command at full scale.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from synthetic_data import CLASSES, make_voc_dataset
from test_d2_import import _reference_state_dict

from probabilisticteacher_tpu.data.datasets import register_pascal_voc


def test_cli_eval_only_with_d2_ensemble(tmp_path):
    import train_net

    from probabilisticteacher_tpu.config import get_cfg
    from probabilisticteacher_tpu.modeling.detector import Arch, PTDetector

    root = str(tmp_path)
    make_voc_dataset(os.path.join(root, "val"), "val", num_images=2, seed=11)
    register_pascal_voc("cert_v", os.path.join(root, "val"), "val", CLASSES)

    # the "released" checkpoint: reference-named EnsembleTSModel state_dict
    # built for the SAME arch the CLI overrides below produce
    cfg = get_cfg()
    cfg.MODEL.VGG.DEPTH = 11
    cfg.MODEL.VGG.PRETRAIN = ""
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 8
    det = PTDetector(Arch.from_cfg(cfg))
    student = _reference_state_dict(det, seed=21)
    teacher = _reference_state_dict(det, seed=22)
    full = {f"modelStudent.{k}": v for k, v in student.items()}
    full.update({f"modelTeacher.{k}": v for k, v in teacher.items()})
    ckpt = os.path.join(root, "released.pth")
    torch.save({"model": full, "iteration": 59999}, ckpt)

    args = train_net.parse_args([
        "--eval-only",
        "MODEL.WEIGHTS", ckpt,
        "OUTPUT_DIR", os.path.join(root, "out"),
        "MODEL.VGG.DEPTH", "11", "MODEL.VGG.PRETRAIN", "''",
        "MODEL.ROI_HEADS.NUM_CLASSES", "8",
        "MODEL.RPN.PRE_NMS_TOPK_TEST", "64",
        "MODEL.RPN.POST_NMS_TOPK_TEST", "32",
        "TEST.DETECTIONS_PER_IMAGE", "8",
        "TEST.EVALUATOR", "VOCeval",
        "SOLVER.IMG_PER_BATCH_LABEL", "2", "SOLVER.IMG_PER_BATCH_UNLABEL", "2",
        "PARALLEL.ALLOW_DEVICE_SUBSET", "True",
        "INPUT.MIN_SIZE_TEST", "48", "INPUT.MAX_SIZE_TEST", "96",
        "INPUT.CANVAS.WIDE", "(48, 96)", "INPUT.CANVAS.TALL", "(96, 48)",
        "DATASETS.TEST", "('cert_v',)",
        "DATASETS.TRAIN_LABEL", "('cert_v',)",
        "DATASETS.TRAIN_UNLABEL", "('cert_v',)",
    ])
    res = train_net.main(args)

    # the CLI returned the evaluator's result dict (reference returns res too)
    assert res is not None and "mAP50" in res, res
    assert np.isfinite(res["mAP50"]), res
    # and the weights really came from the .pth: the run log records the load
    log = open(os.path.join(root, "out", "log.txt")).read()
    assert "Loaded weights from" in log and "released.pth" in log
