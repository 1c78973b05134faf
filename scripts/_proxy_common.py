"""Shared setup for the zero-cost lever diagnostics (diagnose_levers.py /
diagnose_student_path.py): proxy config, wide-canvas image batch from the real
foggy proxy set, and the converged source-only student weights.

Kept in one place so the two diagnostics can never desynchronize on the proxy
overrides, the canvas selection, or the checkpoint-slot subtlety below.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def load_proxy_setup(n, short, data_root, weights, require_gt=False):
    """Returns (cfg, base_arch, student_params, batch, img_dicts).

    ``student_params``: a source-only checkpoint's TEACHER slot is still at
    init (burn-in never updates it; the boundary copy happens at mutual
    start) — the converged model is the STUDENT, which is what the mutual
    phase copies into the teacher at BURN_UP_STEP. Diagnose with that.
    """
    from probabilisticteacher_tpu.checkpoint import load_weights
    from probabilisticteacher_tpu.config import get_cfg
    from probabilisticteacher_tpu.data.datasets import (CLASS_NAMES_8,
                                                        load_voc_instances)
    from probabilisticteacher_tpu.data.loader import Mapper
    from probabilisticteacher_tpu.engine.steps import TrainState
    from probabilisticteacher_tpu.modeling.detector import Arch, PTDetector
    from probabilisticteacher_tpu.structures import ImageBatch

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs/pt/final_c2f.yaml"))
    cfg.merge_from_list([
        "UNSUPNET.TAU", "[0.5,0.5]",
        "MODEL.ANCHOR_GENERATOR.NAME", "DifferentiableAnchorGenerator",
        "MODEL.VGG.PRETRAIN", "",
        "INPUT.MIN_SIZE_TRAIN", f"({short},)",
        "INPUT.CANVAS.WIDE", f"({short}, {short * 992 // 480})",
        "INPUT.CANVAS.TALL", f"({short * 992 // 480}, {short})",
        "SOLVER.AMP.ENABLED", "False",
    ])
    canvas = (short, short * 992 // 480)

    records = load_voc_instances(
        os.path.join(data_root, "data/VOC2007_foggytrain"), "train",
        CLASS_NAMES_8)
    mapper = Mapper(cfg, is_train=True)
    rng = np.random.default_rng(0)
    imgs = []
    for rec in records:
        out = mapper(rec, rng)
        if out["image"].shape[:2] == canvas and (
                not require_gt or int(out["gt_valid"].sum()) > 0):
            imgs.append(out)
        if len(imgs) == n:
            break
    assert len(imgs) == n, f"only {len(imgs)} usable wide-canvas records"
    batch = ImageBatch(
        image=jnp.asarray(np.stack([o["image"] for o in imgs]).astype(np.float32)),
        image_hw=jnp.asarray(np.stack([o["image_hw"] for o in imgs])),
    )

    base_arch = Arch.from_cfg(cfg)
    det0 = PTDetector(base_arch)
    params = det0.init(jax.random.key(0), canvas)
    state = TrainState(student=params, teacher=params,
                       opt_state={}, step=jnp.asarray(0, jnp.int32))
    state = load_weights(weights, state)
    return cfg, base_arch, state.student, batch, imgs
