"""Import detectron2/reference-format checkpoints (.pth / .pkl) into our pytree.

The reference evaluates its published results by loading torch-format
checkpoints through ``MODEL.WEIGHTS`` with ``--eval-only``
(``/root/reference/train_net.py:62-70``): a ``DetectionTSCheckpointer`` restores
an ``EnsembleTSModel`` state_dict — ``modelTeacher.* + modelStudent.*`` —
or, for plain detector checkpoints, a student-only name-matched load with
shape-mismatch skipping (``/root/reference/pt/checkpoint/detection_checkpoint.py:24-103``).

This module is the TPU-native equivalent: it maps detectron2 parameter names
onto our flax param pytree, converting layouts on the way:

=============================================  =============================  ==========================
detectron2 name (student scope)                ours                           layout conversion
=============================================  =============================  ==========================
``backbone.vgg_blockB.0.convC.weight``         ``backbone.blockB_convC``      OIHW -> HWIO
``proposal_generator.rpn_head.conv.*``         ``rpn_head.conv``              OIHW -> HWIO
``proposal_generator.rpn_head.                 ``rpn_head.objectness``        OIHW -> HWIO
  objectness_logits.*``
``proposal_generator.rpn_head.                 ``rpn_head.deltas``            OIHW -> HWIO (A*8 channel
  anchor_deltas.*``                                                           order a*8+b matches,
                                                                              ``rpn.py:105-113``)
``roi_heads.box_head.fc1.weight``              ``box_head.fc1.kernel``        (F, C*P*P) CHW-flatten ->
                                                                              (P*P*C, F) HWC-flatten
``roi_heads.box_head.fc2.weight``              ``box_head.fc2.kernel``        (F_out, F_in) -> transpose
``roi_heads.box_predictor.cls_score.*``        ``predictor.cls_score``        transpose
``roi_heads.box_predictor.bbox_pred.*``        ``predictor.bbox_pred``        transpose (K blocks of
                                                                              [4 mean, 4 sigma] match,
                                                                              ``fast_rcnn.py:60-64``)
``proposal_generator.anchor_generator.         ``anchor_wh``                  none ((A, 2) w/h table,
  anchor_0``                                                                  ``anchor_generator.py:69``)
=============================================  =============================  ==========================

``pixel_mean`` / ``pixel_std`` buffers and ``anchor_generator.cell_anchors*``
are intentionally ignored (config-derived here, mirroring the reference's
explicit ignore at ``detection_checkpoint.py:41-49``). Keys whose shape does
not match the model are skipped with a warning (fvcore semantics,
``detection_checkpoint.py:87-94``). Caffe2-author ``.pkl`` files with raw
Caffe2 layer names are NOT handled — use ``checkpoint.load_vgg_caffe`` for the
published VGG backbone init; every PT-released detector checkpoint is a torch
save with detectron2 names.
"""

from __future__ import annotations

import logging
import pickle
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger("probabilisticteacher_tpu")

# flat numpy state dict: d2 name -> array
StateDict = Dict[str, np.ndarray]

_IGNORED = re.compile(
    r"^(pixel_mean|pixel_std|proposal_generator\.anchor_generator\.cell_anchors.*)$"
)


def read_checkpoint_file(path: str) -> StateDict:
    """Read a torch ``.pth`` or detectron2 ``.pkl`` into a flat numpy dict.

    Accepts the wrapper layouts the reference's checkpointer sees: a raw
    state_dict, ``{"model": state_dict, ...}`` (fvcore save format; extra keys
    like optimizer/scheduler/iteration are dropped), torch tensors or numpy
    arrays as values.
    """
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        if isinstance(data, dict) and data.get("__author__") == "Caffe2":
            raise ValueError(
                f"{path} is a Caffe2-format checkpoint with Caffe2 layer names; "
                "only detectron2-named checkpoints are supported here "
                "(use checkpoint.load_vgg_caffe for the VGG backbone init)")
    else:
        import torch

        data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict) and "model" in data and isinstance(data["model"], dict):
        data = data["model"]
    if not isinstance(data, dict):
        raise ValueError(f"{path}: unsupported checkpoint structure {type(data)}")
    out: StateDict = {}
    for k, v in data.items():
        if hasattr(v, "detach"):  # torch tensor
            v = v.detach().cpu().numpy()
        if isinstance(v, np.ndarray):
            out[k] = v
    return out


def split_ensemble(sd: StateDict) -> Tuple[Optional[StateDict], Optional[StateDict]]:
    """Split an EnsembleTSModel state_dict into (student, teacher) scopes.

    Returns (sd, None) when the dict is a plain single-model state_dict.
    ``module.`` DDP prefixes are stripped first (the reference strips them in
    ``_load_student_model``, ``detection_checkpoint.py:83``).
    """
    sd = {re.sub(r"^module\.", "", k): v for k, v in sd.items()}
    student = {k[len("modelStudent."):]: v for k, v in sd.items()
               if k.startswith("modelStudent.")}
    teacher = {k[len("modelTeacher."):]: v for k, v in sd.items()
               if k.startswith("modelTeacher.")}
    if student or teacher:
        return (student or None), (teacher or None)
    return sd, None


def _conv_kernel(arr: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(arr.transpose(2, 3, 1, 0))  # OIHW -> HWIO


def _fc1_kernel(arr: np.ndarray, pooler_resolution: int) -> np.ndarray:
    """torch Linear weight (F, C*P*P) with channel-first flatten -> our
    structured-dense kernel (P*P*C, F) with channel-last flatten."""
    f = arr.shape[0]
    p = pooler_resolution
    c = arr.shape[1] // (p * p)
    return np.ascontiguousarray(
        arr.reshape(f, c, p, p).transpose(2, 3, 1, 0).reshape(p * p * c, f))


def _linear_kernel(arr: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(arr.T)  # (out, in) -> (in, out)


def d2_to_params(sd: StateDict, params: Any,
                 pooler_resolution: int = 7) -> Tuple[Any, Dict[str, List]]:
    """Map a detectron2-named flat state_dict onto a copy of ``params``.

    Returns ``(new_params, report)`` where report lists ``matched``,
    ``missing`` (model keys not found in the checkpoint), ``unexpected``
    (checkpoint keys with no model target), and ``incorrect_shapes``
    (skipped, keeping the model's init — fvcore parity).
    """
    new = _deep_copy_dicts(params)
    matched: List[str] = []
    unexpected: List[str] = []
    incorrect: List[Tuple[str, tuple, tuple]] = []
    filled = set()

    for key, arr in sd.items():
        if _IGNORED.match(key):
            continue
        target = _route(key, pooler_resolution)
        if target is None:
            unexpected.append(key)
            continue
        path, convert = target
        slot = _get_path(new, path)
        if slot is None:
            unexpected.append(key)
            continue
        conv = convert(arr)
        if tuple(np.shape(slot)) != tuple(conv.shape):
            incorrect.append((key, tuple(conv.shape), tuple(np.shape(slot))))
            continue
        _set_path(new, path, conv.astype(_dtype_of(slot)))
        matched.append(key)
        filled.add(path)

    missing = [".".join(p) for p in _leaf_paths(params) if p not in filled]
    report = {"matched": matched, "missing": missing,
              "unexpected": unexpected, "incorrect_shapes": incorrect}
    if incorrect:
        for k, cs, ms in incorrect:
            logger.warning(f"d2 import: shape mismatch for {k}: checkpoint "
                           f"{cs} vs model {ms}; keeping model init")
    if unexpected:
        logger.info(f"d2 import: {len(unexpected)} unexpected checkpoint keys "
                    f"(e.g. {unexpected[:3]})")
    if missing:
        logger.warning(f"d2 import: model params not in checkpoint: {missing}")
    logger.info(f"d2 import: matched {len(matched)} tensors")
    return new, report


def _route(key: str, pooler_resolution: int):
    """d2 state_dict key -> (our param path tuple, conversion fn), or None."""
    m = re.fullmatch(r"backbone\.vgg_block(\d+)\.0\.conv(\d+)\.(weight|bias)", key)
    if m:
        b, c, kind = m.group(1), m.group(2), m.group(3)
        leaf = "kernel" if kind == "weight" else "bias"
        fn = _conv_kernel if kind == "weight" else (lambda a: a)
        return ("backbone", f"block{b}_conv{c}", leaf), fn
    m = re.fullmatch(
        r"proposal_generator\.rpn_head\.(conv|objectness_logits|anchor_deltas)\.(weight|bias)",
        key)
    if m:
        name = {"conv": "conv", "objectness_logits": "objectness",
                "anchor_deltas": "deltas"}[m.group(1)]
        kind = m.group(2)
        leaf = "kernel" if kind == "weight" else "bias"
        fn = _conv_kernel if kind == "weight" else (lambda a: a)
        return ("rpn_head", name, leaf), fn
    m = re.fullmatch(r"roi_heads\.box_head\.fc(\d+)\.(weight|bias)", key)
    if m:
        i, kind = m.group(1), m.group(2)
        if kind == "bias":
            return ("box_head", f"fc{i}", "bias"), (lambda a: a)
        if i == "1":
            return ("box_head", "fc1", "kernel"), (
                lambda a: _fc1_kernel(a, pooler_resolution))
        return ("box_head", f"fc{i}", "kernel"), _linear_kernel
    m = re.fullmatch(r"roi_heads\.box_predictor\.(cls_score|bbox_pred)\.(weight|bias)",
                     key)
    if m:
        name, kind = m.group(1), m.group(2)
        if kind == "bias":
            return ("predictor", name, "bias"), (lambda a: a)
        return ("predictor", name, "kernel"), _linear_kernel
    if re.fullmatch(r"proposal_generator\.anchor_generator\.anchor_0", key):
        return ("anchor_wh",), (lambda a: a)
    return None


# ------------------------------------------------------------- pytree helpers
def _deep_copy_dicts(tree):
    if isinstance(tree, dict):
        return {k: _deep_copy_dicts(v) for k, v in tree.items()}
    return tree


def _get_path(tree, path):
    cur = tree
    for p in path:
        if not isinstance(cur, dict) or p not in cur:
            return None
        cur = cur[p]
    return cur


def _set_path(tree, path, value):
    cur = tree
    for p in path[:-1]:
        cur = cur[p]
    cur[path[-1]] = value


def _leaf_paths(tree, prefix=()):
    if isinstance(tree, dict):
        out = []
        for k, v in tree.items():
            out.extend(_leaf_paths(v, prefix + (k,)))
        return out
    return [prefix]


def _dtype_of(x):
    return getattr(x, "dtype", np.float32)


# ------------------------------------------------------------------ top level
def load_detectron2_weights(path: str, state, pooler_resolution: int = 7):
    """Load a reference-format checkpoint into a TrainState.

    EnsembleTSModel checkpoints fill BOTH slots from their own scopes; plain
    detector checkpoints fill the student only (the reference's student-only
    load, ``detection_checkpoint.py:26-38``) and also seed the teacher with the
    same weights so ``--eval-only`` of either model and a warm-start mutual
    phase behave sensibly (the reference copies student -> teacher at the
    burn-in boundary anyway, ``trainer.py:292-298``).
    """
    sd = read_checkpoint_file(path)
    student_sd, teacher_sd = split_ensemble(sd)
    new = state
    if student_sd:
        student, _ = d2_to_params(student_sd, state.student, pooler_resolution)
        new = new._replace(student=student)
    if teacher_sd:
        teacher, _ = d2_to_params(teacher_sd, state.teacher, pooler_resolution)
        new = new._replace(teacher=teacher)
    elif student_sd:
        new = new._replace(teacher=_deep_copy_dicts(new.student))
    return new


def is_d2_checkpoint(path: str) -> bool:
    """Heuristic used by the trainer to route MODEL.WEIGHTS: torch/pickle files
    go through this importer; directories are orbax checkpoints."""
    import os

    return os.path.isfile(path) and (path.endswith(".pth") or path.endswith(".pkl")
                                     or path.endswith(".pt"))
