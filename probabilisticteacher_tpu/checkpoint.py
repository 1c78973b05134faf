"""Checkpointing: teacher+student ensemble in one file, resume, Caffe VGG import.

Parity targets:
- ``DetectionTSCheckpointer`` over ``EnsembleTSModel`` — one checkpoint holds
  modelTeacher + modelStudent + optimizer + scheduler + iteration
  (``pt/checkpoint/detection_checkpoint.py:24-103``, ``pt/engine/trainer.py:104-111``);
- ``last_checkpoint`` marker file + ``--resume`` semantics (``trainer.py:466-496``);
- the student-only pretrained import path (Caffe VGG16, ``vgg.py:127-152``) lives in
  :func:`load_vgg_caffe` below.

Storage is orbax (the JAX-native checkpoint library).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ckpt_dir(output_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(output_dir), f"model_{step:07d}")


def save_checkpoint(output_dir: str, state, keep: int = 100,
                    name: str = "") -> str:
    """Save TrainState at its current step; update the last_checkpoint marker.

    ``keep`` bounds retention: after a successful save, older ``model_*``
    directories beyond the newest ``keep`` are deleted (a full ensemble +
    optimizer checkpoint is ~0.5-1.5 GB; a 30k-iter run at CHECKPOINT_PERIOD
    4000 would otherwise accumulate 8 of them).

    ``name`` saves to a fixed directory (e.g. ``model_best``) WITHOUT touching
    the last_checkpoint marker or the retention scan — resume still follows the
    latest periodic checkpoint.

    Multi-process: ALL ranks must call this together. Orbax coordinates the
    save internally (its save path runs a cross-process sync, so a
    rank-0-gated call deadlocks the pod — observed as a Gloo allgather
    timeout); the marker file and retention scan run on rank 0 only.
    """
    import orbax.checkpoint as ocp

    step = int(state.step)
    path = os.path.join(os.path.abspath(output_dir), name) if name \
        else _ckpt_dir(output_dir, step)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state._asdict()), force=True)
    if jax.process_index() != 0 or name:
        return path
    with open(os.path.join(output_dir, "last_checkpoint"), "w") as f:
        f.write(os.path.basename(path))
    if keep > 0:
        import re
        import shutil

        ckpts = sorted(
            d for d in os.listdir(output_dir)
            if re.fullmatch(r"model_\d{7}", d)
            and os.path.isdir(os.path.join(output_dir, d))
        )
        for old in ckpts[:-keep]:
            shutil.rmtree(os.path.join(output_dir, old), ignore_errors=True)
    return path


def latest_checkpoint(output_dir: str) -> Optional[str]:
    marker = os.path.join(output_dir, "last_checkpoint")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        name = f.read().strip()
    path = os.path.join(output_dir, name)
    return path if os.path.exists(path) else None

def load_checkpoint(path: str, state):
    """Restore a TrainState saved by save_checkpoint (full resume)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(path)  # orbax rejects relative paths
    restored = ckptr.restore(path, item=jax.device_get(state._asdict()))
    return type(state)(**{k: restored[k] for k in state._asdict()})


def load_weights(path: str, state, student_only: bool = False):
    """Load model weights only (the resume=False path, ``trainer.py:483-486``)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))  # orbax rejects relative paths
    new = state._replace(student=_cast_like(restored["student"], state.student))
    if not student_only and "teacher" in restored:
        new = new._replace(teacher=_cast_like(restored["teacher"], state.teacher))
    return new


def _cast_like(loaded, reference):
    """Cast loaded leaves onto the reference dtypes; keep the reference leaf when
    shapes mismatch (the reference checkpointer's shape-mismatch skipping,
    ``detection_checkpoint.py:52-103`` via fvcore _strip/skip semantics)."""
    import jax.numpy as jnp

    flat_ref, treedef = jax.tree.flatten(reference)
    flat_new = treedef.flatten_up_to(loaded)
    out = []
    for n, r in zip(flat_new, flat_ref):
        n = jnp.asarray(n)
        if n.shape != r.shape:
            import logging

            logging.getLogger("probabilisticteacher_tpu").warning(
                f"Checkpoint shape mismatch {n.shape} vs {r.shape}; keeping model init"
            )
            out.append(r)
        else:
            out.append(n.astype(r.dtype))
    return jax.tree.unflatten(treedef, out)


# --------------------------------------------------------------------------- #
# Caffe / torchvision VGG pretrained import (reference ``vgg.py:127-152``)
# --------------------------------------------------------------------------- #
def _vgg_torch_layout(depth: int):
    """torchvision ``features.*`` index -> our conv name, for any VGG depth.

    torchvision's no-norm VGG features are [Conv, ReLU]*k + MaxPool per stage
    (all five stages end with a pool), so conv indices advance by 2 per conv
    and 1 per pool — the same enumeration the reference's importer walks for an
    arbitrary depth (``pt/modeling/backbone/vgg.py:127-152``).
    """
    from .modeling.backbone import VGG_STAGES

    layout, idx = [], 0
    for bi, channels in enumerate(VGG_STAGES[depth], start=1):
        for ci, _ in enumerate(channels, start=1):
            layout.append((idx, f"block{bi}_conv{ci}"))
            idx += 2  # Conv + ReLU
        idx += 1  # MaxPool
    return layout


def _infer_vgg_depth(backbone_params) -> int:
    from .modeling.backbone import VGG_STAGES

    conv_names = {k for k in backbone_params if k.startswith("block")}
    for depth in VGG_STAGES:
        if {name for _, name in _vgg_torch_layout(depth)} == conv_names:
            return depth
    raise ValueError(f"Backbone params match no known VGG depth: {sorted(conv_names)}")


def load_vgg_caffe(params: Any, path: str) -> Any:
    """Load Caffe/torchvision VGG weights (.pth via torch, or .npz) into
    params["backbone"]; works for VGG 11/13/16/19 (depth inferred from params).

    The Caffe model expects BGR 0-255 input with mean subtraction — exactly our
    preprocessing (``Arch.pixel_mean``). Conv kernels are transposed OIHW -> HWIO.
    Returns a new param tree; raises FileNotFoundError if the file is absent.
    """
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if path.endswith(".npz"):
        raw = dict(np.load(path))
    else:
        import torch

        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):  # a full torchvision model object
            sd = sd.state_dict()
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        raw = {k: v.numpy() for k, v in sd.items()}

    bb = dict(params["backbone"])
    for idx, name in _vgg_torch_layout(_infer_vgg_depth(bb)):
        wk, bk = f"features.{idx}.weight", f"features.{idx}.bias"
        if wk not in raw:
            raise KeyError(f"{wk} missing from {path}")
        w = raw[wk].transpose(2, 3, 1, 0)  # OIHW -> HWIO
        assert bb[name]["kernel"].shape == w.shape, (name, bb[name]["kernel"].shape, w.shape)
        bb[name] = {"kernel": w.astype(np.float32), "bias": raw[bk].astype(np.float32)}
    out = dict(params)
    out["backbone"] = bb
    return out
