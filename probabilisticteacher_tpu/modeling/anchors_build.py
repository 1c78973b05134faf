"""Anchor construction from config (default grid or learnable table).

Mirrors the two generators the reference exercises:
- ``DefaultAnchorGenerator`` (sizes x aspect_ratios, ``configs/Guassian-RCNN-VGG.yaml:10-12``);
- ``DifferentiableAnchorGenerator`` with a learnable (A, 2) table of (w, h) pairs
  initialized from ``MODEL.ANCHOR_GENERATOR.ANCHOR`` (``pt/modeling/anchor_generator.py:31-164``,
  init table ``pt/config.py:84-92``).

The learnable table lives in the param pytree under ``params["anchor_wh"]``; gradient
gating per branch (reference ``grad_zero``, ``rpn.py:91-94``) is the caller's job via
``jax.lax.stop_gradient``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.anchors import cell_anchors_from_wh, default_cell_anchors, grid_anchors


def num_cell_anchors(arch) -> int:
    if arch.learnable_anchors:
        return len(arch.anchor_init_wh)
    return len(arch.anchor_sizes) * len(arch.anchor_aspects)


def init_anchor_params(arch):
    """Learnable (A, 2) wh table init, or None for the default generator."""
    if not arch.learnable_anchors:
        return None
    return jnp.asarray(np.asarray(arch.anchor_init_wh, dtype=np.float32))


def anchor_boxes(anchor_wh, arch, feat_h: int, feat_w: int) -> jnp.ndarray:
    """All anchors for one feature map -> (feat_h * feat_w * A, 4) XYXY.

    Differentiable through ``anchor_wh`` when learnable (anchor adaptation).
    """
    if arch.learnable_anchors:
        cell = cell_anchors_from_wh(anchor_wh)
    else:
        cell = jnp.asarray(default_cell_anchors(arch.anchor_sizes, arch.anchor_aspects))
    return grid_anchors(cell, feat_h, feat_w, arch.stride, arch.anchor_offset)
