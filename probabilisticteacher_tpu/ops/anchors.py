"""Anchor generation (pure jnp, static shapes).

Covers both generators the reference uses:
- DefaultAnchorGenerator semantics (sizes x aspect_ratios cell anchors, grid-shifted;
  detectron2 default exercised via ``configs/Guassian-RCNN-VGG.yaml:10-12``).
- DifferentiableAnchorGenerator: cell anchors derived from a learnable (A, 2) table of
  (w, h) pairs (``pt/modeling/anchor_generator.py:31-164``); here the table is simply a
  parameter pytree leaf and ``cell_anchors_from_wh`` is differentiable. Gradient gating
  (the reference's ``grad_zero``, ``rpn.py:91-94``) is done by the caller with
  ``jax.lax.stop_gradient`` on the generated anchors in non-danchor branches.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def default_cell_anchors(sizes, aspect_ratios) -> np.ndarray:
    """(len(sizes)*len(aspect_ratios), 4) XYXY anchors centered at (0, 0).

    Matches detectron2 ``generate_cell_anchors``: for area size^2 and aspect a (h/w),
    w = sqrt(area/a), h = a*w. Ordering: for each size, for each aspect ratio.
    """
    anchors = []
    for size in sizes:
        anchor_area = float(size) ** 2
        for a in aspect_ratios:
            w = math_sqrt(anchor_area / a)
            h = a * w
            anchors.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(anchors, dtype=np.float32)


def math_sqrt(x):
    return float(np.sqrt(x))


def cell_anchors_from_wh(wh_table: jnp.ndarray) -> jnp.ndarray:
    """Learnable table (A, 2) of (w, h) -> (A, 4) XYXY cell anchors.

    Differentiable; mirrors ``anchor_generator.py:145-148``.
    """
    w = wh_table[:, 0]
    h = wh_table[:, 1]
    return jnp.stack([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0], axis=-1)


def grid_anchors(cell_anchors: jnp.ndarray, feat_h: int, feat_w: int, stride: int, offset: float = 0.0) -> jnp.ndarray:
    """Tile (A, 4) cell anchors over an (feat_h, feat_w) grid -> (H*W*A, 4).

    Shift ordering matches detectron2 ``_create_grid_offsets``: row-major over (y, x),
    anchors fastest. ``offset`` is the sub-stride shift (detectron2 default 0.0 for
    DefaultAnchorGenerator config default; DifferentiableAnchorGenerator uses
    cfg OFFSET as well).
    """
    shifts_x = (jnp.arange(feat_w, dtype=jnp.float32) + offset) * stride
    shifts_y = (jnp.arange(feat_h, dtype=jnp.float32) + offset) * stride
    sx = jnp.tile(shifts_x[None, :], (feat_h, 1)).reshape(-1)
    sy = jnp.tile(shifts_y[:, None], (1, feat_w)).reshape(-1)
    shifts = jnp.stack([sx, sy, sx, sy], axis=-1)  # (H*W, 4)
    return (shifts[:, None, :] + cell_anchors[None, :, :]).reshape(-1, 4)
