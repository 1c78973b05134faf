"""Box geometry primitives (pure jnp, XYXY format).

TPU-native equivalents of detectron2 ``Boxes``/``pairwise_iou`` as exercised by the
reference (``pt/modeling/proposal_generator/rpn.py:414``, ``pt/modeling/roi_heads/
roi_heads.py:207-213``). All functions are vectorized, static-shape, batched-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of XYXY boxes; last dim 4 -> scalar per box."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between (M, 4) and (N, 4) boxes -> (M, N).

    Matches detectron2 semantics: degenerate boxes give IoU 0 (guarded division).
    """
    a1 = area(boxes1)  # (M,)
    a2 = area(boxes2)  # (N,)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])  # (M, N, 2)
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])  # (M, N, 2)
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = a1[:, None] + a2[None, :] - inter
    return jnp.where(inter > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def pairwise_iou_batched(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU for batched boxes: (..., M, 4) x (..., N, 4) -> (..., M, N)."""
    a1 = area(boxes1)
    a2 = area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = a1[..., :, None] + a2[..., None, :] - inter
    return jnp.where(inter > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def clip_boxes(boxes: jnp.ndarray, image_hw: jnp.ndarray) -> jnp.ndarray:
    """Clip XYXY boxes to [0, w] x [0, h].

    ``image_hw``: (..., 2) as (h, w), broadcastable against ``boxes[..., 0]``.
    Matches detectron2 ``Boxes.clip`` (``proposal_utils.py:128``).
    """
    h = image_hw[..., 0]
    w = image_hw[..., 1]
    x1 = jnp.clip(boxes[..., 0], 0.0, w)
    y1 = jnp.clip(boxes[..., 1], 0.0, h)
    x2 = jnp.clip(boxes[..., 2], 0.0, w)
    y2 = jnp.clip(boxes[..., 3], 0.0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """Mask of boxes with both sides > threshold (detectron2 ``Boxes.nonempty``)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > threshold) & (h > threshold)


def inside_box(boxes: jnp.ndarray, image_hw: jnp.ndarray, boundary_thresh: float = 0.0) -> jnp.ndarray:
    """Mask of boxes fully inside the image + margin (legacy RPN boundary filter)."""
    h = image_hw[..., 0]
    w = image_hw[..., 1]
    return (
        (boxes[..., 0] >= -boundary_thresh)
        & (boxes[..., 1] >= -boundary_thresh)
        & (boxes[..., 2] < w + boundary_thresh)
        & (boxes[..., 3] < h + boundary_thresh)
    )
