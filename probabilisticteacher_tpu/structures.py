"""Static-shape data structures (TPU-native replacement for detectron2 Instances).

The reference carries variable-length per-image annotation state in ``FreeInstances``
(``pt/structures/instances.py:22-46``) — an Instances subclass with the length checks
removed so fields of different lengths coexist. XLA wants static shapes, so every
structure here is a batch-level pytree of fixed-size arrays plus validity masks.
Padded entries are defined to contribute exactly zero to every loss and never win a
match (see ops.matcher.masked_iou).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class GroundTruth(NamedTuple):
    """Padded GT annotations for a batch (replaces Instances.gt_boxes/gt_classes)."""

    boxes: jnp.ndarray    # (N, G, 4) XYXY in canvas coordinates, f32
    classes: jnp.ndarray  # (N, G) int32 in [0, K)
    valid: jnp.ndarray    # (N, G) bool

    @staticmethod
    def empty(n: int, g: int) -> "GroundTruth":
        return GroundTruth(
            boxes=jnp.zeros((n, g, 4), jnp.float32),
            classes=jnp.zeros((n, g), jnp.int32),
            valid=jnp.zeros((n, g), bool),
        )


class PseudoLabels(NamedTuple):
    """Teacher detections used as soft pseudo-labels (FreeInstances.pseudo_boxes /
    scores_logists / boxes_sigma, ``pt/engine/trainer.py:216-226``)."""

    boxes: jnp.ndarray   # (N, T, 4) XYXY, f32
    logits: jnp.ndarray  # (N, T, K+1) raw teacher class logits (pre-softmax)
    sigma: jnp.ndarray   # (N, T, 4) raw teacher box sigma logits (pre-sigmoid)
    valid: jnp.ndarray   # (N, T) bool


class Proposals(NamedTuple):
    """RPN proposals after NMS (replaces FreeInstances.proposal_boxes)."""

    boxes: jnp.ndarray   # (N, P, 4) XYXY, f32
    logits: jnp.ndarray  # (N, P) objectness scores (post sigma-rescale), f32
    valid: jnp.ndarray   # (N, P) bool


class Detections(NamedTuple):
    """Final detector output (replaces FreeInstances.pred_boxes/scores/pred_classes
    plus the PT extras scores_logists/boxes_sigma, ``fast_rcnn.py:112-118``)."""

    boxes: jnp.ndarray    # (N, D, 4) XYXY, f32
    scores: jnp.ndarray   # (N, D) f32 (sigma-discounted)
    classes: jnp.ndarray  # (N, D) int32 in [0, K)
    logits: jnp.ndarray   # (N, D, K+1) raw class logits of the source proposal
    sigma: jnp.ndarray    # (N, D, 4) raw sigma logits for the predicted class
    valid: jnp.ndarray    # (N, D) bool


class ImageBatch(NamedTuple):
    """A padded image batch (replaces detectron2 ImageList).

    ``image`` is the raw (un-normalized) pixel canvas in the configured channel
    order (BGR by default, matching the reference's Caffe preprocessing); padding
    beyond ``image_hw`` is zero. ``image_hw`` is the valid (h, w) per image.
    """

    image: jnp.ndarray     # (N, H, W, 3) f32 (raw 0..255 pixel values)
    image_hw: jnp.ndarray  # (N, 2) f32 valid (h, w)
