"""Anchor/proposal matcher (static-shape detectron2 ``Matcher`` semantics).

The reference exercises two matchers:
- RPN: thresholds [0.3, 0.7], labels [0, -1, 1], allow_low_quality_matches=True
  (``rpn.py:414-415`` via detectron2 RPN from_config).
- ROI: thresholds [0.5], labels [0, 1], allow_low_quality_matches=False
  (``roi_heads.py:214`` via StandardROIHeads from_config).

Static-shape handling of padded GT: invalid gt rows must have their IoU column forced
to -1 by the caller (``masked_iou``) so they can never win an argmax nor produce
low-quality matches. Zero valid gt reproduces detectron2's "no gt" path: all labels 0,
matched_idx 0.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp


class MatchResult(NamedTuple):
    matched_idx: jnp.ndarray  # (N,) int32 index into gt rows (argmax, always valid row id)
    labels: jnp.ndarray       # (N,) int8 in {-1, 0, 1} (or matcher's label set)


def masked_iou(iou: jnp.ndarray, gt_valid: jnp.ndarray) -> jnp.ndarray:
    """Force IoU rows of padded gts to -1 so they never match. iou: (M, N), gt_valid: (M,)."""
    return jnp.where(gt_valid[:, None], iou, -1.0)


def match(
    iou: jnp.ndarray,
    thresholds: Sequence[float],
    labels: Sequence[int],
    allow_low_quality_matches: bool = False,
) -> MatchResult:
    """detectron2 Matcher over an (M_gt, N_pred) quality matrix (already gt-masked).

    thresholds: ascending, e.g. (0.3, 0.7); labels: len(thresholds)+1 values applied to
    intervals (-inf, t0), [t0, t1), ..., [t_last, inf).

    With zero valid gt (all rows -1): matched_vals are all -1 -> first interval label
    (0 for both matchers used here), matching detectron2's empty-gt shortcut.

    Low-quality matches: for each gt, predictions whose IoU equals that gt's maximum get
    label 1; matched_idx is NOT updated (detectron2 ``set_low_quality_matches_``).
    """
    matched_vals = jnp.max(iou, axis=0)          # (N,)
    matched_idx = jnp.argmax(iou, axis=0).astype(jnp.int32)

    out_labels = jnp.full(matched_vals.shape, labels[0], dtype=jnp.int8)
    for lo, label in zip(thresholds, labels[1:]):
        out_labels = jnp.where(matched_vals >= lo, jnp.int8(label), out_labels)

    if allow_low_quality_matches:
        # highest quality per gt; padded gts have row max -1 which cannot equal any
        # real iou >= 0 unless the prediction column itself is all -1 (impossible when
        # at least one valid gt exists); guard with > 0-ness via gt mask already applied.
        highest_per_gt = jnp.max(iou, axis=1, keepdims=True)  # (M, 1)
        # Predictions that tie a gt's best IoU (and that gt is real: highest >= 0).
        is_best = (iou == highest_per_gt) & (highest_per_gt >= 0)
        pred_has_best = jnp.any(is_best, axis=0)
        out_labels = jnp.where(pred_has_best, jnp.int8(1), out_labels)

    return MatchResult(matched_idx, out_labels)
