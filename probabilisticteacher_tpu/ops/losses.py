"""Loss primitives of Probabilistic Teacher (pure jnp, mask-based).

Every formula is a behavioral mirror of the reference (citations inline). All
functions take explicit validity masks instead of boolean indexing so they stay
static-shape; masked elements contribute exactly zero.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from .box_regression import gaussian_dist_pdf, laplace_dist_pdf

E = math.e


def binary_cross_entropy_with_logits_sum(logits: jnp.ndarray, targets: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked sum BCE-with-logits (RPN objectness, ``rpn.py:242-246``)."""
    # numerically stable: max(x,0) - x*y + log(1+exp(-|x|))
    loss = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.sum(jnp.where(mask, loss, 0.0))


def softmax_cross_entropy_mean(logits: jnp.ndarray, labels: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Masked mean CE over valid rows (ROI supervised cls, detectron2 ``cross_entropy``)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    n = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / n


def prob_box_nll_sum(
    pred_mean: jnp.ndarray,
    pred_sigma_raw: jnp.ndarray,
    gt_deltas: jnp.ndarray,
    mask: jnp.ndarray,
    model_type: str = "GUASSIAN",
) -> jnp.ndarray:
    """Sum of -log(pdf(gt_delta; mean, sigmoid(sigma_raw)) + 1e-9) over masked rows.

    Reference: ``box_regression.py:170-183`` (RPN dense) and ``fast_rcnn.py:287-307``
    (ROI); var = sigmoid(raw).
    """
    var = jax.nn.sigmoid(pred_sigma_raw)
    if model_type == "LAPLACE":
        pdf = laplace_dist_pdf(pred_mean, gt_deltas, var)
    else:
        pdf = gaussian_dist_pdf(pred_mean, gt_deltas, var)
    nll = -jnp.log(pdf + 1e-9)
    return jnp.sum(jnp.where(mask[..., None], nll, 0.0))


def efl_class_weight(teacher_logits: jnp.ndarray, lam: float) -> jnp.ndarray:
    """Entropy Focal Loss weight from teacher class logits (``rpn.py:285-290``).

    w = (1 - H(softmax(t)) / log(n)) ** lam, per row.

    Hardening vs the reference: p * log(p) is evaluated as 0 at p == 0 (extreme
    logits can underflow the softmax to exactly 0 in f32; the reference's
    ``temp * torch.log(temp)`` would produce NaN there).
    """
    p = jax.nn.softmax(teacher_logits, axis=-1)
    plogp = jnp.where(p > 0, p * jnp.log(jnp.where(p > 0, p, 1.0)), 0.0)
    entropy = -jnp.sum(plogp, axis=-1)
    max_entropy = math.log(teacher_logits.shape[-1])
    return (1.0 - entropy / max_entropy) ** lam


def efl_box_weight(sigma_p: jnp.ndarray, lam: float, model_type: str = "GUASSIAN") -> jnp.ndarray:
    """EFL weight from teacher box variance BEFORE tau scaling (``rpn.py:319-326``).

    sigma_p = sigmoid(teacher raw sigma), per coordinate.
    """
    if model_type == "LAPLACE":
        entropy = 1.0 + 0.5 * jnp.log(4.0 * sigma_p)
        max_entropy = 1.0 + math.log(2.0)
    else:
        entropy = 0.5 * jnp.log(2.0 * math.pi * E * sigma_p)
        max_entropy = 0.5 * math.log(2.0 * math.pi * E)
    return (1.0 - entropy / max_entropy) ** lam


def rpn_soft_cls_loss(
    objectness_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    anchor_mask: jnp.ndarray,
    tau0: float,
    efl: bool,
    lam0: float,
) -> jnp.ndarray:
    """Unsupervised RPN classification loss (``rpn.py:285-307``), masked sum.

    objectness_logits: (..., R) student objectness o for each anchor.
    teacher_logits: (..., R, K+1) teacher class logits of the matched pseudo box.
    anchor_mask: (..., R) True for anchors with matcher label 1 vs pseudo boxes.

    target = softmax(t / tau0) collapsed to [p_bg, p_fg]; loss_row =
    sum(target * (-log(sigmoid([1 - o, o]) + 1e-9))), reproducing the reference's
    sigmoid(1-o) form exactly.
    """
    p = jax.nn.softmax(teacher_logits / tau0, axis=-1)
    target = jnp.stack([p[..., -1], jnp.sum(p[..., :-1], axis=-1)], axis=-1)  # (..., R, 2)
    if efl:
        w = efl_class_weight(teacher_logits, lam0)  # (..., R)
        target = target * w[..., None]
    o = objectness_logits
    cls_out = jax.nn.sigmoid(jnp.stack([1.0 - o, o], axis=-1))
    neg_log = -jnp.log(cls_out + 1e-9)
    per_anchor = jnp.sum(target * neg_log, axis=-1)
    return jnp.sum(jnp.where(anchor_mask, per_anchor, 0.0))


def kl_consistency_box_loss(
    mean_q: jnp.ndarray,
    sigma_q_raw: jnp.ndarray,
    mean_p: jnp.ndarray,
    sigma_p_raw: jnp.ndarray,
    mask: jnp.ndarray,
    tau1: float,
    efl: bool,
    lam1: float,
    model_type: str = "GUASSIAN",
    reduction: str = "sum",
) -> jnp.ndarray:
    """Teacher->student box-distribution consistency (``rpn.py:309-348``,
    ``fast_rcnn.py:215-263``).

    q: student (mean, raw sigma); p: teacher (mean, raw sigma, detached by caller).
    sigma_p = sigmoid(raw) -> EFL weight (before tau) -> sigma_p *= tau1;
    sigma_q = sigmoid(raw). Gaussian: 0.5*log(sq/sp) - 0.5 + (sp + (mq-mp)^2)/(2*sq).
    mask: (...,) rows to include (fg); reduction 'sum' or 'mean' over masked elements.
    """
    sigma_p = jax.nn.sigmoid(sigma_p_raw)
    if efl:
        w = efl_box_weight(sigma_p, lam1, model_type)
    sigma_p = sigma_p * tau1
    sigma_q = jax.nn.sigmoid(sigma_q_raw)
    if model_type == "LAPLACE":
        loss = (
            jnp.sqrt(sigma_p) * jnp.exp(-jnp.abs(mean_q - mean_p) / jnp.sqrt(sigma_p)) / jnp.sqrt(sigma_q)
            + jnp.abs(mean_q - mean_p) / jnp.sqrt(sigma_q)
            + 0.5 * jnp.log(sigma_q / sigma_p)
            - 1.0
        )
    else:
        loss = 0.5 * jnp.log(sigma_q / sigma_p) - 0.5 + (sigma_p + (mean_q - mean_p) ** 2) / (2.0 * sigma_q)
    if efl:
        loss = loss * w
    loss = jnp.where(mask[..., None], loss, 0.0)
    if reduction == "mean":
        n = jnp.maximum(jnp.sum(mask.astype(jnp.float32)) * loss.shape[-1], 1.0)
        return jnp.sum(loss) / n
    return jnp.sum(loss)


def roi_soft_cls_loss(
    student_logits: jnp.ndarray,
    teacher_logits: jnp.ndarray,
    valid: jnp.ndarray,
    tau0: float,
    efl: bool,
    lam0: float,
) -> jnp.ndarray:
    """Unsupervised ROI classification loss (``fast_rcnn.py:179-213``).

    sum over rows of sum(softmax(t/tau0) [* EFL] * (-log_softmax(s))) / n_valid.
    """
    neg_logp = -jax.nn.log_softmax(student_logits, axis=-1)
    soft = jax.nn.softmax(teacher_logits / tau0, axis=-1)
    if efl:
        w = efl_class_weight(teacher_logits, lam0)
        soft = soft * w[..., None]
    per_row = jnp.sum(soft * neg_logp, axis=-1)
    n = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.where(valid, per_row, 0.0)) / n
