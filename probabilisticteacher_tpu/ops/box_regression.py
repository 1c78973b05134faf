"""Box delta transform and probabilistic box densities (pure jnp).

Behavioral parity with the reference:
- encode/decode: ``pt/modeling/box_regression.py:66-139`` (xywh parameterization,
  weight scaling, dw/dh clamp at log(1000/16), +1e-9 inside the log ratio).
- Gaussian / Laplace pdfs with sigma-constant 0.3: ``pt/modeling/box_regression.py:33-40``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

SCALE_CLAMP = math.log(1000.0 / 16)
SIGMA_CONSTANT = 0.3


def get_deltas(src_boxes: jnp.ndarray, target_boxes: jnp.ndarray, weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Encode target boxes as (dx, dy, dw, dh) deltas relative to src boxes.

    Shapes: (..., 4) x (..., 4) -> (..., 4). Invalid (zero-size) src boxes are the
    caller's responsibility to mask (the reference asserts; we stay differentiable
    and rely on validity masks downstream).
    """
    src_w = src_boxes[..., 2] - src_boxes[..., 0]
    src_h = src_boxes[..., 3] - src_boxes[..., 1]
    src_cx = src_boxes[..., 0] + 0.5 * src_w
    src_cy = src_boxes[..., 1] + 0.5 * src_h

    tgt_w = target_boxes[..., 2] - target_boxes[..., 0]
    tgt_h = target_boxes[..., 3] - target_boxes[..., 1]
    tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
    tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h

    wx, wy, ww, wh = weights
    safe_w = jnp.where(src_w != 0, src_w, 1.0)
    safe_h = jnp.where(src_h != 0, src_h, 1.0)
    dx = wx * (tgt_cx - src_cx) / safe_w
    dy = wy * (tgt_cy - src_cy) / safe_h
    # Reference adds 1e-9 to the ratio inside the log (box_regression.py:94-95).
    dw = ww * jnp.log(tgt_w / safe_w + 1e-9)
    dh = wh * jnp.log(tgt_h / safe_h + 1e-9)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def apply_deltas(deltas: jnp.ndarray, boxes: jnp.ndarray, weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Decode (..., K*4) deltas against (..., 4) boxes -> (..., K*4) XYXY boxes.

    fp32 decode with dw/dh clamped at SCALE_CLAMP (box_regression.py:101-139).
    """
    deltas = deltas.astype(jnp.float32)
    boxes = boxes.astype(jnp.float32)
    shape = deltas.shape
    k4 = shape[-1]
    d = deltas.reshape(shape[:-1] + (k4 // 4, 4))

    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h

    wx, wy, ww, wh = weights
    dx = d[..., 0] / wx
    dy = d[..., 1] / wy
    dw = jnp.minimum(d[..., 2] / ww, SCALE_CLAMP)
    dh = jnp.minimum(d[..., 3] / wh, SCALE_CLAMP)

    pcx = dx * w[..., None] + cx[..., None]
    pcy = dy * h[..., None] + cy[..., None]
    pw = jnp.exp(dw) * w[..., None]
    ph = jnp.exp(dh) * h[..., None]

    out = jnp.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1
    )
    return out.reshape(shape)


def gaussian_dist_pdf(val: jnp.ndarray, mean: jnp.ndarray, var: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Gaussian density with the reference's sigma-constant-0.3 normalizer."""
    return jnp.exp(-((val - mean) ** 2) / (var + eps) / 2.0) / jnp.sqrt(
        2.0 * math.pi * (var + SIGMA_CONSTANT)
    )


def laplace_dist_pdf(val: jnp.ndarray, mean: jnp.ndarray, var: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Laplace density with the reference's sigma-constant-0.3 normalizer."""
    return jnp.exp(-jnp.abs(val - mean) / jnp.sqrt(var + eps)) / jnp.sqrt(
        4.0 * (var + SIGMA_CONSTANT)
    )


def nll(pdf_vals: jnp.ndarray) -> jnp.ndarray:
    """-log(pdf + 1e-9), elementwise (box_regression.py:175)."""
    return -jnp.log(pdf_vals + 1e-9)
