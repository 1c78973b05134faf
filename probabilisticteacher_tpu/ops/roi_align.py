"""ROIAlign for TPU (XLA gather formulation; ROIAlignV2 / aligned=True semantics).

TPU-native replacement for the torchvision/detectron2 CUDA ROIAlign kernel exercised
at ``pt/modeling/roi_heads/roi_heads.py:68-73,126``. Matches torchvision
``roi_align(aligned=True)`` numerics for a fixed ``sampling_ratio`` (parity-tested
against the torchvision CPU oracle).

Deviation: the reference's POOLER_SAMPLING_RATIO=0 means an adaptive per-ROI sample
count (ceil(roi_size/out_size)) — inherently dynamic-shape. We use a fixed sampling
grid (default 2x2 per bin, config ``POOLER_SAMPLING_RATIO``), the standard
static-shape choice; detection accuracy is insensitive to this.

Layout: features are NHWC (TPU-friendly); boxes are XYXY in input-image coordinates;
``spatial_scale`` = 1/stride. The bilinear gather is differentiable (scatter-add in
the backward pass via jnp.take's VJP).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio", "spatial_scale"))
def roi_align(
    features: jnp.ndarray,  # (H, W, C)
    boxes: jnp.ndarray,     # (R, 4) XYXY, image coords
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """ROIAlign one image -> (R, output_size, output_size, C)."""
    h, w, c = features.shape
    r = boxes.shape[0]
    p = output_size
    s = max(sampling_ratio, 1)

    # aligned=True: half-pixel offset
    x1 = boxes[:, 0] * spatial_scale - 0.5
    y1 = boxes[:, 1] * spatial_scale - 0.5
    x2 = boxes[:, 2] * spatial_scale - 0.5
    y2 = boxes[:, 3] * spatial_scale - 0.5
    roi_w = x2 - x1
    roi_h = y2 - y1
    bin_w = roi_w / p
    bin_h = roi_h / p

    # sample points: y = y1 + (ph + (iy + 0.5)/s) * bin_h
    grid_p = jnp.arange(p, dtype=jnp.float32)
    grid_s = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    off = grid_p[:, None] + grid_s[None, :]          # (p, s)
    ys = y1[:, None, None] + off[None] * bin_h[:, None, None]  # (R, p, s)
    xs = x1[:, None, None] + off[None] * bin_w[:, None, None]  # (R, p, s)

    def bilinear(points_y, points_x):
        # points: (R, p, s) each; returns (R, p, s, C)
        oob = (points_y < -1.0) | (points_y > h) | (points_x < -1.0) | (points_x > w)
        y = jnp.clip(points_y, 0.0, h - 1)
        x = jnp.clip(points_x, 0.0, w - 1)
        y0 = jnp.floor(y).astype(jnp.int32)
        x0 = jnp.floor(x).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, h - 1)
        x1i = jnp.minimum(x0 + 1, w - 1)
        ly = y - y0.astype(y.dtype)
        lx = x - x0.astype(x.dtype)
        hy = 1.0 - ly
        hx = 1.0 - lx

        flat = features.reshape(h * w, c)

        def take(yy, xx):
            return jnp.take(flat, yy * w + xx, axis=0)

        val = (
            take(y0, x0) * (hy * hx)[..., None]
            + take(y0, x1i) * (hy * lx)[..., None]
            + take(y1i, x0) * (ly * hx)[..., None]
            + take(y1i, x1i) * (ly * lx)[..., None]
        )
        return jnp.where(oob[..., None], 0.0, val)

    # (R, p, s) x (R, p, s) -> samples (R, p, s, p, s, C)
    vals = bilinear(
        ys[:, :, :, None, None].repeat(p, 3).repeat(s, 4),
        xs[:, None, None, :, :].repeat(p, 1).repeat(s, 2),
    )
    out = vals.reshape(r, p, s, p, s, c).mean(axis=(2, 4))
    return out


def roi_align_batched(
    features: jnp.ndarray,  # (N, H, W, C)
    boxes: jnp.ndarray,     # (N, R, 4)
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """vmapped ROIAlign -> (N, R, p, p, C)."""
    fn = partial(
        roi_align,
        spatial_scale=spatial_scale,
        output_size=output_size,
        sampling_ratio=sampling_ratio,
    )
    return jax.vmap(fn)(features, boxes)
