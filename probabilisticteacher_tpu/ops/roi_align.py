"""ROIAlign for TPU (XLA gather formulation; ROIAlignV2 / aligned=True semantics).

TPU-native replacement for the torchvision/detectron2 CUDA ROIAlign kernel exercised
at ``pt/modeling/roi_heads/roi_heads.py:68-73,126``. Matches torchvision
``roi_align(aligned=True)`` numerics for a fixed ``sampling_ratio``, parity-tested
against an independent numpy restatement of the published bilinear-ROIAlign
algorithm (``tests/oracles.py``; torchvision itself is not installable in this
environment — only the max-pool gradient test runs against real torch).

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

    # Accumulate over the s*s sample offsets (static unroll) so the peak
    # intermediate is (R, p, p, C) instead of (R, p, s, p, s, C) — an s^2 memory
    # saving that XLA cannot do on the materialized-samples formulation.
    acc = jnp.zeros((r, p, p, c), jnp.float32)
    for sy in range(s):
        for sx in range(s):
            yy = ys[:, :, sy][:, :, None]                      # (R, p, 1)
            xx = xs[:, :, sx][:, None, :]                      # (R, 1, p)
            acc = acc + bilinear(
                jnp.broadcast_to(yy, (r, p, p)),
                jnp.broadcast_to(xx, (r, p, p)),
            )
    return acc / (s * s)


def _sample_points(boxes, p, s):
    """Per-ROI bilinear sample coordinates: (R, p*s) for y and x (aligned=True)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    grid_p = jnp.arange(p, dtype=jnp.float32)
    grid_s = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    off = (grid_p[:, None] + grid_s[None, :]).reshape(-1)  # (p*s,)
    ys = y1[:, None] + off[None] * ((y2 - y1) / p)[:, None]
    xs = x1[:, None] + off[None] * ((x2 - x1) / p)[:, None]
    return ys, xs


def _interp_matrix(points: jnp.ndarray, size: int) -> jnp.ndarray:
    """Bilinear interpolation weights as a dense matrix: (R, K, size).

    W[r, k, i] = weight of source row i for sample k; exactly the 2-tap bilinear
    weights of the gather formulation (clip to [0, size-1], zero outside
    [-1, size]).
    """
    oob = (points < -1.0) | (points > size)
    v = jnp.clip(points, 0.0, size - 1)
    i0 = jnp.floor(v).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, size - 1)
    l = v - i0.astype(v.dtype)
    h = 1.0 - l
    ar = jnp.arange(size, dtype=jnp.int32)
    w0 = jnp.where(oob, 0.0, h)[..., None] * (i0[..., None] == ar)
    w1 = jnp.where(oob, 0.0, l)[..., None] * (i1[..., None] == ar)
    return w0 + w1  # (R, K, size)


def roi_align_mxu(
    features: jnp.ndarray,  # (H, W, C)
    boxes: jnp.ndarray,     # (R, 4)
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """ROIAlign as dense interpolation matmuls — the TPU-native formulation.

    Bilinear sampling is a 2-tap linear map per axis and the s x s sample average
    is ALSO linear, so the whole op (sampling + pooling) folds into per-ROI
    interpolation-and-pool matrices Wy (R, p, H), Wx (R, p, W):

        out[r, :, :, c] = Wy[r] @ F[:, :, c] @ Wx[r]^T

    This rides the MXU instead of issuing ~p*s*p*s*4 gathers per ROI — gathers
    are the weak spot of the TPU memory system, dense bf16 matmuls its strong
    one. The contraction runs in the feature dtype (bf16 under AMP) with f32
    accumulation. Numerically identical to :func:`roi_align` (parity-tested).
    """
    h, w, c = features.shape
    r = boxes.shape[0]
    p, s = output_size, max(sampling_ratio, 1)
    scaled = boxes.astype(jnp.float32) * spatial_scale - 0.5
    ys, xs = _sample_points(scaled, p, s)                    # (R, p*s)
    # fold the sample average into the interp matrices: mean over the s samples
    wy = _interp_matrix(ys, h).reshape(r, p, s, h).mean(2)   # (R, p, H)
    wx = _interp_matrix(xs, w).reshape(r, p, s, w).mean(2)   # (R, p, W)

    dt = features.dtype
    wy = wy.astype(dt)
    wx = wx.astype(dt)
    # tmp[r, py, w, c] = sum_h wy[r, py, h] * F[h, w, c]  — one big MXU matmul.
    # Output directly in the feature dtype (the MXU accumulates in f32 internally;
    # preferred_element_type only picks the output dtype) to avoid a cast copy of
    # the large intermediate.
    fm = features.reshape(h, w * c)
    tmp = jax.lax.dot_general(
        wy.reshape(r * p, h), fm, (((1,), (0,)), ((), ())),
        preferred_element_type=dt,
    ).reshape(r, p, w, c)
    # out[r, px, py, c] = sum_w wx[r, px, w] * tmp[r, py, w, c] — batched dot with
    # NO physical transpose of the big intermediate (rhs free dims stay in place)
    out = jax.lax.dot_general(
        wx, tmp, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=dt,
    )  # (R, p_x, p_y, C)
    return out.transpose(0, 2, 1, 3)  # (R, p_y, p_x, C), small


def roi_align_batched(
    features: jnp.ndarray,  # (N, H, W, C)
    boxes: jnp.ndarray,     # (N, R, 4)
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
    impl: str = "mxu",
    roi_chunk: int = 512,
) -> jnp.ndarray:
    """vmapped ROIAlign -> (N, R, p, p, C). impl: "mxu" (default) or "gather".

    The mxu path materializes a (chunk, p, W, C) intermediate per step; chunking
    over ROIs (``roi_chunk``) bounds that to ~100s of MB regardless of R (the
    teacher pass pools 2000 ROIs/image).
    """
    if impl == "auto":
        # fused Pallas kernel on TPU (fastest, benchmarked 1.8x over the XLA
        # matmul path on the teacher pass); XLA matmuls elsewhere. The batched
        # kernel auto-sizes its ROI block to VMEM (pick_roi_block), so the only
        # remaining condition is that the per-image feature map itself fits.
        feat_bytes = (features.shape[1] * features.shape[2] * features.shape[3]
                      * features.dtype.itemsize)
        impl = ("pallas" if jax.default_backend() == "tpu"
                and feat_bytes <= 4_000_000 else "mxu")
    if impl == "pallas":
        from .roi_align_pallas import roi_align_pallas

        return roi_align_pallas(
            features, boxes, spatial_scale,
            output_size=output_size,
            sampling_ratio=sampling_ratio,
            interpret=jax.default_backend() != "tpu",
        )
    fn = partial(
        roi_align_mxu if impl == "mxu" else roi_align,
        spatial_scale=spatial_scale,
        output_size=output_size,
        sampling_ratio=sampling_ratio,
    )
    r = boxes.shape[1]
    if impl == "mxu" and r > roi_chunk and r % roi_chunk == 0:
        chunks = boxes.reshape(boxes.shape[0], r // roi_chunk, roi_chunk, 4)

        def per_image(feat_i, chunks_i):
            return jax.lax.map(lambda bx: fn(feat_i, bx), chunks_i)

        out = jax.vmap(per_image)(features, chunks)  # (N, n_chunks, chunk, p, p, C)
        return out.reshape(boxes.shape[0], r, *out.shape[3:])
    return jax.vmap(fn)(features, boxes)
