"""Fused ROIAlign Pallas kernel (forward) — zero HBM intermediate.

The XLA "mxu" formulation (ops/roi_align.py) runs two dot_generals and must
materialize the (R, p, W, C) y-interpolated intermediate in HBM (~0.5-1 GB for
the teacher's 2000 ROIs/image). This kernel fuses both interpolation matmuls:
per grid step it holds the WHOLE feature map (stride-16 VGG block5 at 600 px is
~3 MB bf16) plus one ROI-block's intermediate in VMEM, writing only the pooled
(R, p, p, C) output to HBM.

Forward-only with a custom VJP: boxes are stop_gradient everywhere in PT (the
reference decodes proposals under no_grad, ``rpn.py:176``), so only d(features)
is needed; it is the transposed pair of interp matmuls, evaluated with chunked
XLA dots (backward runs only on the student's <=1k ROIs/image).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import _interp_matrix, _sample_points

ROI_BLOCK = 8  # ROIs per grid step; rb*p must stay sublane-aligned (div by 8)


def _kernel(wy_ref, wx_ref, feat_ref, out_ref, *, p: int):
    """wy (RB*p, H), wx (RB, p, W), feat (H, W*C) -> out (RB*p, p_x, C).

    All awkward reshapes live OUTSIDE the kernel (Mosaic rejects shape casts on
    non-tile-aligned leading dims); in-kernel reshapes only split the minor
    (lane) dimension, which lowers cleanly.
    """
    rbp, h = wy_ref.shape
    rb, _, w = wx_ref.shape
    c = out_ref.shape[2]

    # y-interp for the whole block in one MXU matmul: (RB*p, H) @ (H, W*C).
    # Mosaic requires 32-bit matmul accumulators; the f32 tmp (8.7MB at block 8)
    # plus an f32 out block is the VMEM ceiling — hence the f32 output below.
    tmp = jnp.dot(wy_ref[:], feat_ref[:], preferred_element_type=jnp.float32)
    tmp = tmp.reshape(rbp, w, c).astype(wx_ref.dtype)  # minor-dim split only

    # x-interp per (roi, output row): (p_x, W) @ (W, C). Static unroll: Pallas
    # TPU cannot dynamic-slice VALUES (only refs), and rb*p is small (56).
    for k in range(rbp):
        row = jnp.dot(wx_ref[k // p], tmp[k], preferred_element_type=jnp.float32)
        out_ref[k] = row.astype(out_ref.dtype)  # (p_x, C)


def _forward(features, wy, wx, interpret=False):
    h, w, c = features.shape
    r, p, _ = wy.shape
    rb = min(ROI_BLOCK, r)
    assert r % rb == 0, (r, rb)
    fm = features.reshape(h, w * c)
    out = pl.pallas_call(
        partial(_kernel, p=p),
        grid=(r // rb,),
        in_specs=[
            pl.BlockSpec((rb * p, h), lambda i: (i, 0)),
            pl.BlockSpec((rb, p, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((h, w * c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rb * p, p, c), lambda i: (i, 0, 0)),
        # f32 output: a bf16 out block + the f32 tmp exceeds the 16MB scoped
        # VMEM (by 588KB); the extra HBM write costs ~2-3 ms/step — acceptable
        out_shape=jax.ShapeDtypeStruct((r * p, p, c), jnp.float32),
        interpret=interpret,
    )(wy.reshape(r * p, h), wx, fm)
    return out.reshape(r, p, p, c)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def roi_align_pallas(features, boxes, spatial_scale, output_size=7,
                     sampling_ratio=2, interpret=False):
    """ROIAlign one image via the fused Pallas kernel -> (R, p, p, C).

    Numerically identical to ops.roi_align.roi_align_mxu (parity-tested).
    """
    wy, wx = _pool_matrices(features.shape, boxes, spatial_scale, output_size,
                            sampling_ratio, features.dtype)
    return _forward(features, wy, wx, interpret)


def _pool_matrices(feat_shape, boxes, spatial_scale, p, s, dtype):
    h, w, _ = feat_shape
    r = boxes.shape[0]
    scaled = boxes.astype(jnp.float32) * spatial_scale - 0.5
    ys, xs = _sample_points(scaled, p, s)
    wy = _interp_matrix(ys, h).reshape(r, p, s, h).mean(2).astype(dtype)
    wx = _interp_matrix(xs, w).reshape(r, p, s, w).mean(2).astype(dtype)
    return wy, wx


def _fwd(features, boxes, spatial_scale, output_size, sampling_ratio, interpret):
    wy, wx = _pool_matrices(features.shape, boxes, spatial_scale, output_size,
                            sampling_ratio, features.dtype)
    out = _forward(features, wy, wx, interpret)
    return out, (wy, wx)


def _bwd(spatial_scale, output_size, sampling_ratio, interpret, res, g):
    wy, wx = res  # wy carries the features dtype; shapes give (H, W)
    # dF[h, w, c] = sum_r Wy[r]^T @ dOut[r] @ Wx[r]
    # contract x first: (R, p_y, p_x, C) x (R, p_x, W) -> (R, p_y, W, C)
    t = jnp.einsum("rqxc,rxw->rqwc", g.astype(jnp.float32), wx.astype(jnp.float32))
    df = jnp.einsum("rqh,rqwc->hwc", wy.astype(jnp.float32), t)
    return df.astype(wy.dtype), None


roi_align_pallas.defvjp(_fwd, _bwd)
