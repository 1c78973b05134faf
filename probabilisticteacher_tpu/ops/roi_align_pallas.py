"""Fused batched ROIAlign Pallas kernel — zero HBM intermediate.

The XLA "mxu" formulation (ops/roi_align.py) runs two dot_generals and must
materialize the (R, p, W, C) y-interpolated intermediate in HBM (~0.5-1 GB for
the teacher's 2000 ROIs/image). This kernel fuses both interpolation matmuls:
per grid step it holds the feature map of ONE image (stride-16 VGG block5 at
600 px is ~3 MB bf16) plus one ROI-block's f32 intermediate in VMEM, writing
only the pooled (N, R, p, p, C) output to HBM — in the feature dtype (bf16
under AMP), halving the HBM write vs the round-1 f32 version and dropping the
follow-up convert pass.

The grid is (N, R // rb) with the image index major, so Mosaic's pipelining
re-fetches the feature-map block only when the image changes; the per-image
vmap of the round-1 kernel (whose scoped-VMEM grew with the batch and needed a
magic-number guard, VERDICT.md Weak #3) is gone. ``rb`` is auto-sized to the
VMEM budget, so the kernel now covers every production shape including the
teacher's (8, 2000) pass.

Forward-only with a custom VJP: boxes are stop_gradient everywhere in PT (the
reference decodes proposals under no_grad, ``rpn.py:176``), so only d(features)
is needed; it is the transposed pair of interp matmuls, evaluated with batched
XLA dots (backward runs only on the student's <=1k ROIs/image).

Replaces the torchvision/detectron2 CUDA ROIAlign kernel exercised at
``pt/modeling/roi_heads/roi_heads.py:68-73,126``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import _interp_matrix, _sample_points

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the ~16MB scoped VMEM


def _plan(r: int, p: int, h: int, w: int, c: int, feat_bytes: int = 2):
    """(roi_block, sub_rows): largest ROI block whose buffers fit VMEM.

    Constraints: rb divides r; rb*p divisible by 8 (the wy block's sublane dim
    must be 8-aligned for Mosaic); the f32 y-interp intermediate is computed in
    ``sub_rows``-row chunks so only sub_rows*W*C*4 bytes are live at once.
    """
    feat = 2 * h * w * c * feat_bytes            # double-buffered feature block
    # maximize sub (the y-interp MXU dot's row count — its occupancy dominates
    # kernel time), then rb (fewer grid steps).
    best = None
    for rb in (32, 16, 8):
        if r % rb or (rb * p) % 8:
            continue
        out = 2 * rb * p * p * c * feat_bytes
        wy = 2 * rb * p * max(h, 8) * feat_bytes
        wx = 2 * rb * p * max(w, 8) * feat_bytes
        left = _VMEM_BUDGET - (feat + out + wy + wx)
        max_rows = left // (w * c * 4)
        subs = [d for d in range(1, rb * p + 1) if (rb * p) % d == 0 and d <= max_rows]
        if subs:
            cand = (max(subs), rb)
            best = max(best, cand) if best else cand
    if best is None:
        return 0, 0  # caller falls back to the XLA matmul formulation
    return best[1], best[0]


def _kernel(wy_ref, wx_ref, feat_ref, out_ref, *, p: int, sub: int):
    """wy (1, RB*p, H), wx (1, RB, p, W), feat (1, H, W*C) -> out (1, RB*p, p, C).

    All awkward reshapes live OUTSIDE the kernel (Mosaic rejects shape casts on
    non-tile-aligned leading dims); in-kernel reshapes only split the minor
    (lane) dimension, which lowers cleanly.
    """
    rbp = wy_ref.shape[1]
    w = wx_ref.shape[3]
    c = out_ref.shape[3]

    # y-interp in sub-blocks of ``sub`` rows: (sub, H) @ (H, W*C) on the MXU.
    # Mosaic requires 32-bit matmul accumulators; the f32 tmp is the VMEM whale
    # (sub*W*C*4 bytes) — _plan sizes (rb, sub) against the budget.
    for j in range(rbp // sub):
        tmp = jnp.dot(wy_ref[0, j * sub:(j + 1) * sub], feat_ref[0],
                      preferred_element_type=jnp.float32)
        tmp = tmp.reshape(sub, w, c).astype(wx_ref.dtype)  # minor-dim split only
        # x-interp per (roi, output row): (p_x, W) @ (W, C). Static unroll:
        # Pallas TPU cannot dynamic-slice VALUES (only refs), and sub is small.
        for kk in range(sub):
            k = j * sub + kk
            row = jnp.dot(wx_ref[0, k // p], tmp[kk],
                          preferred_element_type=jnp.float32)
            out_ref[0, k] = row.astype(out_ref.dtype)  # (p_x, C)


def _forward(features, wy, wx, interpret=False):
    n, h, w, c = features.shape
    _, r, p, _ = wy.shape
    rb, sub = _plan(r, p, h, w, c, features.dtype.itemsize)
    if rb == 0:  # shapes the kernel cannot tile — XLA matmul fallback
        return jax.vmap(_mxu_from_mats)(features, wy, wx)
    fm = features.reshape(n, h, w * c)
    out = pl.pallas_call(
        partial(_kernel, p=p, sub=sub),
        grid=(n, r // rb),
        in_specs=[
            pl.BlockSpec((1, rb * p, h), lambda ni, i: (ni, i, 0)),
            pl.BlockSpec((1, rb, p, w), lambda ni, i: (ni, i, 0, 0)),
            # image-major grid: this block is re-fetched only when ni changes
            pl.BlockSpec((1, h, w * c), lambda ni, i: (ni, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rb * p, p, c), lambda ni, i: (ni, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, r * p, p, c), features.dtype),
        interpret=interpret,
    )(wy.reshape(n, r * p, h), wx, fm)
    return out.reshape(n, r, p, p, c)


def _mxu_from_mats(feat, wy, wx):
    """The roi_align_mxu contraction pair, from precomputed (wy, wx) matrices.

    feat (H, W, C); wy (R, p, H); wx (R, p, W) -> (R, p, p, C).
    """
    h, w, c = feat.shape
    r, p, _ = wy.shape
    dt = feat.dtype
    tmp = jax.lax.dot_general(
        wy.reshape(r * p, h), feat.reshape(h, w * c), (((1,), (0,)), ((), ())),
        preferred_element_type=dt,
    ).reshape(r, p, w, c)
    out = jax.lax.dot_general(
        wx, tmp, (((2,), (2,)), ((0,), (0,))), preferred_element_type=dt,
    )  # (R, p_x, p_y, C)
    return out.transpose(0, 2, 1, 3)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def roi_align_pallas(features, boxes, spatial_scale, output_size=7,
                     sampling_ratio=2, interpret=False):
    """Batched ROIAlign via the fused Pallas kernel.

    features (N, H, W, C), boxes (N, R, 4) -> (N, R, p, p, C).
    Numerically identical to ops.roi_align.roi_align_mxu (parity-tested).
    """
    wy, wx = _pool_matrices(features.shape, boxes, spatial_scale, output_size,
                            sampling_ratio, features.dtype)
    return _forward(features, wy, wx, interpret)


def _pool_matrices(feat_shape, boxes, spatial_scale, p, s, dtype):
    _, h, w, _ = feat_shape
    n, r, _ = boxes.shape
    scaled = boxes.astype(jnp.float32) * spatial_scale - 0.5
    ys, xs = jax.vmap(lambda b: _sample_points(b, p, s))(scaled)
    wy = _interp_matrix(ys, h).reshape(n, r, p, s, h).mean(3).astype(dtype)
    wx = _interp_matrix(xs, w).reshape(n, r, p, s, w).mean(3).astype(dtype)
    return wy, wx


def _fwd(features, boxes, spatial_scale, output_size, sampling_ratio, interpret):
    wy, wx = _pool_matrices(features.shape, boxes, spatial_scale, output_size,
                            sampling_ratio, features.dtype)
    out = _forward(features, wy, wx, interpret)
    return out, (wy, wx)


def _bwd_einsum(wy, wx, g):
    """XLA fallback backward: dF[n] = sum_r Wy[n,r]^T @ dOut[n,r] @ Wx[n,r].

    Materializes a multi-GB (N, R, x, H, C) intermediate in HBM (q-first on the
    wide canvas, x-first on the tall one — whichever is smaller); kept as the
    fallback for shapes the fused kernel cannot tile."""
    if wy.shape[-1] <= wx.shape[-1]:  # wide canvas: H < W -> q-first smaller
        u = jnp.einsum("nrqh,nrqxc->nrxhc", wy, g.astype(wy.dtype),
                       preferred_element_type=wy.dtype)
        df = jnp.einsum("nrxhc,nrxw->nhwc", u, wx,
                        preferred_element_type=jnp.float32)
    else:  # tall canvas: W < H -> x-first smaller
        t = jnp.einsum("nrqxc,nrxw->nrqwc", g.astype(wx.dtype), wx,
                       preferred_element_type=wx.dtype)
        df = jnp.einsum("nrqh,nrqwc->nhwc", wy, t,
                        preferred_element_type=jnp.float32)
    return df.astype(wy.dtype)


def _bwd_plan(r: int, p: int, h: int, w: int, c: int):
    """(rb, n_wchunks) for the fused backward; (0, 0) -> einsum fallback.

    The w-chunk loop lives in the GRID (grid = (n, nw, r // rb)), so every
    w-sized buffer — the f32 accumulator, the f32 dot-output temporary, the
    d_tmp intermediate, and the double-buffered out block — is per-chunk
    (wch = w // nw), not full-w. Round-5 history: the first budget (13 MB)
    silently rejected the production 38x76x512 shape (einsum no-op); raising
    it to 14 MB exposed an illegal block tiling; fixing THAT exposed a real
    VMEM overflow at compile — the in-kernel w-loop version needs a full-w
    f32 accumulator + full-w out block (11.3 MB alone at production shapes)
    plus an unbudgeted f32 dot-output temporary, which lands over the ~16 MB
    core budget and crashes the compile helper. Chunking via the grid
    shrinks all four to wch-size at the cost of re-streaming the g/wyt
    blocks nw times from HBM (g = 25.7 MB/image/extra-pass at the student
    shape — HBM traffic, not VMEM).

    Budget model (all per-chunk, upd INCLUDED this time), tunable via
    PT_ROIALIGN_BWD_VMEM_MB (default 13 of the ~16 MB VMEM/core). Prefer the
    smallest nw (fewest re-stream passes), then the largest rb (the
    h-contraction's K = rb*p drives MXU occupancy)."""
    budget = float(_os.environ.get("PT_ROIALIGN_BWD_VMEM_MB", "13"))
    for nw in (1, 2, 4):
        wch = -(-w // nw)
        wch += (-wch) % 8            # chunks are padded to sublane alignment
        acc = h * wch * c * 4
        upd = h * wch * c * 4                  # the dot-output temporary
        outblk = 2 * h * wch * c * 2
        for rb in (16, 8):
            if r % rb:
                continue
            d_tmp = rb * p * wch * c * 2
            gblk = 2 * rb * p * p * c * 2
            wyblk = 2 * rb * p * max(h, 8) * 2
            wxblk = 2 * rb * max(w, 8) * p * 2
            total = acc + upd + outblk + d_tmp + gblk + wyblk + wxblk
            if total < budget * 1024 * 1024:
                return rb, nw
    return 0, 0


def _bwd_kernel(wyt_ref, wxt_ref, g_ref, out_ref, acc_ref, d_ref,
                *, p: int, interpret: bool = False):
    """wyt (1, RB*p, H), wxt (1, RB, wch, p), g (1, RB*p, p, C) -> out
    (1, H, wch, C), on grid (N, nw, R // RB) — ROI blocks innermost.

    Per grid step (one ROI block, one w-chunk): d3[wch, (r, q), c] =
    wxt_r[w-chunk] @ g[r, q] (the x-interp backward, one small 2-D dot per
    (r, q)), then acc[h, wch, c] += wyt_block ·_K d3 — one rank-3
    dot_general contracting K = RB*p (lhs dim 0, rhs dim 1). The final ROI
    block writes acc out in the feature dtype, directly in (N, H, W, C)
    layout.

    EVERY intermediate keeps its rank: the current compile helper's libtpu
    rejects rank-changing vector reshapes ("infer-vector-layout: unsupported
    shape cast" — see DESIGN.md round 5), which killed the earlier
    d.reshape(wch*c) row-packing and g_row.reshape(p, c) unpacking. Hence g
    arrives as a 4-D block (rows index (r, q), last two dims (p_x, C) span
    their full extents) and d_tmp is 3-D scratch written with 2-D values at
    an integer (r, q) index. C stays in the 128-lane minor dim of every
    w-sized buffer (acc, upd, d3, out) — an (..., H)-minor layout pads H=38
    to 128 lanes and triples their VMEM. The out block's tiled minor pair is
    (wch, C): wch is 8-aligned by construction, C is lane-divisible. All
    constructs are individually lowering-verified on-chip (accumulator
    scratch, integer-indexed 3-D scratch writes, rank-3 dot_general both
    orderings); a traced-start pl.ds slice is NOT (it crashes the helper),
    which is why the w-chunk is a blocked grid dim rather than an in-kernel
    dynamic slice.

    The w-chunk index is a GRID dim (not an in-kernel loop) so the f32
    accumulator, the f32 dot output, d_tmp, and the out block are all
    wch-sized — the full-w variant overflowed the ~16 MB VMEM core budget at
    production shapes. wxt stays full-w per block (it is KB-sized) and the
    chunk is dynamic-sliced from it. No HBM intermediate (the XLA einsum
    fallback materializes a multi-GB (N, R, x, H, C) tensor).
    """
    i = pl.program_id(2)
    nblk = pl.num_programs(2)
    rb = wxt_ref.shape[1]

    @pl.when(i == 0)
    def _():
        acc_ref[:, :, :] = jnp.zeros_like(acc_ref)

    for r in range(rb):
        # the wxt BLOCK is already this grid step's w-chunk (the w axis is
        # blocked over nw 8-aligned chunks) — a static read; a traced-start
        # pl.ds slice here crashes the current compile helper's Mosaic
        wxr = wxt_ref[0, r]                                    # (wch, p)
        for q in range(p):
            # x-interp backward: (wch, p_x) @ (p_x, C)
            d = jnp.dot(wxr, g_ref[0, r * p + q],
                        preferred_element_type=jnp.float32)
            d_ref[:, r * p + q, :] = d.astype(d_ref.dtype)
    lhs, rhs = wyt_ref[0], d_ref[:, :, :]
    if interpret:
        # CPU interpret only: XLA's CPU dot thunk can't execute
        # bf16 x bf16 -> f32 rank-3 dots; the TPU MXU does it natively
        lhs, rhs = lhs.astype(jnp.float32), rhs.astype(jnp.float32)
    upd = jax.lax.dot_general(
        lhs, rhs,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                     # (H, wch, C)
    acc_ref[:, :, :] = acc_ref[:, :, :] + upd

    @pl.when(i == nblk - 1)
    def _():
        out_ref[0] = acc_ref[:, :, :].astype(out_ref.dtype)


def _bwd_pallas(wy, wx, g, interpret=False):
    n, r, p, h = wy.shape
    w = wx.shape[3]
    c = g.shape[-1]
    rb, nw = _bwd_plan(r, p, h, w, c)
    if rb == 0:
        return _bwd_einsum(wy, wx, g)
    # 8-aligned w-chunks: the wxt/out w axis is BLOCKED over the chunk grid
    # dim, so the chunk read is static (no traced-start slicing, which the
    # current compile helper's Mosaic crashes on). Pad w up so each chunk is
    # sublane-aligned; padded wx columns are zero, so their x-interp
    # contribution is zero and the padded out columns are dropped below.
    wch = -(-w // nw)
    wch += (-wch) % 8
    w_pad = nw * wch
    wyt = wy.reshape(n, r * p, h)                         # (n, R*p, H)
    wxt = wx.transpose(0, 1, 3, 2)                        # (n, R, W, p)
    if w_pad != w:
        wxt = jnp.pad(wxt, ((0, 0), (0, 0), (0, w_pad - w), (0, 0)))
    g4 = g.astype(wy.dtype).reshape(n, r * p, p, c)
    out = pl.pallas_call(
        partial(_bwd_kernel, p=p, interpret=interpret),
        grid=(n, nw, r // rb),
        in_specs=[
            pl.BlockSpec((1, rb * p, h), lambda ni, wj, i: (ni, i, 0)),
            pl.BlockSpec((1, rb, wch, p), lambda ni, wj, i: (ni, i, wj, 0)),
            pl.BlockSpec((1, rb * p, p, c), lambda ni, wj, i: (ni, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, wch, c), lambda ni, wj, i: (ni, 0, wj, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w_pad, c), wy.dtype),
        scratch_shapes=[
            pltpu.VMEM((h, wch, c), jnp.float32),
            pltpu.VMEM((wch, rb * p, c), wy.dtype),
        ],
        interpret=interpret,
    )(wyt, wxt, g4)
    return out[:, :, :w]                                  # (n, H, W, C)


# The fused backward is numerically equivalent but NOT bit-identical to the
# einsum path (different accumulation order); training-trajectory experiments
# (REPORT_accuracy.md) need bit-stable gradients across rounds, so the fused
# kernel is opt-in until it has an on-chip perf + trajectory check.
import os as _os

FUSED_BWD = _os.environ.get("PT_ROIALIGN_FUSED_BWD", "0") == "1"


def _bwd(spatial_scale, output_size, sampling_ratio, interpret, res, g):
    wy, wx = res  # wy carries the features dtype; shapes give (H, W)
    if FUSED_BWD:
        return _bwd_pallas(wy, wx, g, interpret), None
    return _bwd_einsum(wy, wx, g), None


roi_align_pallas.defvjp(_fwd, _bwd)
