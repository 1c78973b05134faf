"""Pallas greedy-NMS scan kernel (exact semantics, VMEM-resident).

Replaces the blocked fixed-point solver in ``ops/nms.py`` on TPU. The blocked
formulation solves the sequential keep/suppress recurrence with Jacobi matvec
iterations — (1, B) @ (B, B) products that use 1/128 of the MXU's rows and pay
a full while-loop round per 8 updates; at production budgets (24 images x
12000 -> 2000 @0.7 per mutual step) that is ~34 ms of pure while time
(DESIGN.md round-2 trace). This kernel instead runs the ORIGINAL sequential
greedy scan, which is cheap when the whole problem lives in VMEM:

- boxes (pre-sorted by descending score, like torchvision) are laid out as
  coordinate PLANES ``(6, 8, K/8)`` f32 — x0, y0, x1, y1, area, valid — so a
  single box's suppression row is a full-width (8, K/8) VPU op (1024 elems per
  vinsn), not a (1, K) strip;
- one ``while_loop`` visits rows in score order; a suppressed row costs two
  scalar reads; a KEPT row broadcasts its coords and ORs ``iou > t`` into the
  suppression plane in ~K/1024 vector instructions per arithmetic op;
- the loop exits as soon as ``max_keep`` boxes are kept (score order makes
  this exact — a full buffer means no later box can be kept or matter).

Total work is O(kept * K) VPU elementwise — no (B, B) IoU matrices in HBM, no
matvecs, no convergence iterations. Exactness: the IoU expression reproduces
``ops.boxes.pairwise_iou`` operation-for-operation in f32 (guarded division,
inter > 0 gate), and suppression uses the same strict ``iou > thresh``;
keep-set parity with ``ops.nms.nms`` is unit-tested across random and
adversarial (tie/chain) inputs.

Used by default for RPN proposal selection and teacher class-aware NMS
(``MODEL.RPN.NMS_IMPL greedy``); ``greedy_xla`` selects the blocked solver.
Replaces torchvision's CUDA ``nms`` exercised via detectron2 ``batched_nms``
at ``proposal_utils.py:140`` and ``fast_rcnn.py:104`` in the reference.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(thresh_ref, data_ref, keep_ref, supp_ref, *, k: int, max_keep: int,
            lanes: int):
    """data_ref (6, 8, L) f32 planes: x0, y0, x1, y1, area, valid (1/0).

    keep_ref (8, L) f32 out (1.0 = kept); supp_ref (8, L) f32 scratch.
    Box i lives at plane position (i // L, i % L).
    """
    t = thresh_ref[0]
    # invalid rows start suppressed: they are never kept and never suppress
    supp_ref[:, :] = 1.0 - data_ref[5, :, :]
    keep_ref[:, :] = jnp.zeros_like(keep_ref)

    x0p = data_ref[0, :, :]
    y0p = data_ref[1, :, :]
    x1p = data_ref[2, :, :]
    y1p = data_ref[3, :, :]
    arp = data_ref[4, :, :]

    def body(state):
        i, cnt = state
        r = i // lanes
        c = i - r * lanes
        not_sup = supp_ref[r, c] < 0.5

        @pl.when(not_sup)
        def _():
            x0 = data_ref[0, r, c]
            y0 = data_ref[1, r, c]
            x1 = data_ref[2, r, c]
            y1 = data_ref[3, r, c]
            ar = data_ref[4, r, c]
            # ops.boxes.pairwise_iou, operation for operation (f32)
            iw = jnp.minimum(x1, x1p) - jnp.maximum(x0, x0p)
            ih = jnp.minimum(y1, y1p) - jnp.maximum(y0, y0p)
            inter = jnp.clip(iw, 0.0) * jnp.clip(ih, 0.0)
            union = ar + arp - inter
            iou = jnp.where(inter > 0.0,
                            inter / jnp.where(union > 0.0, union, 1.0), 0.0)
            supp_ref[:, :] = jnp.maximum(supp_ref[:, :],
                                         (iou > t).astype(jnp.float32))
            keep_ref[r, c] = 1.0

        return i + 1, cnt + not_sup.astype(jnp.int32)

    def cond(state):
        i, cnt = state
        return jnp.logical_and(i < k, cnt < max_keep)

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))


@partial(jax.jit, static_argnames=("max_keep",))
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float | jnp.ndarray,
    max_keep: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over (K, 4) XYXY boxes — drop-in for ``ops.nms.nms``.

    Returns (indices (max_keep,) int32 into the ORIGINAL arrays in descending
    score order, valid_out (max_keep,) bool). Invalid slots point at index 0.
    """
    kk = boxes.shape[0]
    lanes_total = -(-kk // 1024) * 1024  # pad to (8, L) f32 tiles
    lanes = lanes_total // 8
    pad = lanes_total - kk

    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    s = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-s, stable=True).astype(jnp.int32)
    boxes_s = boxes[order].astype(jnp.float32)
    valid_s = valid[order]
    if pad:
        boxes_s = jnp.pad(boxes_s, ((0, pad), (0, 0)))
        valid_s = jnp.pad(valid_s, (0, pad))

    x0, y0, x1, y1 = (boxes_s[:, i] for i in range(4))
    ar = (x1 - x0) * (y1 - y0)
    data = jnp.stack(
        [x0, y0, x1, y1, ar, valid_s.astype(jnp.float32)]
    ).reshape(6, 8, lanes)

    keep_plane = pl.pallas_call(
        partial(_kernel, k=kk, max_keep=max_keep, lanes=lanes),
        out_shape=jax.ShapeDtypeStruct((8, lanes), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, lanes), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(iou_thresh, jnp.float32).reshape(1), data)

    keep = keep_plane.reshape(lanes_total)[:kk] > 0.5
    # bounded append, identical to ops.nms.nms's buffer semantics
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    ok = keep & (pos < max_keep)
    pos_safe = jnp.where(ok, pos, max_keep)
    kept_idx = jnp.zeros((max_keep,), jnp.int32).at[pos_safe].set(
        order[:kk], mode="drop")
    kept_valid = jnp.zeros((max_keep,), bool).at[pos_safe].set(True, mode="drop")
    return kept_idx, kept_valid


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float | jnp.ndarray,
    max_keep: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Category-aware NMS via the coordinate-offset trick (drop-in for
    ``ops.nms.batched_nms``)."""
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms(shifted, scores, valid, iou_thresh, max_keep)
