"""Static-shape NMS for TPU (exact torchvision/detectron2 semantics).

The reference relies on torchvision's CUDA ``nms`` via detectron2 ``batched_nms``
(``proposal_utils.py:140``, ``fast_rcnn.py:104``). On TPU we need a static-shape,
compiler-friendly formulation. This is a blocked greedy NMS:

- candidates are sorted by score (stable, descending);
- blocks of ``block_size`` are processed in order; within a block the sequential
  keep/suppress recurrence ``keep[j] = ~ext[j] & ~any_{i<j}(keep[i] & iou>t)`` is
  solved by fixed-point iteration (converges in <= longest suppression chain,
  checked with a while_loop) — the per-iteration work is an MXU-friendly (B, B)
  masked matmul;
- kept boxes are appended to a bounded buffer of ``max_keep`` (processing in score
  order makes dropping overflow safe: a kept box beyond ``max_keep`` can only
  suppress boxes that would rank after it anyway).

Suppression uses strict ``iou > thresh`` like torchvision. Exact-parity tested
against an independent numpy restatement of torchvision's published greedy-NMS
algorithm (``tests/oracles.py`` — torchvision itself is not installable in this
environment, so the oracle is a from-the-paper reimplementation, not the
torchvision binary).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou


def _fixed_point_keep(iou_sup: jnp.ndarray, ext_ok: jnp.ndarray,
                      unroll: int = 8) -> jnp.ndarray:
    """Solve the sequential NMS recurrence by fixed-point iteration.

    iou_sup: (B, B) bool, True where i would suppress j (i < j and iou > t).
    ext_ok:  (B,) bool, False where already suppressed by previously-kept boxes.
    Returns keep: (B,) bool. Converges in <= longest suppression chain iterations.

    ``unroll`` Jacobi updates run per while iteration: under vmap the loop runs
    in lockstep across images and each iteration pays fixed launch latency, so
    fewer/fatter iterations win (the extra matvecs are noise next to that).
    Exact: the update sequence is unchanged, convergence is just checked every
    ``unroll``-th step, and iterating PAST the fixed point is a no-op.
    """
    sup_f = iou_sup.astype(jnp.float32)

    def update(keep):
        suppressed = (keep.astype(jnp.float32) @ sup_f) > 0.5
        return ext_ok & ~suppressed

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < iou_sup.shape[0] + 1)

    def body(state):
        keep, _, it = state
        new_keep = keep
        for _ in range(unroll):
            new_keep = update(new_keep)
        return new_keep, keep, it + unroll

    keep0 = ext_ok
    keep, _, _ = jax.lax.while_loop(cond, body, (keep0, ~keep0, jnp.int32(0)))
    return keep


def _intra_block_keep(iou_sup: jnp.ndarray, ext_ok: jnp.ndarray,
                      sub: int = 0) -> jnp.ndarray:
    """Solve the intra-block NMS recurrence.

    sub=0 (default): one whole-block fixed point. sub>0: two-level variant (scan
    over sub-blocks, fixed point within each) — measured SLOWER on v5e at the
    production sizes (many small while-loops lose to one big one: 54 vs 35 ms of
    whiles per mutual step); kept as an option for other hardware/shapes.
    """
    b = iou_sup.shape[0]
    if sub <= 0 or b <= sub:
        return _fixed_point_keep(iou_sup, ext_ok)
    nsub = -(-b // sub)
    pad = nsub * sub - b
    sup_f = iou_sup.astype(jnp.float32)
    if pad:
        sup_f = jnp.pad(sup_f, ((0, pad), (0, pad)))
        ext_ok = jnp.pad(ext_ok, (0, pad))
        b = nsub * sub

    def step(keep_so_far, j):
        cols = jax.lax.dynamic_slice_in_dim(sup_f, j * sub, sub, axis=1)   # (B, S)
        ext_sup = (keep_so_far.astype(jnp.float32) @ cols) > 0.5           # (S,)
        ok = jax.lax.dynamic_slice_in_dim(ext_ok, j * sub, sub, 0) & ~ext_sup
        diag = jax.lax.dynamic_slice(sup_f, (j * sub, j * sub), (sub, sub))
        k = _fixed_point_keep(diag > 0.5, ok)
        keep = jax.lax.dynamic_update_slice_in_dim(keep_so_far, k, j * sub, 0)
        return keep, None

    keep, _ = jax.lax.scan(step, jnp.zeros((b,), bool), jnp.arange(nsub))
    return keep[: iou_sup.shape[0]]


@partial(jax.jit, static_argnames=("max_keep", "block_size"))
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float | jnp.ndarray,
    max_keep: int,
    block_size: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over (K, 4) boxes.

    Returns (indices (max_keep,) int32 into the ORIGINAL arrays sorted by descending
    score, valid_out (max_keep,) bool). Invalid slots point at index 0.
    """
    k = boxes.shape[0]
    b = min(block_size, k)
    num_blocks = -(-k // b)
    pad = num_blocks * b - k

    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    s = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-s, stable=True).astype(jnp.int32)
    boxes_s = boxes[order]
    valid_s = valid[order]
    if pad:
        boxes_s = jnp.pad(boxes_s, ((0, pad), (0, 0)))
        valid_s = jnp.pad(valid_s, (0, pad))
        order = jnp.pad(order, (0, pad))

    tri = jnp.triu(jnp.ones((b, b), dtype=bool), k=1)  # i < j

    def block_step(carry, blk):
        kept_boxes, kept_valid, kept_idx, kept_count = carry
        blk_boxes, blk_valid, blk_order = blk

        # external suppression by previously kept boxes
        iou_ext = pairwise_iou(kept_boxes, blk_boxes)  # (max_keep, B)
        ext_sup = jnp.any((iou_ext > iou_thresh) & kept_valid[:, None], axis=0)
        ext_ok = blk_valid & ~ext_sup

        # intra-block sequential recurrence
        iou_blk = pairwise_iou(blk_boxes, blk_boxes)
        sup = tri & (iou_blk > iou_thresh)
        keep = _intra_block_keep(sup, ext_ok)

        # append kept boxes (bounded)
        pos = kept_count + jnp.cumsum(keep.astype(jnp.int32)) - 1
        ok = keep & (pos < max_keep)
        pos_safe = jnp.where(ok, pos, max_keep)  # out-of-bounds -> dropped by scatter
        kept_boxes = kept_boxes.at[pos_safe].set(blk_boxes, mode="drop")
        kept_valid = kept_valid.at[pos_safe].set(True, mode="drop")
        kept_idx = kept_idx.at[pos_safe].set(blk_order, mode="drop")
        kept_count = jnp.minimum(kept_count + jnp.sum(keep.astype(jnp.int32)), max_keep)
        return (kept_boxes, kept_valid, kept_idx, kept_count), None

    init = (
        jnp.zeros((max_keep, 4), boxes.dtype),
        jnp.zeros((max_keep,), dtype=bool),
        jnp.zeros((max_keep,), dtype=jnp.int32),
        jnp.int32(0),
    )
    blk_boxes = boxes_s.reshape(num_blocks, b, 4)
    blk_valid = valid_s.reshape(num_blocks, b)
    blk_order = order.reshape(num_blocks, b)

    # while-loop over blocks with EARLY EXIT once the keep budget is full —
    # processing in score order makes this exact: a full buffer means no later
    # box can be kept, and kept boxes are never revised. For the RPN's
    # 12000 -> 2000 this typically skips half the blocks.
    def cond(state):
        i, carry = state
        return jnp.logical_and(i < num_blocks, carry[3] < max_keep)

    def body(state):
        i, carry = state
        blk = (blk_boxes[i], blk_valid[i], blk_order[i])
        carry, _ = block_step(carry, blk)
        return i + 1, carry

    _, (kept_boxes, kept_valid, kept_idx, _) = jax.lax.while_loop(
        cond, body, (jnp.int32(0), init)
    )
    return kept_idx, kept_valid


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float | jnp.ndarray,
    max_keep: int,
    block_size: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Category-aware NMS via the coordinate-offset trick (torchvision ``batched_nms``).

    idxs: (K,) int category (class id or level id); boxes of different categories
    never suppress each other.
    """
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms(shifted, scores, valid, iou_thresh, max_keep, block_size)
