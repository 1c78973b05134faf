"""MaxpoolNMS: pooling-based approximate NMS over the anchor grid (opt-in).

TPU-native fast path for RPN proposal selection inspired by PSRR-MaxpoolNMS
(arXiv:2105.12990): greedy NMS is sequential, but RPN objectness lives on a
regular (H, W, A) anchor grid, so "suppress overlapping lower-scored boxes" is
approximated by keeping only local score maxima — one 3x3 max-pool per anchor
channel plus a cross-anchor max at the same location. Everything is dense
elementwise/pooling work the VPU eats for breakfast; no while-loops.

This is an APPROXIMATION (results differ slightly from greedy NMS); it is
opt-in via MODEL.RPN.NMS_IMPL="maxpool" and off by default for reference parity.
The final detection NMS always stays exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def maxpool_keep(scores_grid: jnp.ndarray, pool: int = 3,
                 cross_anchor: bool = True) -> jnp.ndarray:
    """Keep mask for (H, W, A) scores: local maxima per anchor channel.

    A location survives if it equals the max of its pool x pool spatial
    neighborhood (per channel) and, when ``cross_anchor``, also the max across
    anchor channels at its own location (one box per location).
    """
    h, w, a = scores_grid.shape
    pad = pool // 2
    neg = jnp.asarray(-jnp.inf, scores_grid.dtype)
    pooled = jax.lax.reduce_window(
        scores_grid, neg, jax.lax.max,
        (pool, pool, 1), (1, 1, 1), ((pad, pad), (pad, pad), (0, 0)),
    )
    keep = scores_grid >= pooled
    if cross_anchor:
        keep &= scores_grid >= jnp.max(scores_grid, axis=-1, keepdims=True)
    return keep


def maxpool_nms_select(scores: jnp.ndarray, grid_hw: tuple, num_anchors: int,
                       post_topk: int, pool: int = 3):
    """scores (R,) in (H, W, A) row-major order -> (idx (post_topk,), valid).

    Non-maxima are masked to -inf; the top ``post_topk`` survivors are returned
    sorted by score.
    """
    h, w = grid_hw
    grid = scores.reshape(h, w, num_anchors)
    keep = maxpool_keep(grid, pool)
    masked = jnp.where(keep.reshape(-1), scores, -jnp.inf)
    top, idx = jax.lax.top_k(masked, post_topk)
    return idx.astype(jnp.int32), jnp.isfinite(top)
