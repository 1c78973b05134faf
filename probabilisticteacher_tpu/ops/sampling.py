"""Static-shape random subsampling (detectron2 ``subsample_labels`` equivalent).

The reference samples 256 anchors/image (pos fraction 0.25) for the RPN and 512
proposals/image (fg fraction 0.25) for the ROI head. detectron2 picks a uniformly
random subset without replacement; we reproduce that distribution with the classic
"top-k of iid uniform keys over the eligible set" trick, which is fully static-shape.

Returns masks rather than index lists: downstream losses are computed with masks.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def random_topk_mask(key: jax.Array, eligible: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select min(k, #eligible) elements uniformly at random from ``eligible`` (bool (N,)).

    Returns (mask (N,) bool, count () int32). Uses top-k over random keys; ineligible
    entries get -inf keys so they are only chosen if fewer than k eligible exist — and
    then they are masked out of the result.
    """
    n = eligible.shape[0]
    kk = min(k, n)
    scores = jax.random.uniform(key, (n,))
    scores = jnp.where(eligible, scores, -jnp.inf)
    _, idx = jax.lax.top_k(scores, kk)
    n_eligible = jnp.sum(eligible.astype(jnp.int32))
    count = jnp.minimum(n_eligible, kk)
    take = jnp.arange(kk) < count  # only the first `count` top-k slots are eligible
    mask = jnp.zeros((n,), dtype=bool).at[idx].set(take)
    return mask, count


def subsample_labels(
    key: jax.Array,
    labels: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
    bg_label: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """detectron2 ``subsample_labels`` with masks.

    labels: (N,) int; positives are labels not in {-1, bg_label}; negatives are
    labels == bg_label. Samples num_pos = min(#pos, num_samples*positive_fraction)
    positives and num_neg = min(#neg, num_samples - num_pos) negatives.

    Returns (pos_mask, neg_mask), both (N,) bool.
    """
    kp, kn = jax.random.split(key)
    positive = (labels != -1) & (labels != bg_label)
    negative = labels == bg_label

    max_pos = int(num_samples * positive_fraction)
    pos_mask, pos_count = random_topk_mask(kp, positive, max_pos)

    n = labels.shape[0]
    # Sample negatives to fill the remainder; budget is dynamic, so draw the full
    # num_samples top-k and keep the first (num_samples - pos_count).
    neg_scores = jax.random.uniform(kn, (n,))
    neg_scores = jnp.where(negative, neg_scores, -jnp.inf)
    kk = min(num_samples, n)
    _, neg_idx = jax.lax.top_k(neg_scores, kk)
    n_neg = jnp.sum(negative.astype(jnp.int32))
    neg_budget = jnp.minimum(num_samples - pos_count, n_neg)
    take = jnp.arange(kk) < neg_budget
    neg_mask = jnp.zeros((n,), dtype=bool).at[neg_idx].set(take)
    return pos_mask, neg_mask
