"""Integration golden: ROI inference vs a numpy oracle of the documented pipeline.

Restates ``fast_rcnn_inference_single_image`` (``fast_rcnn.py:34-120``) step by
step in numpy — per-class decode, clip, score_thresh filter on PRE-discount probs,
sigma discount, class-aware greedy NMS, top-k — and checks that
``PTDetector._roi_inference``'s fused static-shape implementation produces the
same detections (boxes, scores, classes, per-row logits, per-class sigma) for
random predictor outputs. This is the SURVEY.md §4 "pseudo-label distribution
comparison" harness: the teacher's pseudo-labels are exactly these outputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probabilisticteacher_tpu.modeling.detector import Arch, PTDetector
from probabilisticteacher_tpu.structures import Proposals

import oracles


def np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def np_apply_deltas(deltas, boxes, weights):
    wx, wy, ww, wh = weights
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h
    dx, dy = deltas[:, 0::4] / wx, deltas[:, 1::4] / wy
    dw = np.minimum(deltas[:, 2::4] / ww, np.log(1000.0 / 16))
    dh = np.minimum(deltas[:, 3::4] / wh, np.log(1000.0 / 16))
    pcx = dx * w[:, None] + cx[:, None]
    pcy = dy * h[:, None] + cy[:, None]
    pw = np.exp(dw) * w[:, None]
    ph = np.exp(dh) * h[:, None]
    return np.stack([pcx - pw / 2, pcy - ph / 2, pcx + pw / 2, pcy + ph / 2], -1)


def oracle_roi_inference(logits, deltas, pboxes, hw, k, score_thresh, nms_thresh,
                         topk, weights):
    """fast_rcnn_inference_single_image semantics in numpy."""
    p = pboxes.shape[0]
    probs = np_softmax(logits)[:, :-1]                       # (P, K)
    d = deltas.reshape(p, k, 8)
    boxes = np_apply_deltas(d[..., :4].reshape(p, k * 4), pboxes, weights)  # (P,K,4)
    boxes[..., 0::2] = boxes[..., 0::2].clip(0, hw[1])
    boxes[..., 1::2] = boxes[..., 1::2].clip(0, hw[0])
    sigma = d[..., 4:]
    mask = probs > score_thresh
    disc = 1.0 - (1 / (1 + np.exp(-sigma))).sum(-1) / 4.0
    scores = probs * disc

    # class-aware NMS via the offset trick over the filtered set
    rows, cls = np.nonzero(mask)
    if len(rows) == 0:
        return []
    fb = boxes[rows, cls]
    fs = scores[rows, cls]
    off = cls.astype(np.float32) * (fb.max() + 1.0)
    keep = oracles.greedy_nms(fb + off[:, None], fs, nms_thresh)[:topk]
    out = []
    for i in keep:
        out.append((fb[i], fs[i], cls[i], rows[i]))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roi_inference_matches_oracle(seed):
    k = 5
    p = 24
    arch = Arch(num_classes=k, vgg_depth=11, detections_per_image=12,
                score_thresh=0.05, nms_thresh=0.5, fc_dim=16)
    det = PTDetector(arch)
    rng = np.random.RandomState(seed)

    pboxes = rng.uniform(0, 80, (p, 4)).astype(np.float32)
    pboxes[:, 2:] = pboxes[:, :2] + rng.uniform(8, 60, (p, 2)).astype(np.float32)
    logits = rng.randn(p, k + 1).astype(np.float32) * 2
    deltas = (rng.randn(p, k * 8) * 0.2).astype(np.float32)
    hw = np.asarray([120.0, 160.0], np.float32)

    # drive _roi_inference with a stubbed roi_predict so the comparison is purely
    # about the post-predictor pipeline
    class Stub(PTDetector):
        def roi_predict(self, params, feat, boxes):
            return jnp.asarray(logits)[None], jnp.asarray(deltas)[None]

    stub = Stub(arch)
    props = Proposals(jnp.asarray(pboxes)[None], jnp.zeros((1, p)), jnp.ones((1, p), bool))
    dets = stub._roi_inference({}, jnp.zeros((1, 8, 10, 4)), props, jnp.asarray(hw)[None])

    want = oracle_roi_inference(logits, deltas, pboxes, hw, k,
                                arch.score_thresh, arch.nms_thresh,
                                arch.detections_per_image, arch.roi_reg_weights)
    got_valid = np.asarray(dets.valid[0])
    got_boxes = np.asarray(dets.boxes[0])[got_valid]
    got_scores = np.asarray(dets.scores[0])[got_valid]
    got_cls = np.asarray(dets.classes[0])[got_valid]
    got_logits = np.asarray(dets.logits[0])[got_valid]
    got_sigma = np.asarray(dets.sigma[0])[got_valid]

    assert len(want) == len(got_boxes), (len(want), len(got_boxes))
    for i, (wb, ws, wc, wrow) in enumerate(want):
        np.testing.assert_allclose(got_boxes[i], wb, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(got_scores[i], ws, rtol=1e-4, atol=1e-5)
        assert got_cls[i] == wc
        np.testing.assert_allclose(got_logits[i], logits[wrow], rtol=1e-5)
        np.testing.assert_allclose(
            got_sigma[i], deltas.reshape(p, k, 8)[wrow, wc, 4:], rtol=1e-5)
