"""Pallas NMS scan kernel: exact keep-set parity with the blocked solver.

Runs in interpret mode on CPU (the kernel auto-selects interpret off-TPU);
parity target is ``ops.nms.nms`` (itself oracle-tested in test_ops_geometry)
AND the independent numpy oracle directly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probabilisticteacher_tpu.ops import nms as nms_xla
from probabilisticteacher_tpu.ops import nms_pallas
from oracles import greedy_nms


def _random_case(rng, k, scale=200.0, cluster=False):
    if cluster:
        # heavy-overlap clusters -> long suppression chains
        centers = rng.uniform(0, scale, (max(k // 20, 1), 2))
        idx = rng.randint(0, len(centers), k)
        xy = centers[idx] + rng.uniform(-12, 12, (k, 2))
    else:
        xy = rng.uniform(0, scale, (k, 2))
    wh = rng.uniform(5, 60, (k, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, k).astype(np.float32)
    valid = rng.rand(k) > 0.1
    return boxes, scores, valid


@pytest.mark.parametrize("k,max_keep,thresh", [
    (64, 16, 0.5), (200, 50, 0.7), (1024, 100, 0.5),
    (1500, 300, 0.7), (3000, 2000, 0.7),
])
@pytest.mark.parametrize("cluster", [False, True])
def test_parity_with_blocked_nms(k, max_keep, thresh, cluster):
    rng = np.random.RandomState(k + int(cluster))
    boxes, scores, valid = _random_case(rng, k, cluster=cluster)
    idx_a, val_a = nms_xla.nms(jnp.asarray(boxes), jnp.asarray(scores),
                               jnp.asarray(valid), thresh, max_keep)
    idx_b, val_b = nms_pallas.nms(jnp.asarray(boxes), jnp.asarray(scores),
                                  jnp.asarray(valid), thresh, max_keep)
    np.testing.assert_array_equal(np.asarray(val_a), np.asarray(val_b))
    np.testing.assert_array_equal(
        np.asarray(idx_a)[np.asarray(val_a)], np.asarray(idx_b)[np.asarray(val_b)])


def test_parity_with_numpy_oracle():
    rng = np.random.RandomState(7)
    boxes, scores, valid = _random_case(rng, 400, cluster=True)
    ref = greedy_nms(boxes[valid], scores[valid], 0.6)
    orig = np.where(valid)[0]
    idx, val = nms_pallas.nms(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.asarray(valid), 0.6, 100)
    got = np.asarray(idx)[np.asarray(val)]
    np.testing.assert_array_equal(got, orig[ref][:100])


def test_exact_threshold_tie():
    """iou == thresh must NOT suppress (strict >, torchvision semantics)."""
    # two identical-size boxes overlapping at exactly IoU 0.5:
    # [0,0,2,1] vs [1,0,3,1]: inter 1, union 3 -> 1/3; use crafted pair
    b = np.array([[0, 0, 2, 2], [0, 1, 2, 3],   # inter 2, union 6 -> 1/3
                  [10, 10, 12, 12]], np.float32)
    s = np.array([0.9, 0.8, 0.7], np.float32)
    v = np.ones(3, bool)
    idx, val = nms_pallas.nms(jnp.asarray(b), jnp.asarray(s), jnp.asarray(v),
                              1.0 / 3.0, 3)
    # iou(0,1) == 1/3 exactly in f32? compute both ways; whatever the blocked
    # solver decides, the kernel must agree bit-for-bit
    idx_a, val_a = nms_xla.nms(jnp.asarray(b), jnp.asarray(s), jnp.asarray(v),
                               1.0 / 3.0, 3)
    np.testing.assert_array_equal(np.asarray(val), np.asarray(val_a))
    np.testing.assert_array_equal(np.asarray(idx)[np.asarray(val)],
                                  np.asarray(idx_a)[np.asarray(val_a)])


def test_all_invalid_and_empty_budget():
    b = np.zeros((32, 4), np.float32)
    s = np.zeros(32, np.float32)
    idx, val = nms_pallas.nms(jnp.asarray(b), jnp.asarray(s),
                              jnp.zeros(32, bool), 0.5, 8)
    assert not np.asarray(val).any()


def test_max_keep_overflow_matches():
    """More survivors than max_keep: buffer keeps the top-scored ones."""
    rng = np.random.RandomState(3)
    # non-overlapping grid -> everything survives
    xs, ys = np.meshgrid(np.arange(20) * 100.0, np.arange(20) * 100.0)
    boxes = np.stack([xs.ravel(), ys.ravel(), xs.ravel() + 50, ys.ravel() + 50],
                     axis=1).astype(np.float32)
    scores = rng.uniform(size=400).astype(np.float32)
    valid = np.ones(400, bool)
    idx, val = nms_pallas.nms(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.asarray(valid), 0.5, 100)
    assert np.asarray(val).all()
    np.testing.assert_array_equal(np.asarray(idx), np.argsort(-scores,
                                                              kind="stable")[:100])


def test_vmap_batched_images():
    rng = np.random.RandomState(11)
    n, k = 4, 256
    boxes = np.stack([_random_case(rng, k)[0] for _ in range(n)])
    scores = rng.uniform(0.01, 1, (n, k)).astype(np.float32)
    valid = rng.rand(n, k) > 0.1

    f_a = jax.vmap(lambda b, s, v: nms_xla.nms(b, s, v, 0.7, 64))
    f_b = jax.vmap(lambda b, s, v: nms_pallas.nms(b, s, v, 0.7, 64))
    (ia, va) = f_a(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
    (ib, vb) = f_b(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    for i in range(n):
        np.testing.assert_array_equal(
            np.asarray(ia)[i][np.asarray(va)[i]],
            np.asarray(ib)[i][np.asarray(vb)[i]])


def test_batched_nms_class_aware_parity():
    rng = np.random.RandomState(13)
    k = 512
    boxes, scores, valid = _random_case(rng, k, cluster=True)
    cls = rng.randint(0, 8, k).astype(np.int32)
    ia, va = nms_xla.batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                 jnp.asarray(cls), jnp.asarray(valid), 0.5, 100,
                                 block_size=256)
    ib, vb = nms_pallas.batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                    jnp.asarray(cls), jnp.asarray(valid), 0.5, 100)
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    np.testing.assert_array_equal(np.asarray(ia)[np.asarray(va)],
                                  np.asarray(ib)[np.asarray(vb)])
