"""Engine tests: device aug semantics + burn-in/mutual train steps (tiny, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probabilisticteacher_tpu.config import get_cfg
from probabilisticteacher_tpu.data import device_aug as da
from probabilisticteacher_tpu.engine.steps import create_train_state, make_train_steps
from probabilisticteacher_tpu.modeling.detector import Arch, PTDetector
from probabilisticteacher_tpu.solver import build_lr_schedule, build_optimizer
from probabilisticteacher_tpu.structures import GroundTruth, ImageBatch

TINY = Arch(
    num_classes=3, vgg_depth=11,
    rpn_pre_nms_topk=(32, 32), rpn_post_nms_topk=(16, 16),
    rpn_batch_per_image=8, roi_batch_per_image=8,
    detections_per_image=4, unsup_roi_budget=8, fc_dim=16,
)
H = W = 48


def tiny_cfg():
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.WARMUP_ITERS = 2
    cfg.SOLVER.STEPS = (100,)
    cfg.UNSUPNET.BURN_UP_STEP = 2
    cfg.UNSUPNET.EMA_KEEP_RATE = 0.5
    return cfg


# ------------------------------------------------------------------ device aug
def test_solarize_and_grayscale():
    img = jnp.asarray([[[10.0, 200.0, 128.0]]])
    out = da.solarize(img)
    np.testing.assert_allclose(np.asarray(out), [[[10.0, 55.0, 127.0]]])
    g = da._grayscale(img)
    lum = 0.299 * 10 + 0.587 * 200 + 0.114 * 128
    np.testing.assert_allclose(np.asarray(g), np.full((1, 1, 3), lum), rtol=1e-6)


def test_hue_roundtrip():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 255, (4, 4, 3)).astype(np.float32))
    out = da.adjust_hue(img, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)


def test_scale_jitter_boxes_and_fill():
    img = jnp.full((1, 16, 16, 3), 100.0)
    hw = jnp.asarray([[16.0, 16.0]])
    boxes = jnp.asarray([[[4.0, 4.0, 8.0, 8.0]]])
    out, new_boxes = da.scale_jitter(jax.random.key(0), img, hw, boxes,
                                     (10.0, 20.0, 30.0), lo=0.5, hi=0.5)
    # ratio fixed at 0.5: d=8, offset=4
    np.testing.assert_allclose(np.asarray(new_boxes), [[[6.0, 6.0, 8.0, 8.0]]])
    o = np.asarray(out[0])
    np.testing.assert_allclose(o[0, 0], [10.0, 20.0, 30.0])   # corner = mean fill
    np.testing.assert_allclose(o[8, 8], [100.0, 100.0, 100.0])  # center = content


def test_strong_augment_shapes_and_range():
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.randint(0, 255, (4, 16, 16, 3)).astype(np.float32))
    out = da.strong_augment(jax.random.key(3), imgs)
    assert out.shape == imgs.shape
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0.0 and o.max() <= 255.0


# ------------------------------------------------------------------ solver
def test_lr_schedules():
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 1.0
    cfg.SOLVER.WARMUP_ITERS = 10
    cfg.SOLVER.WARMUP_FACTOR = 0.1
    cfg.SOLVER.STEPS = (100, 200)
    sched = build_lr_schedule(cfg)
    assert float(sched(0)) == pytest.approx(0.1, rel=1e-4)
    assert float(sched(50)) == pytest.approx(1.0, rel=1e-4)
    assert float(sched(150)) == pytest.approx(0.1, rel=1e-4)
    assert float(sched(250)) == pytest.approx(0.01, rel=1e-4)
    cfg.SOLVER.LR_SCHEDULER_NAME = "WarmupTwoStageMultiStepLR"
    cfg.SOLVER.FACTOR_LIST = (1.0, 0.5, 0.25)
    sched2 = build_lr_schedule(cfg)
    assert float(sched2(150)) == pytest.approx(0.5, rel=1e-4)
    assert float(sched2(250)) == pytest.approx(0.25, rel=1e-4)


# ------------------------------------------------------------------ steps
@pytest.mark.slow
def test_burnin_and_mutual_steps():
    cfg = tiny_cfg()
    det = PTDetector(TINY)
    rng = np.random.RandomState(0)
    state = create_train_state(det, build_optimizer(cfg, det.init(jax.random.key(0), (H, W))),
                               jax.random.key(0), (H, W))
    # rebuild tx bound to actual params
    tx = build_optimizer(cfg, state.student)
    burnin, mutual = make_train_steps(cfg, det, tx)

    n, g = 2, 3
    limg = ImageBatch(jnp.asarray(rng.randint(0, 255, (n, H, W, 3)).astype(np.float32)),
                      jnp.asarray([[48.0, 48.0], [40.0, 44.0]]))
    uimg = ImageBatch(jnp.asarray(rng.randint(0, 255, (n, H, W, 3)).astype(np.float32)),
                      jnp.asarray([[48.0, 48.0], [48.0, 48.0]]))
    boxes = np.zeros((n, g, 4), np.float32)
    for i in range(n):
        for j in range(g):
            x1, y1 = rng.uniform(0, 24, 2)
            boxes[i, j] = [x1, y1, x1 + rng.uniform(4, 16), y1 + rng.uniform(4, 16)]
    gt = GroundTruth(jnp.asarray(boxes), jnp.asarray(rng.randint(0, 3, (n, g)), jnp.int32),
                     jnp.ones((n, g), bool))

    p0 = jax.tree.map(jnp.copy, state.student)
    t0 = jax.tree.map(jnp.copy, state.teacher)
    key = jax.random.key(7)

    state, m = burnin(state, limg, gt, key)
    assert int(state.step) == 1
    assert all(np.isfinite(float(v)) for v in m.values())
    # student moved, teacher untouched in burn-in
    moved = float(jnp.abs(state.student["rpn_head"]["conv"]["kernel"]
                          - p0["rpn_head"]["conv"]["kernel"]).sum())
    assert moved > 0
    same = float(jnp.abs(state.teacher["rpn_head"]["conv"]["kernel"]
                         - t0["rpn_head"]["conv"]["kernel"]).sum())
    assert same == 0.0

    state, m = burnin(state, limg, gt, key)
    assert int(state.step) == 2

    # step 2 == BURN_UP_STEP: teacher must become an exact student copy first
    student_pre = jax.tree.map(jnp.copy, state.student)
    state, m = mutual(state, limg, gt, uimg, key)
    assert int(state.step) == 3
    assert all(np.isfinite(float(v)) for v in m.values()), m
    np.testing.assert_allclose(
        np.asarray(state.teacher["rpn_head"]["conv"]["kernel"]),
        np.asarray(student_pre["rpn_head"]["conv"]["kernel"]), rtol=1e-6)
    assert any(k.endswith("_unsup") for k in m)

    # next mutual step: EMA with keep=0.5
    t_before = np.asarray(state.teacher["rpn_head"]["conv"]["kernel"])
    s_before = np.asarray(state.student["rpn_head"]["conv"]["kernel"])
    state, m = mutual(state, limg, gt, uimg, key)
    expected = 0.5 * s_before + 0.5 * t_before
    np.testing.assert_allclose(
        np.asarray(state.teacher["rpn_head"]["conv"]["kernel"]), expected, rtol=1e-5)


@pytest.mark.slow
def test_unsup_loss_warmup_ramp():
    """UNSUP_LOSS_WARMUP_ITERS: at the burn boundary the ramp is 0 (the mutual
    update must equal a TARGET_UNSUP_LOSS_WEIGHT=0 control), and past the ramp
    it is 1 (must equal the reference-exact default)."""
    cfg = tiny_cfg()
    det = PTDetector(TINY)
    rng = np.random.RandomState(1)
    params = det.init(jax.random.key(0), (H, W))
    tx = build_optimizer(cfg, params)

    n, g = 2, 3
    limg = ImageBatch(jnp.asarray(rng.randint(0, 255, (n, H, W, 3)).astype(np.float32)),
                      jnp.asarray([[48.0, 48.0], [40.0, 44.0]]))
    uimg = ImageBatch(jnp.asarray(rng.randint(0, 255, (n, H, W, 3)).astype(np.float32)),
                      jnp.asarray([[48.0, 48.0], [48.0, 48.0]]))
    boxes = np.zeros((n, g, 4), np.float32)
    for i in range(n):
        for j in range(g):
            x1, y1 = rng.uniform(0, 24, 2)
            boxes[i, j] = [x1, y1, x1 + rng.uniform(4, 16), y1 + rng.uniform(4, 16)]
    gt = GroundTruth(jnp.asarray(boxes), jnp.asarray(rng.randint(0, 3, (n, g)), jnp.int32),
                     jnp.ones((n, g), bool))
    key = jax.random.key(7)

    cfg_warm = cfg.clone()
    cfg_warm.UNSUPNET.UNSUP_LOSS_WARMUP_ITERS = 4
    cfg_zero = cfg.clone()
    cfg_zero.UNSUPNET.TARGET_UNSUP_LOSS_WEIGHT = 0.0
    _, mutual_warm = make_train_steps(cfg_warm, det, tx)
    _, mutual_zero = make_train_steps(cfg_zero, det, tx)
    _, mutual_ref = make_train_steps(cfg, det, tx)

    def fresh(step):
        st = create_train_state(det, tx, params=jax.tree.map(jnp.copy, params))
        return st._replace(step=jnp.asarray(step, jnp.int32))

    # at the boundary (step == BURN_UP_STEP == 2): ramp == 0
    s_warm, _ = mutual_warm(fresh(2), limg, gt, uimg, key)
    s_zero, _ = mutual_zero(fresh(2), limg, gt, uimg, key)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=0, atol=0),
        s_warm.student, s_zero.student)

    # past the ramp (step - burn_up >= 4): full weight == reference-exact
    s_warm2, _ = mutual_warm(fresh(6), limg, gt, uimg, key)
    s_ref2, _ = mutual_ref(fresh(6), limg, gt, uimg, key)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=0, atol=0),
        s_warm2.student, s_ref2.student)

    # mid-ramp differs from both endpoints
    s_warm3, _ = mutual_warm(fresh(4), limg, gt, uimg, key)
    s_ref3, _ = mutual_ref(fresh(4), limg, gt, uimg, key)
    diff = float(jnp.abs(s_warm3.student["rpn_head"]["conv"]["kernel"]
                         - s_ref3.student["rpn_head"]["conv"]["kernel"]).sum())
    assert diff > 0


def test_frozen_backbone_blocks():
    cfg = tiny_cfg()
    cfg.MODEL.BACKBONE.FREEZE_AT = 2
    det = PTDetector(TINY)
    params = det.init(jax.random.key(0), (H, W))
    tx = build_optimizer(cfg, params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    b1 = updates["backbone"]["block1_conv1"]["kernel"]
    b3 = updates["backbone"]["block3_conv1"]["kernel"]
    assert float(jnp.abs(b1).sum()) == 0.0
    assert float(jnp.abs(b3).sum()) > 0.0


def test_metric_naming_and_total_excludes_stats():
    """Mutual metrics use the reference's *_sup/*_unsup naming (trainer.py:352-371);
    total_loss sums only loss_* keys (trainer.py:283-286)."""
    cfg = tiny_cfg()
    cfg.UNSUPNET.BURN_UP_STEP = 0
    det = PTDetector(TINY)
    state = create_train_state(det, build_optimizer(cfg, det.init(jax.random.key(0), (H, W))),
                               jax.random.key(0), (H, W))
    tx = build_optimizer(cfg, state.student)
    _, mutual = make_train_steps(cfg, det, tx)
    rng = np.random.RandomState(0)
    img = ImageBatch(jnp.asarray(rng.randint(0, 255, (2, H, W, 3)).astype(np.float32)),
                     jnp.asarray([[48.0, 48.0]] * 2))
    gt = GroundTruth(jnp.asarray([[[4.0, 4.0, 24.0, 24.0]]] * 2),
                     jnp.zeros((2, 1), jnp.int32), jnp.ones((2, 1), bool))
    state, m = mutual(state, img, gt, img, jax.random.key(1))
    assert {"loss_rpn_cls_sup", "loss_rpn_loc_sup", "loss_cls_sup", "loss_box_reg_sup",
            "loss_rpn_cls_unsup", "loss_rpn_loc_unsup", "loss_cls_unsup",
            "loss_box_reg_unsup", "total_loss"} <= set(m)
    # sampling stats present but excluded from the total
    assert "rpn/num_pos_anchors_sup" in m and "roi_head/num_fg_samples_sup" in m
    loss_sum = sum(float(v) for k, v in m.items() if k.startswith("loss"))
    np.testing.assert_allclose(float(m["total_loss"]), loss_sum, rtol=1e-5)
