"""detectron2-format checkpoint importer (VERDICT r3 Next #1).

Functional parity is proved against REAL torch modules (torch is importable in
this environment): every layout conversion (conv OIHW->HWIO, fc1 channel-first
vs channel-last flatten, linear transpose) is validated by running the torch op
and our flax op on the same weights and comparing outputs — not just shapes.
The end-to-end test builds a reference-shaped EnsembleTSModel state_dict
(names from ``/root/reference/pt``: ``backbone.vgg_blockB.0.convC.*``,
``proposal_generator.rpn_head.*``, ``roi_heads.box_head.fc*``,
``roi_heads.box_predictor.*``), saves it as a ``.pth``, loads it through
``MODEL.WEIGHTS`` routing, and checks the detect outputs are bit-identical to
directly-assigned params.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from probabilisticteacher_tpu.config import get_cfg
from probabilisticteacher_tpu.d2_import import (d2_to_params, is_d2_checkpoint,
                                                load_detectron2_weights,
                                                read_checkpoint_file,
                                                split_ensemble)
from probabilisticteacher_tpu.engine.steps import TrainState
from probabilisticteacher_tpu.modeling.detector import Arch, PTDetector


# --------------------------------------------------------- functional parity
def test_conv_conversion_matches_torch():
    """torch Conv2d(3x3, pad 1) == flax nn.Conv with the imported kernel."""
    import flax.linen as nn

    torch.manual_seed(0)
    tconv = torch.nn.Conv2d(6, 10, 3, padding=1, bias=True)
    x = torch.randn(2, 6, 9, 11)
    with torch.no_grad():
        ref = tconv(x).numpy()

    kernel = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)  # OIHW->HWIO
    bias = tconv.bias.detach().numpy()
    mod = nn.Conv(10, (3, 3), padding=1)
    out = mod.apply({"params": {"kernel": jnp.asarray(kernel),
                                "bias": jnp.asarray(bias)}},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-5, atol=1e-5)


def test_fc1_flatten_order_matches_torch():
    """The (C,P,P)->(P,P,C) flatten reorder: torch Linear on channel-first
    flatten == our structured dense on channel-last pooled features."""
    from probabilisticteacher_tpu.d2_import import _fc1_kernel
    from probabilisticteacher_tpu.modeling.heads import _StructuredDense

    torch.manual_seed(1)
    c, p, f = 24, 7, 16
    lin = torch.nn.Linear(c * p * p, f)
    x = torch.randn(3, c, p, p)
    with torch.no_grad():
        ref = lin(x.flatten(1)).numpy()

    kernel = _fc1_kernel(lin.weight.detach().numpy(), p)
    out = _StructuredDense(f).apply(
        {"params": {"kernel": jnp.asarray(kernel),
                    "bias": jnp.asarray(lin.bias.detach().numpy())}},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))  # (N, P, P, C)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_backbone_stage_matches_torch():
    """Two convs + relu + 2x2 maxpool with imported weights reproduce the
    reference VGG stage forward (``pt/modeling/backbone/vgg.py:65-73``)."""
    import flax.linen as nn

    from probabilisticteacher_tpu.modeling.backbone import _max_pool_2x2

    torch.manual_seed(2)
    conv1 = torch.nn.Conv2d(3, 8, 3, padding=1)
    conv2 = torch.nn.Conv2d(8, 8, 3, padding=1)
    x = torch.randn(1, 3, 16, 20)
    with torch.no_grad():
        ref = torch.nn.functional.max_pool2d(
            torch.relu(conv2(torch.relu(conv1(x)))), 2, 2).numpy()

    def ours(xx):
        for tc in (conv1, conv2):
            k = jnp.asarray(tc.weight.detach().numpy().transpose(2, 3, 1, 0))
            b = jnp.asarray(tc.bias.detach().numpy())
            xx = nn.relu(nn.Conv(tc.out_channels, (3, 3), padding=1).apply(
                {"params": {"kernel": k, "bias": b}}, xx))
        return _max_pool_2x2(xx)

    out = ours(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-5, atol=1e-5)


# ------------------------------------------------------------- end-to-end IO
def _arch(num_classes=8, learnable=True):
    cfg = get_cfg()
    cfg.MODEL.VGG.PRETRAIN = ""
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = num_classes
    if learnable:
        cfg.MODEL.ANCHOR_GENERATOR.NAME = "DifferentiableAnchorGenerator"
    return Arch.from_cfg(cfg), cfg


def _reference_state_dict(det: PTDetector, seed=0):
    """A torch state_dict with the reference's exact names/shapes, random
    values; VGG-16, A anchors, K classes read off the detector."""
    rng = np.random.RandomState(seed)
    sd = {}

    def t(*shape):
        return torch.from_numpy(rng.randn(*shape).astype(np.float32))

    from probabilisticteacher_tpu.modeling.backbone import VGG_STAGES

    in_ch = 3
    for b, channels in enumerate(VGG_STAGES[det.arch.vgg_depth], start=1):
        for c, out_ch in enumerate(channels, start=1):
            sd[f"backbone.vgg_block{b}.0.conv{c}.weight"] = t(out_ch, in_ch, 3, 3)
            sd[f"backbone.vgg_block{b}.0.conv{c}.bias"] = t(out_ch)
            in_ch = out_ch
    a, k = det.A, det.arch.num_classes
    sd["proposal_generator.rpn_head.conv.weight"] = t(512, 512, 3, 3)
    sd["proposal_generator.rpn_head.conv.bias"] = t(512)
    sd["proposal_generator.rpn_head.objectness_logits.weight"] = t(a, 512, 1, 1)
    sd["proposal_generator.rpn_head.objectness_logits.bias"] = t(a)
    sd["proposal_generator.rpn_head.anchor_deltas.weight"] = t(a * 8, 512, 1, 1)
    sd["proposal_generator.rpn_head.anchor_deltas.bias"] = t(a * 8)
    sd["roi_heads.box_head.fc1.weight"] = t(1024, 512 * 7 * 7) * 0.01
    sd["roi_heads.box_head.fc1.bias"] = t(1024)
    sd["roi_heads.box_head.fc2.weight"] = t(1024, 1024) * 0.01
    sd["roi_heads.box_head.fc2.bias"] = t(1024)
    sd["roi_heads.box_predictor.cls_score.weight"] = t(k + 1, 1024) * 0.01
    sd["roi_heads.box_predictor.cls_score.bias"] = t(k + 1)
    sd["roi_heads.box_predictor.bbox_pred.weight"] = t(k * 8, 1024) * 0.01
    sd["roi_heads.box_predictor.bbox_pred.bias"] = t(k * 8)
    if det.arch.learnable_anchors:
        sd["proposal_generator.anchor_generator.anchor_0"] = t(a, 2).abs() * 100
    # buffers the importer must ignore (detection_checkpoint.py:41-49)
    sd["pixel_mean"] = torch.zeros(3, 1, 1)
    sd["pixel_std"] = torch.ones(3, 1, 1)
    return sd


def test_full_import_covers_every_param(tmp_path):
    arch, _ = _arch()
    det = PTDetector(arch)
    params = det.init(jax.random.key(0), (64, 64))
    sd = _reference_state_dict(det)
    npsd = {k: v.numpy() for k, v in sd.items()}
    new, report = d2_to_params(npsd, params)

    assert report["missing"] == [], report["missing"]
    assert report["incorrect_shapes"] == []
    assert report["unexpected"] == []
    # spot-check each conversion family against an independent restatement
    np.testing.assert_array_equal(
        new["backbone"]["block3_conv2"]["kernel"],
        npsd["backbone.vgg_block3.0.conv2.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        new["rpn_head"]["deltas"]["bias"],
        npsd["proposal_generator.rpn_head.anchor_deltas.bias"])
    np.testing.assert_array_equal(
        new["predictor"]["bbox_pred"]["kernel"],
        npsd["roi_heads.box_predictor.bbox_pred.weight"].T)
    np.testing.assert_array_equal(
        new["anchor_wh"], npsd["proposal_generator.anchor_generator.anchor_0"])
    f = npsd["roi_heads.box_head.fc1.weight"]
    np.testing.assert_array_equal(
        new["box_head"]["fc1"]["kernel"],
        f.reshape(1024, 512, 7, 7).transpose(2, 3, 1, 0).reshape(7 * 7 * 512, 1024))


def test_ensemble_pth_roundtrip_detect_outputs(tmp_path):
    """Save an EnsembleTSModel .pth; load via load_detectron2_weights; detect
    outputs must be bit-identical to a directly-assigned param tree."""
    arch, _ = _arch()
    det = PTDetector(arch)
    params = det.init(jax.random.key(0), (64, 64))
    student_sd = _reference_state_dict(det, seed=3)
    teacher_sd = _reference_state_dict(det, seed=4)
    full = {f"modelStudent.{k}": v for k, v in student_sd.items()}
    full.update({f"modelTeacher.{k}": v for k, v in teacher_sd.items()})
    path = str(tmp_path / "ensemble.pth")
    torch.save({"model": full, "iteration": 29999}, path)
    assert is_d2_checkpoint(path)

    state = TrainState(step=jnp.asarray(0, jnp.int32), student=params,
                       teacher=jax.tree.map(jnp.copy, params), opt_state={})
    loaded = load_detectron2_weights(path, state)

    expect_student, _ = d2_to_params(
        {k: v.numpy() for k, v in student_sd.items()}, params)
    expect_teacher, _ = d2_to_params(
        {k: v.numpy() for k, v in teacher_sd.items()}, params)
    for got, want in ((loaded.student, expect_student),
                      (loaded.teacher, expect_teacher)):
        jax.tree.map(np.testing.assert_array_equal, got, want)

    # detect forward: importer-loaded == directly-assigned, bit-equal
    from probabilisticteacher_tpu.structures import ImageBatch

    rng = np.random.RandomState(0)
    img = ImageBatch(
        image=jnp.asarray(rng.randint(0, 255, (1, 64, 64, 3), np.uint8)),
        image_hw=jnp.asarray([[64.0, 64.0]]))
    det_fn = jax.jit(lambda p: det.detect(p, img))
    out_a = jax.device_get(det_fn(loaded.student))
    out_b = jax.device_get(det_fn(expect_student))
    jax.tree.map(np.testing.assert_array_equal, out_a, out_b)
    # and the loaded weights actually changed the outputs vs init
    out_init = jax.device_get(det_fn(params))
    assert not np.allclose(np.asarray(out_a.scores), np.asarray(out_init.scores))


def test_student_only_checkpoint_fills_both_slots(tmp_path):
    arch, _ = _arch(learnable=False)
    det = PTDetector(arch)
    params = det.init(jax.random.key(1), (64, 64))
    sd = _reference_state_dict(det, seed=5)
    sd.pop("proposal_generator.anchor_generator.anchor_0", None)
    path = str(tmp_path / "student.pth")
    torch.save({"model": sd}, path)

    state = TrainState(step=jnp.asarray(0, jnp.int32), student=params,
                       teacher=jax.tree.map(jnp.copy, params), opt_state={})
    loaded = load_detectron2_weights(path, state)
    jax.tree.map(np.testing.assert_array_equal, loaded.student, loaded.teacher)
    np.testing.assert_array_equal(
        loaded.student["rpn_head"]["conv"]["bias"],
        sd["proposal_generator.rpn_head.conv.bias"].numpy())


def test_shape_mismatch_keeps_init_and_reports():
    """A 9-class checkpoint into an 8-class model: predictor heads skipped with
    a report entry, everything else loaded (fvcore skip semantics)."""
    arch9, _ = _arch(num_classes=9)
    arch8, _ = _arch(num_classes=8)
    sd = {k: v.numpy() for k, v in
          _reference_state_dict(PTDetector(arch9), seed=6).items()}
    det8 = PTDetector(arch8)
    params = det8.init(jax.random.key(2), (64, 64))
    new, report = d2_to_params(sd, params)
    skipped = {k for k, _, _ in report["incorrect_shapes"]}
    assert "roi_heads.box_predictor.cls_score.weight" in skipped
    assert "roi_heads.box_predictor.bbox_pred.weight" in skipped
    np.testing.assert_array_equal(new["predictor"]["cls_score"]["kernel"],
                                  params["predictor"]["cls_score"]["kernel"])
    np.testing.assert_array_equal(  # backbone still loads
        new["backbone"]["block1_conv1"]["bias"],
        sd["backbone.vgg_block1.0.conv1.bias"])


def test_module_prefix_and_raw_state_dict(tmp_path):
    """DDP 'module.' prefixes are stripped; a raw (no 'model' wrapper) save
    loads too (the reference strips module. in _load_student_model)."""
    arch, _ = _arch(learnable=False)
    det = PTDetector(arch)
    sd = _reference_state_dict(det, seed=7)
    wrapped = {f"module.{k}": v for k, v in sd.items()}
    path = str(tmp_path / "raw.pth")
    torch.save(wrapped, path)
    flat = read_checkpoint_file(path)
    student, teacher = split_ensemble(flat)
    assert teacher is None
    assert "backbone.vgg_block1.0.conv1.weight" in student
