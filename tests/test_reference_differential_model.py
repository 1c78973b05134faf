"""Model-level differential tests against the reference's OWN torch code.

Extends ``tests/test_reference_differential.py`` from leaf formula modules to
the METHOD level: the heavy reference modules

- ``pt/modeling/roi_heads/fast_rcnn.py``  (GuassianFastRCNNOutputLayers +
  ``fast_rcnn_inference_single_image``, /root/reference lines 34-336)
- ``pt/modeling/proposal_generator/rpn.py`` (GuassianRPN.loss_rpn_unsupervised,
  lines 257-361)

import cleanly with torch-cpu once the detectron2/fvcore symbols they touch are
shimmed (registries, Boxes/Instances, batched_nms, configurable — each shim is
a few lines of published-semantics glue; the behavior under test executes from
the reference files). The loss methods read only a handful of ``self``
attributes, so they are invoked on ``object.__new__`` instances.

This certifies, by differential execution on identical random inputs:
- ROI soft-CE unsup loss incl. EFL entropy weighting (fast_rcnn.py:179-213)
- ROI box KL consistency loss, Gaussian + Laplace, incl. EFL (215-263)
- ROI supervised probabilistic box NLL w/ class-specific 8-dim slices (265-336)
- the full sigma-discounted class-NMS teacher/inference orchestration (34-120)
- RPN unsupervised soft-label cls + box KL losses (rpn.py:257-361)

Skipped cleanly when the reference checkout or torch is absent.
"""

from __future__ import annotations

import importlib.util
import math
import sys
import types
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REF / "pt" / "modeling" / "roi_heads" / "fast_rcnn.py").exists(),
    reason="reference checkout not available",
)

torch = pytest.importorskip("torch")
F = torch.nn.functional


# --------------------------------------------------------------------------
# shims: the detectron2/fvcore surface the reference modules import. Glue only
# — published semantics, a few lines each; everything interesting runs from
# the reference sources.
# --------------------------------------------------------------------------


class _Boxes:
    """detectron2.structures.Boxes: tensor wrapper + clamp-clip + cat."""

    def __init__(self, tensor):
        self.tensor = tensor

    def clip(self, image_shape):
        h, w = image_shape
        self.tensor[:, 0].clamp_(min=0, max=w)
        self.tensor[:, 1].clamp_(min=0, max=h)
        self.tensor[:, 2].clamp_(min=0, max=w)
        self.tensor[:, 3].clamp_(min=0, max=h)

    @classmethod
    def cat(cls, boxes_list):
        return cls(torch.cat([b.tensor for b in boxes_list], dim=0))

    def __getitem__(self, item):
        return _Boxes(self.tensor[item])

    def nonempty(self, threshold=0.0):
        w = self.tensor[:, 2] - self.tensor[:, 0]
        h = self.tensor[:, 3] - self.tensor[:, 1]
        return (w > threshold) & (h > threshold)

    def __len__(self):
        return self.tensor.shape[0]


class _Instances:
    """detectron2.structures.Instances: field dict with attribute routing
    (the reference's FreeInstances subclasses this and relaxes ``set``)."""

    def __init__(self, image_size, **kwargs):
        self._image_size = image_size
        self._fields = {}
        for k, v in kwargs.items():
            self.set(k, v)

    def __setattr__(self, name, val):
        if name.startswith("_"):
            super().__setattr__(name, val)
        else:
            self.set(name, val)

    def __getattr__(self, name):
        fields = self.__dict__.get("_fields")
        if not fields or name not in fields:
            raise AttributeError(name)
        return fields[name]

    def set(self, name, value):
        self._fields[name] = value

    def has(self, name):
        return name in self._fields

    @property
    def image_size(self):
        return self._image_size

    def __len__(self):
        for v in self._fields.values():
            return len(v)
        return 0


def _torch_nms(boxes, scores, thresh):
    """Greedy NMS, torchvision semantics: descending-score order, suppress
    strictly ``iou > thresh`` (no +1 in areas)."""
    order = torch.argsort(scores, descending=True)
    x1, y1, x2, y2 = boxes.unbind(-1)
    areas = (x2 - x1) * (y2 - y1)
    keep = []
    while order.numel() > 0:
        i = order[0]
        keep.append(int(i))
        if order.numel() == 1:
            break
        rest = order[1:]
        xx1 = torch.maximum(x1[i], x1[rest])
        yy1 = torch.maximum(y1[i], y1[rest])
        xx2 = torch.minimum(x2[i], x2[rest])
        yy2 = torch.minimum(y2[i], y2[rest])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[i] + areas[rest] - inter)
        order = rest[iou <= thresh]
    return torch.as_tensor(keep, dtype=torch.long)


def _torch_batched_nms(boxes, scores, idxs, thresh):
    """detectron2/torchvision batched_nms via the per-class coordinate offset."""
    if boxes.numel() == 0:
        return torch.empty(0, dtype=torch.long)
    offset = idxs.to(boxes) * (boxes.max() + 1.0)
    return _torch_nms(boxes + offset[:, None], scores, thresh)


class _Registry:
    def register(self, obj=None):
        if obj is None:
            return lambda x: x
        return obj


def _module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def _shim_modules():
    """Full sys.modules overlay needed to import the reference fast_rcnn.py and
    rpn.py. Keys are module names; values module objects."""
    nn = torch.nn

    class _ShapeSpec:
        def __init__(self, channels=0, height=None, width=None, stride=None):
            self.channels, self.height, self.width, self.stride = (
                channels, height, width, stride)

    def _configurable(fn=None, *, from_config=None):
        return fn if fn is not None else (lambda f: f)

    def _unused(*a, **k):
        raise NotImplementedError

    mods = {}

    mods["fvcore"] = _module("fvcore")
    mods["fvcore.nn"] = _module("fvcore.nn", giou_loss=_unused, smooth_l1_loss=_unused)
    mods["fvcore"].nn = mods["fvcore.nn"]

    d2 = _module("detectron2")
    mods["detectron2"] = d2
    mods["detectron2.config"] = _module("detectron2.config", configurable=_configurable)
    mods["detectron2.layers"] = _module(
        "detectron2.layers",
        ShapeSpec=_ShapeSpec,
        batched_nms=_torch_batched_nms,
        cat=lambda ts, dim=0: torch.cat(ts, dim),
        cross_entropy=F.cross_entropy,
        nonzero_tuple=lambda x: torch.nonzero(x, as_tuple=True),
    )
    mods["detectron2.structures"] = _module(
        "detectron2.structures", Boxes=_Boxes, Instances=_Instances,
        ImageList=type("ImageList", (), {}),
        pairwise_iou=_unused,
    )
    mods["detectron2.utils"] = _module("detectron2.utils")
    mods["detectron2.utils.events"] = _module(
        "detectron2.utils.events", get_event_storage=_unused)
    mods["detectron2.utils.memory"] = _module(
        "detectron2.utils.memory", retry_if_cuda_oom=lambda f: f)
    mods["detectron2.modeling"] = _module("detectron2.modeling")
    mods["detectron2.modeling.roi_heads"] = _module("detectron2.modeling.roi_heads")
    mods["detectron2.modeling.roi_heads.fast_rcnn"] = _module(
        "detectron2.modeling.roi_heads.fast_rcnn",
        FastRCNNOutputLayers=type("FastRCNNOutputLayers", (nn.Module,), {}),
    )
    mods["detectron2.modeling.anchor_generator"] = _module(
        "detectron2.modeling.anchor_generator", build_anchor_generator=_unused)
    mods["detectron2.modeling.matcher"] = _module(
        "detectron2.modeling.matcher", Matcher=type("Matcher", (), {}))
    mods["detectron2.modeling.proposal_generator"] = _module(
        "detectron2.modeling.proposal_generator",
        RPN=type("RPN", (nn.Module,), {}),
        StandardRPNHead=type("StandardRPNHead", (nn.Module,), {}),
    )
    mods["detectron2.modeling.proposal_generator.build"] = _module(
        "detectron2.modeling.proposal_generator.build",
        PROPOSAL_GENERATOR_REGISTRY=_Registry(),
    )
    mods["detectron2.modeling.proposal_generator.rpn"] = _module(
        "detectron2.modeling.proposal_generator.rpn",
        RPN_HEAD_REGISTRY=_Registry(), build_rpn_head=_unused,
    )
    mods["detectron2.modeling.proposal_generator.proposal_utils"] = _module(
        "detectron2.modeling.proposal_generator.proposal_utils",
        _is_tracing=lambda: False,
    )
    mods["detectron2.solver"] = _module("detectron2.solver")

    # parent packages for the reference's own `pt.` imports
    for name in ("pt", "pt.modeling", "pt.modeling.roi_heads",
                 "pt.modeling.proposal_generator", "pt.structures"):
        mods[name] = _module(name)
    return mods


def _load(rel: str, name: str):
    spec = importlib.util.spec_from_file_location(name, str(REF / rel))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    """Loads the reference box_regression, instances, fast_rcnn and rpn modules
    under the shim overlay; restores sys.modules afterwards (loaded reference
    modules keep direct references to the shims)."""
    shims = _shim_modules()
    saved = {k: sys.modules.get(k) for k in shims}
    sys.modules.update(shims)
    try:
        br = _load("pt/modeling/box_regression.py", "pt.modeling.box_regression")
        inst = _load("pt/structures/instances.py", "pt.structures.instances")
        utils = _load("pt/modeling/utils.py", "pt.modeling.utils")
        pu = _load("pt/modeling/proposal_generator/proposal_utils.py",
                   "pt.modeling.proposal_generator.proposal_utils")
        fr = _load("pt/modeling/roi_heads/fast_rcnn.py",
                   "pt.modeling.roi_heads.fast_rcnn")
        rpn = _load("pt/modeling/proposal_generator/rpn.py",
                    "pt.modeling.proposal_generator.rpn")
        yield types.SimpleNamespace(
            box_regression=br, instances=inst, utils=utils,
            proposal_utils=pu, fast_rcnn=fr, rpn=rpn)
    finally:
        for k, old in saved.items():
            if old is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = old


def _rand_boxes(rng, n, span=600.0):
    x1 = rng.uniform(0, span * 0.7, n)
    y1 = rng.uniform(0, span * 0.7, n)
    w = rng.uniform(2.0, span * 0.25, n)
    h = rng.uniform(2.0, span * 0.25, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


# --------------------------------------------------------------------------
# ROI unsupervised losses (fast_rcnn.py:179-263)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("efl", [False, True])
def test_roi_cls_loss_unsupervised_matches_reference(ref, efl):
    """ops/losses.py::roi_soft_cls_loss vs GuassianFastRCNNOutputLayers.
    cls_loss_unsupervised (fast_rcnn.py:179-213): soft-CE with temperature
    tau[0], optional EFL entropy weight (1 - H/Hmax)^lambda[0], mean over rows."""
    from probabilisticteacher_tpu.ops import losses as L

    rng = np.random.default_rng(10)
    n, kp1 = 96, 9
    q = rng.normal(0, 2, (n, kp1)).astype(np.float32)
    t = rng.normal(0, 2, (n, kp1)).astype(np.float32)

    self = object.__new__(ref.fast_rcnn.GuassianFastRCNNOutputLayers)
    want = ref.fast_rcnn.GuassianFastRCNNOutputLayers.cls_loss_unsupervised(
        self, torch.from_numpy(q), torch.from_numpy(t),
        entropy_weight=efl, weight_lambda=[0.5, 0.5], tau=[0.25, 0.25],
    )["loss_cls"].item()

    got = float(L.roi_soft_cls_loss(
        jnp.asarray(q), jnp.asarray(t), jnp.ones((n,), bool),
        tau0=0.25, efl=efl, lam0=0.5))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("model_type", ["GUASSIAN", "LAPLACE"])
@pytest.mark.parametrize("efl", [False, True])
def test_roi_box_reg_loss_unsupervised_matches_reference(ref, model_type, efl):
    """ops/losses.py::kl_consistency_box_loss (mean reduction) vs
    box_reg_loss_unsupervised (fast_rcnn.py:215-263): sigma_p = sigmoid(raw),
    EFL weight from sigma_p BEFORE tau scaling, then sigma_p *= tau[1];
    Gaussian/Laplace KL(q||p), element mean."""
    from probabilisticteacher_tpu.ops import losses as L

    rng = np.random.default_rng(11)
    n = 64
    mean_q = rng.normal(0, 1, (n, 4)).astype(np.float32)
    sigma_q = rng.normal(0, 1, (n, 4)).astype(np.float32)
    mean_p = rng.normal(0, 1, (n, 4)).astype(np.float32)
    sigma_p = rng.normal(0, 1, (n, 4)).astype(np.float32)

    self = object.__new__(ref.fast_rcnn.GuassianFastRCNNOutputLayers)
    self.model_type = model_type
    want = ref.fast_rcnn.GuassianFastRCNNOutputLayers.box_reg_loss_unsupervised(
        self, *(torch.from_numpy(a) for a in (mean_q, sigma_q, mean_p, sigma_p)),
        entropy_weight=efl, weight_lambda=[0.5, 0.5], tau=[0.25, 0.25],
    )["loss_box_reg"].item()

    got = float(L.kl_consistency_box_loss(
        jnp.asarray(mean_q), jnp.asarray(sigma_q), jnp.asarray(mean_p),
        jnp.asarray(sigma_p), jnp.ones((n,), bool),
        tau1=0.25, efl=efl, lam1=0.5, model_type=model_type, reduction="mean"))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("model_type", ["GUASSIAN", "LAPLACE"])
def test_roi_supervised_box_reg_loss_matches_reference(ref, model_type):
    """ops/losses.py::prob_box_nll_sum composed as in detector._roi_sup_loss_tail
    vs GuassianFastRCNNOutputLayers.box_reg_loss (fast_rcnn.py:265-336): fg rows
    (0 <= gt_class < K), class-specific 8-dim delta slice, -log(pdf + 1e-9)
    summed over fg, normalized by ALL rows."""
    from probabilisticteacher_tpu.ops import losses as L
    from probabilisticteacher_tpu.ops.box_regression import get_deltas

    rng = np.random.default_rng(12)
    r, k = 80, 8
    weights = (10.0, 10.0, 5.0, 5.0)
    prop = _rand_boxes(rng, r)
    gt = _rand_boxes(rng, r)
    deltas = rng.normal(0, 1, (r, k * 8)).astype(np.float32)
    gt_classes = rng.integers(0, k + 1, r)  # k == background

    self = object.__new__(ref.fast_rcnn.GuassianFastRCNNOutputLayers)
    self.model_type = model_type
    self.num_classes = k
    self.box2box_transform = ref.box_regression.Box2BoxTransform(weights=weights)
    want = ref.fast_rcnn.GuassianFastRCNNOutputLayers.box_reg_loss(
        self, torch.from_numpy(prop), torch.from_numpy(gt),
        torch.from_numpy(deltas), torch.from_numpy(gt_classes),
    ).item()

    cls_idx = np.clip(gt_classes, 0, k - 1)
    sel = jnp.asarray(deltas.reshape(r, k, 8)[np.arange(r), cls_idx])
    gt_d = get_deltas(jnp.asarray(prop), jnp.asarray(gt), weights)
    fg = jnp.asarray(gt_classes < k)
    got = float(L.prob_box_nll_sum(sel[:, :4], sel[:, 4:], gt_d, fg, model_type)) / r
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------------
# sigma-discounted class-NMS inference (fast_rcnn.py:34-120)
# --------------------------------------------------------------------------


def test_fast_rcnn_inference_matches_reference(ref):
    """detector._roi_inference vs the reference fast_rcnn_inference_single_image
    fed the SAME head outputs: per-class decode of the mean 4 of each 8-block,
    clip, score_thresh filter on pre-discount softmax, sigma discount
    1 - sum(sigmoid(sigma))/4, class-aware NMS, topk; keeps raw logits + sigma
    (fast_rcnn.py:34-120 + predict_boxes/predict_probs 363-409)."""
    from probabilisticteacher_tpu.modeling.detector import Arch, PTDetector
    from probabilisticteacher_tpu.structures import ImageBatch, Proposals

    arch = Arch(
        num_classes=3, vgg_depth=11,
        rpn_pre_nms_topk=(64, 64), rpn_post_nms_topk=(32, 48),
        rpn_batch_per_image=16, roi_batch_per_image=16,
        detections_per_image=8, unsup_roi_budget=16, fc_dim=32,
    )
    det = PTDetector(arch)
    params = det.init(jax.random.key(0), (64, 64))

    rng = np.random.default_rng(13)
    p, k = 24, arch.num_classes
    images = ImageBatch(
        image=jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)),
        image_hw=jnp.asarray([[64.0, 64.0]]),
    )
    boxes = _rand_boxes(rng, p, span=64.0)
    feat = det.features(params, images)
    proposals = Proposals(
        boxes=jnp.asarray(boxes)[None],
        logits=jnp.zeros((1, p), jnp.float32),
        valid=jnp.ones((1, p), bool),
    )
    # real head outputs drive BOTH sides
    logits, pdeltas = det.roi_predict(params, feat, proposals.boxes)
    logits_t = torch.from_numpy(np.asarray(logits[0]))
    deltas_t = torch.from_numpy(np.asarray(pdeltas[0]))

    dets = det._roi_inference(params, feat, proposals, images.image_hw)
    nvalid = int(np.sum(np.asarray(dets.valid[0])))

    b2b = ref.box_regression.Box2BoxTransform(weights=arch.roi_reg_weights)
    # predict_boxes (fast_rcnn.py:363-390): apply_deltas on the full K*8 vector
    pred_boxes = b2b.apply_deltas(deltas_t, torch.from_numpy(boxes))
    scores_t = F.softmax(logits_t, dim=-1)
    result, _ = ref.fast_rcnn.fast_rcnn_inference_single_image(
        pred_boxes, scores_t, (64, 64),
        arch.score_thresh, arch.nms_thresh, arch.detections_per_image,
        cls_logist=logits_t, sigma_logit=deltas_t,
    )

    assert nvalid == len(result), (nvalid, len(result))
    assert nvalid >= 3, "degenerate test: too few detections survived"

    def _sorted(mat, scores):
        order = np.argsort(-scores, kind="stable")
        return np.asarray(mat)[order]

    got_scores = np.asarray(dets.scores[0][:nvalid])
    want_scores = result.scores.numpy()
    np.testing.assert_allclose(np.sort(got_scores)[::-1], np.sort(want_scores)[::-1],
                               rtol=1e-5, atol=1e-6)
    for got, want in [
        (dets.boxes[0][:nvalid], result.pred_boxes.tensor.numpy()),
        (np.asarray(dets.classes[0][:nvalid]).astype(np.int64), result.pred_classes.numpy()),
        (dets.logits[0][:nvalid], result.scores_logists.numpy()),
        (dets.sigma[0][:nvalid], result.boxes_sigma.numpy()),
    ]:
        np.testing.assert_allclose(
            _sorted(got, got_scores), _sorted(want, want_scores),
            rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------
# RPN proposal selection (proposal_utils.py:27-154)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("training", [False, True])
def test_find_top_rpn_proposals_matches_reference(ref, training):
    """detector.predict_proposals vs the reference's own find_top_rpn_proposals
    (proposal_utils.py:27-154): pre-NMS topk by objectness, decode, clip,
    min-size filter, sigma rescale ``score *= 1 - sum(sigmoid(sigma))/4``,
    greedy NMS at 0.7, post-NMS topk.

    Objectness logits are PRE-SORTED descending per image so the reference's
    sigma ``narrow`` (proposal_utils.py:93-95, which skips the topk reindex —
    the documented PARITY deviation 2) coincides with our gather-by-topk-index:
    on sorted inputs the fixed and reference paths are identical, making the
    rest of the pipeline differentiable-testable."""
    from probabilisticteacher_tpu.modeling.detector import Arch, PTDetector
    from probabilisticteacher_tpu.ops.box_regression import apply_deltas as jx_apply

    arch = Arch(
        num_classes=3, vgg_depth=11,
        rpn_pre_nms_topk=(64, 48), rpn_post_nms_topk=(32, 24),
        rpn_batch_per_image=16, roi_batch_per_image=16,
        detections_per_image=8, unsup_roi_budget=16, fc_dim=32,
    )
    det = PTDetector(arch)

    rng = np.random.default_rng(15)
    n, r = 2, 200
    obj = -np.sort(-rng.normal(0, 2, (n, r)).astype(np.float32), axis=1)
    deltas = rng.normal(0, 0.6, (n, r, 8)).astype(np.float32)
    anchors = _rand_boxes(rng, r, span=160.0)
    image_hw = np.asarray([[128.0, 160.0], [96.0, 128.0]], np.float32)

    props = det.predict_proposals(
        jnp.asarray(anchors), jnp.asarray(obj), jnp.asarray(deltas),
        jnp.asarray(image_hw), training=training)

    b2b = ref.box_regression.Box2BoxTransform(weights=arch.rpn_reg_weights)
    decoded = torch.stack([
        b2b.apply_deltas(torch.from_numpy(deltas[i, :, :4]),
                         torch.from_numpy(anchors))
        for i in range(n)
    ])
    results = ref.proposal_utils.find_top_rpn_proposals(
        proposals=[decoded],
        pred_objectness_logits=[torch.from_numpy(obj)],
        image_sizes=[tuple(map(int, hw)) for hw in image_hw],
        nms_thresh=arch.rpn_nms_thresh,
        pre_nms_topk=arch.rpn_pre_nms_topk[int(training)],
        post_nms_topk=arch.rpn_post_nms_topk[int(training)],
        min_box_size=arch.rpn_min_size,
        training=training,
        pred_anchor_deltas_sigma=[torch.from_numpy(deltas[..., 4:])],
    )

    for i in range(n):
        nvalid = int(np.sum(np.asarray(props.valid[i])))
        want_boxes = results[i].proposal_boxes.tensor.numpy()
        want_scores = results[i].objectness_logits.numpy()
        assert nvalid == len(want_boxes), (i, nvalid, len(want_boxes))
        assert nvalid >= 5, "degenerate test: too few proposals survived"
        got_scores = np.asarray(props.logits[i][:nvalid])
        got_boxes = np.asarray(props.boxes[i][:nvalid])
        order_g = np.argsort(-got_scores, kind="stable")
        order_w = np.argsort(-want_scores, kind="stable")
        np.testing.assert_allclose(got_scores[order_g], want_scores[order_w],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got_boxes[order_g], want_boxes[order_w],
                                   rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------
# RPN unsupervised losses (rpn.py:257-361)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("efl", [False, True])
def test_rpn_loss_unsupervised_matches_reference(ref, efl):
    """ops/losses.py::{rpn_soft_cls_loss, kl_consistency_box_loss} composed as in
    detector._rpn_unsup_losses vs GuassianRPN.loss_rpn_unsupervised
    (rpn.py:257-361): 2-class soft target [p_bg, p_fg] from teacher K+1 logits
    at tau[0], the sigmoid([1-o, o]) + 1e-9 form, fg filter by pre-softmax
    argmax != bg, box KL from get_deltas(anchors, matched_box) at tau[1],
    both divided by batch_size_per_image * num_images."""
    from probabilisticteacher_tpu.ops import losses as L
    from probabilisticteacher_tpu.ops.box_regression import get_deltas

    rng = np.random.default_rng(14)
    bs, r, kp1 = 2, 48, 9
    batch_size_per_image = 16

    obj = rng.normal(0, 1.5, (bs, r)).astype(np.float32)
    deltas = rng.normal(0, 1, (bs, r, 8)).astype(np.float32)
    amask = rng.random((bs, r)) < 0.4
    amask[:, 0] = True  # at least one masked anchor per image
    t_logits = rng.normal(0, 2, (bs, r, kp1)).astype(np.float32)
    t_sigma = rng.normal(0, 1, (bs, r, 4)).astype(np.float32)
    t_boxes = np.stack([_rand_boxes(rng, r) for _ in range(bs)])
    anchors = _rand_boxes(rng, r)

    rpn_self = object.__new__(ref.rpn.GuassianRPN)
    rpn_self.batch_size_per_image = batch_size_per_image
    rpn_self.box2box_transform = ref.box_regression.Box2BoxTransform(
        weights=(1.0, 1.0, 1.0, 1.0))
    rpn_self.cfg = types.SimpleNamespace(
        UNSUPNET=types.SimpleNamespace(MODEL_TYPE="GUASSIAN"))

    Boxes = ref.fast_rcnn.Boxes  # the shim class bound into the loaded module
    want = ref.rpn.GuassianRPN.loss_rpn_unsupervised(
        rpn_self,
        pred_objectness_logits=[torch.from_numpy(obj)],
        gt_labels=[torch.from_numpy(t_logits[i][amask[i]]) for i in range(bs)],
        pred_anchor_deltas=[torch.from_numpy(deltas)],
        anchor_masks=[torch.from_numpy(amask[i]) for i in range(bs)],
        matched_gt_boxes=[torch.from_numpy(t_boxes[i]) for i in range(bs)],
        matched_boxes_sigma=[torch.from_numpy(t_sigma[i][amask[i]]) for i in range(bs)],
        anchors=[Boxes(torch.from_numpy(anchors))],
        entropy_weight=efl, weight_lamuda=[0.5, 0.5], tau=[0.25, 0.25],
        box=True,
    )
    want_cls = want["loss_rpn_cls"].item()
    want_loc = want["loss_rpn_loc"].item()

    normalizer = batch_size_per_image * bs
    got_cls = float(L.rpn_soft_cls_loss(
        jnp.asarray(obj), jnp.asarray(t_logits), jnp.asarray(amask),
        tau0=0.25, efl=efl, lam0=0.5)) / normalizer
    fg = np.argmax(t_logits, axis=-1) != (kp1 - 1)
    mean_p = get_deltas(
        jnp.broadcast_to(jnp.asarray(anchors), t_boxes.shape),
        jnp.asarray(t_boxes), (1.0, 1.0, 1.0, 1.0))
    got_loc = float(L.kl_consistency_box_loss(
        jnp.asarray(deltas[..., :4]), jnp.asarray(deltas[..., 4:]),
        mean_p, jnp.asarray(t_sigma), jnp.asarray(amask & fg),
        tau1=0.25, efl=efl, lam1=0.5, model_type="GUASSIAN",
        reduction="sum")) / normalizer

    np.testing.assert_allclose(got_cls, want_cls, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(got_loc, want_loc, rtol=1e-5, atol=1e-6)
