"""Probabilistic-Teacher detector: pure-functional meta-architecture.

TPU-native re-design of the reference's branch-dispatching model stack
(``pt/modeling/meta_arch/rcnn.py:30-92`` + ``GuassianRPN`` + ``GuassianROIHead``):
instead of one nn.Module called with a ``branch`` string, this module exposes pure
functions over an explicit param pytree:

- :func:`supervised_losses`    — branch "supervised"  (``rcnn.py:40-62``)
- :func:`pseudo_labels`        — branch "unsup_data_weak" teacher pass (``rcnn.py:64-78``)
- :func:`unsupervised_losses`  — branch "unsupervised" (+ anchor adaptation)
- :func:`detect`               — inference (``rcnn.py:33-34`` -> ``fast_rcnn.py:34-120``)

All functions are static-shape (padding + masks, see structures.py) and jit-friendly;
the trainer composes them into single compiled train steps (engine/steps.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import boxes as box_ops
from ..ops import losses as L
from ..ops.box_regression import apply_deltas, get_deltas
from ..ops.matcher import masked_iou, match
from ..ops.nms import batched_nms, nms
from ..ops.roi_align import roi_align_batched
from ..ops.sampling import subsample_labels
from ..structures import Detections, GroundTruth, ImageBatch, Proposals, PseudoLabels
from .anchors_build import anchor_boxes, init_anchor_params, num_cell_anchors
from .backbone import VGG
from .heads import BoxHead, FastRCNNPredictor, RPNHead


# --------------------------------------------------------------------------- #
# Static architecture config
# --------------------------------------------------------------------------- #
@dataclasses.dataclass(frozen=True)
class Arch:
    """Hashable static model hyperparameters (from the reference's cfg surface)."""

    num_classes: int = 8
    vgg_depth: int = 16
    feature: str = "vgg_block5"
    stride: int = 16
    # anchors
    anchor_sizes: Tuple[float, ...] = (128.0, 256.0, 512.0)
    anchor_aspects: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_offset: float = 0.0
    learnable_anchors: bool = False
    anchor_init_wh: Tuple[Tuple[float, float], ...] = (
        (181.0193, 90.5097), (128.0, 128.0), (90.5097, 181.0193),
        (362.0387, 181.0193), (256.0, 256.0), (181.0193, 362.0387),
        (724.0773, 362.0387), (512.0, 512.0), (362.0387, 724.0773),
    )
    # RPN
    rpn_boundary_thresh: float = -1.0  # MODEL.RPN.BOUNDARY_THRESH (-1 = off)
    rpn_iou_thresholds: Tuple[float, ...] = (0.3, 0.7)
    rpn_batch_per_image: int = 256
    rpn_pos_fraction: float = 0.25
    rpn_reg_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    rpn_pre_nms_topk: Tuple[int, int] = (6000, 12000)   # (test, train)
    rpn_post_nms_topk: Tuple[int, int] = (1000, 2000)   # (test, train)
    rpn_nms_thresh: float = 0.7
    rpn_min_size: float = 0.0
    rpn_loss_weight: float = 1.0
    # ROI
    roi_iou_threshold: float = 0.5
    roi_batch_per_image: int = 512
    roi_pos_fraction: float = 0.25
    roi_reg_weights: Tuple[float, ...] = (10.0, 10.0, 5.0, 5.0)
    pooler_resolution: int = 7
    pooler_sampling_ratio: int = 2
    fc_dim: int = 1024
    num_fc: int = 2
    proposal_append_gt: bool = True
    # test-time
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_image: int = 100
    # PT specifics
    model_type: str = "GUASSIAN"  # or "LAPLACE"
    # teacher weak-pass RPN budgets (UNSUPNET.TEACHER_{PRE,POST}_NMS_TOPK);
    # -1 = follow the train budgets (reference parity)
    teacher_pre_nms_topk: int = -1
    teacher_post_nms_topk: int = -1
    # teacher weak-pass class-NMS candidate prefilter
    # (UNSUPNET.TEACHER_NMS_CANDIDATES); -1 = all P*K candidates (parity)
    teacher_nms_candidates: int = -1
    tau: Tuple[float, float] = (0.5, 0.5)
    efl: bool = True
    efl_lambda: Tuple[float, float] = (0.5, 0.5)
    unsup_roi_budget: int = 512
    # preprocessing (Caffe-BGR, detectron2 defaults used by the reference)
    pixel_mean: Tuple[float, ...] = (103.530, 116.280, 123.675)
    pixel_std: Tuple[float, ...] = (1.0, 1.0, 1.0)
    compute_dtype: str = "float32"
    roi_align_impl: str = "auto"  # "auto" (pallas on TPU) | "mxu" | "gather" | "pallas"
    rpn_nms_impl: str = "greedy"  # "greedy" (exact, parity) | "maxpool" (fast approx)
    remat_backbone: bool = False  # jax.checkpoint the conv stack (memory <-> FLOPs)
    freeze_at: int = 2  # frozen VGG blocks (MODEL.BACKBONE.FREEZE_AT)

    @staticmethod
    def from_cfg(cfg) -> "Arch":
        m = cfg.MODEL
        return Arch(
            num_classes=m.ROI_HEADS.NUM_CLASSES,
            vgg_depth=m.VGG.DEPTH,
            feature=m.RPN.IN_FEATURES[0],
            stride=VGG.stride(m.RPN.IN_FEATURES[0]),
            anchor_sizes=tuple(float(s) for s in m.ANCHOR_GENERATOR.SIZES[0]),
            anchor_aspects=tuple(float(a) for a in m.ANCHOR_GENERATOR.ASPECT_RATIOS[0]),
            anchor_offset=float(m.ANCHOR_GENERATOR.OFFSET),
            learnable_anchors=(m.ANCHOR_GENERATOR.NAME == "DifferentiableAnchorGenerator"),
            anchor_init_wh=tuple(tuple(float(v) for v in wh) for wh in m.ANCHOR_GENERATOR.ANCHOR[0]),
            rpn_boundary_thresh=float(m.RPN.BOUNDARY_THRESH),
            rpn_iou_thresholds=tuple(m.RPN.IOU_THRESHOLDS),
            rpn_batch_per_image=m.RPN.BATCH_SIZE_PER_IMAGE,
            rpn_pos_fraction=m.RPN.POSITIVE_FRACTION,
            rpn_reg_weights=tuple(m.RPN.BBOX_REG_WEIGHTS),
            rpn_pre_nms_topk=(m.RPN.PRE_NMS_TOPK_TEST, m.RPN.PRE_NMS_TOPK_TRAIN),
            rpn_post_nms_topk=(m.RPN.POST_NMS_TOPK_TEST, m.RPN.POST_NMS_TOPK_TRAIN),
            rpn_nms_thresh=m.RPN.NMS_THRESH,
            rpn_min_size=float(m.PROPOSAL_GENERATOR.MIN_SIZE),
            rpn_loss_weight=float(m.RPN.LOSS_WEIGHT),
            roi_iou_threshold=m.ROI_HEADS.IOU_THRESHOLDS[0],
            roi_batch_per_image=m.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
            roi_pos_fraction=m.ROI_HEADS.POSITIVE_FRACTION,
            roi_reg_weights=tuple(m.ROI_BOX_HEAD.BBOX_REG_WEIGHTS),
            pooler_resolution=m.ROI_BOX_HEAD.POOLER_RESOLUTION,
            # SAMPLING_RATIO=0 in the reference means adaptive (dynamic shape);
            # static TPU equivalent: fixed 2x2 grid (DESIGN.md / ops/roi_align.py).
            pooler_sampling_ratio=m.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO or 2,
            fc_dim=m.ROI_BOX_HEAD.FC_DIM,
            num_fc=m.ROI_BOX_HEAD.NUM_FC,
            proposal_append_gt=m.ROI_HEADS.PROPOSAL_APPEND_GT,
            score_thresh=m.ROI_HEADS.SCORE_THRESH_TEST,
            nms_thresh=m.ROI_HEADS.NMS_THRESH_TEST,
            detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
            model_type=cfg.UNSUPNET.MODEL_TYPE,
            teacher_pre_nms_topk=int(cfg.UNSUPNET.get("TEACHER_PRE_NMS_TOPK", -1)),
            teacher_post_nms_topk=int(cfg.UNSUPNET.get("TEACHER_POST_NMS_TOPK", -1)),
            teacher_nms_candidates=int(cfg.UNSUPNET.get("TEACHER_NMS_CANDIDATES", -1)),
            tau=tuple(cfg.UNSUPNET.TAU),
            efl=cfg.UNSUPNET.EFL,
            efl_lambda=tuple(cfg.UNSUPNET.EFL_LAMBDA),
            unsup_roi_budget=cfg.UNSUPNET.UNSUP_ROI_BUDGET,
            pixel_mean=tuple(m.PIXEL_MEAN),
            pixel_std=tuple(m.PIXEL_STD),
            compute_dtype="bfloat16" if cfg.SOLVER.AMP.ENABLED else "float32",
            remat_backbone=bool(m.BACKBONE.get("REMAT", False)),
            rpn_nms_impl=m.RPN.get("NMS_IMPL", "greedy"),
            freeze_at=int(m.BACKBONE.FREEZE_AT),
        )


class PTDetector:
    """Binds an Arch to flax modules + pure forward/loss functions.

    The instance holds no state except module definitions; all parameters travel in an
    explicit pytree {"backbone", "rpn_head", "box_head", "predictor"[, "anchor_wh"]}.
    """

    def __init__(self, arch: Arch):
        self.arch = arch
        dtype = jnp.bfloat16 if arch.compute_dtype == "bfloat16" else jnp.float32
        self.dtype = dtype
        self.A = num_cell_anchors(arch)
        self.backbone = VGG(depth=arch.vgg_depth, out_features=(arch.feature,),
                            dtype=dtype, freeze_at=arch.freeze_at)
        in_channels = VGG.out_channels(arch.vgg_depth, arch.feature)
        self.rpn_head = RPNHead(num_anchors=self.A, box_dim=8, conv_dim=in_channels, dtype=dtype)
        self.box_head = BoxHead(fc_dim=arch.fc_dim, num_fc=arch.num_fc, dtype=dtype)
        self.predictor = FastRCNNPredictor(num_classes=arch.num_classes, box_dim=8, dtype=dtype)

    # ----------------------------------------------------------------- init
    def init(self, rng: jax.Array, canvas_hw: Tuple[int, int] = (64, 64)) -> Dict[str, Any]:
        kb, kr, kh, kp = jax.random.split(rng, 4)
        h, w = canvas_hw
        a = self.arch
        dummy = jnp.zeros((1, h, w, 3), jnp.float32)
        bb = self.backbone.init(kb, dummy)["params"]
        feat = jnp.zeros((1, h // a.stride, w // a.stride,
                          VGG.out_channels(a.vgg_depth, a.feature)), jnp.float32)
        rp = self.rpn_head.init(kr, feat)["params"]
        pooled = jnp.zeros((1, 4, a.pooler_resolution, a.pooler_resolution, feat.shape[-1]), jnp.float32)
        bh = self.box_head.init(kh, pooled)["params"]
        pr = self.predictor.init(kp, jnp.zeros((1, 4, a.fc_dim), jnp.float32))["params"]
        params = {"backbone": bb, "rpn_head": rp, "box_head": bh, "predictor": pr}
        wh = init_anchor_params(a)
        if wh is not None:
            params["anchor_wh"] = wh
        return params

    # ------------------------------------------------------------ primitives
    def _nms(self, boxes, scores, valid, thresh, max_keep):
        """Exact greedy NMS; MODEL.RPN.NMS_IMPL selects the TPU formulation.

        "pallas" = VMEM scan kernel (ops/nms_pallas.py), "greedy"/"greedy_xla"
        = blocked fixed-point solver (ops/nms.py). Both are exact and
        keep-set-parity tested against each other — the switch is purely a
        performance choice, unlike maxpool/hybrid which change results.
        """
        if self.arch.rpn_nms_impl == "pallas":
            from ..ops.nms_pallas import nms as nms_scan

            return nms_scan(boxes, scores, valid, thresh, max_keep)
        return nms(boxes, scores, valid, thresh, max_keep)

    def _batched_nms(self, boxes, scores, idxs, valid, thresh, max_keep,
                     block_size=256):
        if self.arch.rpn_nms_impl == "pallas":
            from ..ops.nms_pallas import batched_nms as batched_nms_scan

            return batched_nms_scan(boxes, scores, idxs, valid, thresh, max_keep)
        return batched_nms(boxes, scores, idxs, valid, thresh, max_keep,
                           block_size=block_size)

    def preprocess(self, images: ImageBatch) -> jnp.ndarray:
        """Normalize raw pixels (Caffe-BGR mean/std), zero the padding, keep NHWC.

        detectron2 normalizes then pads with 0 (``ImageList.from_tensors``); with a
        pre-padded static canvas the equivalent is masking beyond image_hw after
        normalization.
        """
        mean = jnp.asarray(self.arch.pixel_mean, jnp.float32)
        std = jnp.asarray(self.arch.pixel_std, jnp.float32)
        x = (images.image.astype(jnp.float32) - mean) / std
        _, h, w, _ = x.shape
        ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        valid = (ys < images.image_hw[:, 0][:, None, None]) & (
            xs < images.image_hw[:, 1][:, None, None]
        )
        return x * valid[..., None]

    def features(self, params, images: ImageBatch) -> jnp.ndarray:
        x = self.preprocess(images)

        def run(p, xx):
            return self.backbone.apply({"params": p}, xx)[self.arch.feature]

        if self.arch.remat_backbone:
            run = jax.checkpoint(run)
        return run(params["backbone"], x)

    def anchors(self, params, feat_h: int, feat_w: int) -> jnp.ndarray:
        return anchor_boxes(params.get("anchor_wh"), self.arch, feat_h, feat_w)

    def rpn_predict(self, params, feat) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> objectness (N, R), deltas (N, R, 8)."""
        return self.rpn_head.apply({"params": params["rpn_head"]}, feat)

    def roi_predict(self, params, feat, boxes) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """ROIAlign + box head + predictor. boxes (N, B, 4) -> ((N, B, K+1), (N, B, K*8))."""
        a = self.arch
        # pooling runs in the backbone compute dtype (bf16 under AMP) with f32
        # accumulation inside the interp matmuls; the box head casts as needed
        pooled = roi_align_batched(
            feat, boxes, 1.0 / a.stride,
            a.pooler_resolution, a.pooler_sampling_ratio, impl=a.roi_align_impl,
        )
        x = self.box_head.apply({"params": params["box_head"]}, pooled)
        return self.predictor.apply({"params": params["predictor"]}, x)

    # ------------------------------------------------------------- proposals
    def _decode_clip_filter(self, d, anc, hw):
        """Shared tail of every proposal-selection path: decode the (pre, 8)
        deltas against their anchors, clip to the image, and build the
        nonempty & finite keep mask (``proposal_utils.py:96-132``; the
        reference RAISES on non-finite during training — we mask instead, a
        documented PARITY deviation surfaced via rpn/num_valid_proposals)."""
        a = self.arch
        boxes = apply_deltas(d[:, :4], anc, a.rpn_reg_weights)
        boxes = box_ops.clip_boxes(boxes, hw)
        keep = box_ops.nonempty(boxes, a.rpn_min_size)
        keep &= jnp.all(jnp.isfinite(boxes), axis=-1)
        return boxes, keep

    def predict_proposals(
        self, anchors, obj, deltas, image_hw, training: bool, grid_hw=None,
        budget=None,
    ) -> Proposals:
        """find_top_rpn_proposals (``proposal_utils.py:27-154``), static shapes.

        topk by objectness -> decode -> clip -> min-size filter -> sigma-rescored
        greedy NMS -> post-topk. The sigma rescale ``score *= 1 - mean(sigmoid(s))``
        follows ``proposal_utils.py:134-138``; unlike the reference we gather sigma
        by the same topk index as the proposals (the reference narrows sigma without
        reindexing — a bug we deliberately do not replicate).

        Gradients are stopped (reference decodes under no_grad, ``rpn.py:176``).
        """
        a = self.arch
        r = obj.shape[1]
        pre = min(budget[0] if budget else a.rpn_pre_nms_topk[int(training)], r)
        post = budget[1] if budget else a.rpn_post_nms_topk[int(training)]
        anchors = jax.lax.stop_gradient(anchors)
        obj = jax.lax.stop_gradient(obj)
        deltas = jax.lax.stop_gradient(deltas)

        use_maxpool = a.rpn_nms_impl == "maxpool" or (
            a.rpn_nms_impl == "maxpool_train" and training)
        if use_maxpool and grid_hw is not None:
            from ..ops.maxpool_nms import maxpool_nms_select

            def per_image_mp(obj_i, deltas_i, hw):
                rescale = 1.0 - jnp.mean(jax.nn.sigmoid(deltas_i[:, 4:]), axis=-1)
                scores = obj_i * rescale
                kidx, kvalid = maxpool_nms_select(scores, grid_hw, self.A, post)
                anc = jnp.take(anchors, kidx, axis=0)
                d = jnp.take(deltas_i, kidx, axis=0)
                boxes, ok = self._decode_clip_filter(d, anc, hw)
                return boxes, jnp.take(scores, kidx), kvalid & ok

            pb, ps, pv = jax.vmap(per_image_mp)(obj, deltas, image_hw)
            return Proposals(pb, ps, pv)

        # hybrid NMS: per-anchor-channel 3x3 local-max PREFILTER on the SAFE
        # anchor channels only, then EXACT greedy NMS on the top candidates.
        # Safe = a one-cell DIAGONAL neighbour of the same shape still overlaps
        # above the NMS threshold, i.e. exact NMS would suppress it anyway:
        # (1+t)(w-s)(h-s) >= 2t*wh for offset s = stride, which for w == h
        # means min(w, h) >= s / (1 - sqrt(2t/(1+t))) (~10.9x stride at t=0.7).
        # Channels below that keep every candidate (proxy diagnosis,
        # scripts/diagnose_levers.py: the unconditional 3x3 prefilter dropped
        # 41% of pseudo-label detections and collapsed the mutual loop — small
        # anchors one cell apart do NOT overlap at 0.7). Unlike full MaxpoolNMS
        # there is also NO cross-anchor max (that broke proxy run H).
        use_hybrid = a.rpn_nms_impl == "hybrid" and grid_hw is not None
        if use_hybrid:
            from ..ops.maxpool_nms import maxpool_keep

            hybrid_pre = min(pre, max(2 * post, 64))
            t = float(a.rpn_nms_thresh)
            q = float(np.sqrt(2.0 * t / (1.0 + t)))
            safe_min_wh = a.stride / max(1.0 - q, 1e-6)
            anc_wh = (anchors.reshape(grid_hw[0], grid_hw[1], self.A, 4)[0, 0]
                      if anchors.ndim == 2 else anchors)
            ch_safe = jnp.minimum(anc_wh[:, 2] - anc_wh[:, 0],
                                  anc_wh[:, 3] - anc_wh[:, 1]) >= safe_min_wh

            def per_image_hy(obj_i, deltas_i, hw):
                rescale = 1.0 - jnp.mean(jax.nn.sigmoid(deltas_i[:, 4:]), axis=-1)
                s_full = obj_i * rescale
                keep_g = maxpool_keep(
                    s_full.reshape(grid_hw[0], grid_hw[1], self.A),
                    cross_anchor=False,
                )
                keep_g = (keep_g | ~ch_safe[None, None, :]).reshape(-1)
                scores, idx = jax.lax.top_k(jnp.where(keep_g, s_full, -jnp.inf),
                                            hybrid_pre)
                d = jnp.take(deltas_i, idx, axis=0)
                anc = jnp.take(anchors, idx, axis=0)
                boxes, keep = self._decode_clip_filter(d, anc, hw)
                keep &= jnp.isfinite(scores)
                kidx, kvalid = self._nms(boxes, scores, keep, a.rpn_nms_thresh, post)
                return jnp.take(boxes, kidx, axis=0), jnp.take(scores, kidx), kvalid

            pb, ps, pv = jax.vmap(per_image_hy)(obj, deltas, image_hw)
            return Proposals(pb, ps, pv)

        def per_image(obj_i, deltas_i, hw):
            scores, idx = jax.lax.top_k(obj_i, pre)
            d = jnp.take(deltas_i, idx, axis=0)           # (pre, 8)
            anc = jnp.take(anchors, idx, axis=0)          # (pre, 4)
            boxes, keep = self._decode_clip_filter(d, anc, hw)
            keep &= jnp.isfinite(scores)
            rescale = 1.0 - jnp.mean(jax.nn.sigmoid(d[:, 4:]), axis=-1)
            scores = scores * rescale
            kidx, kvalid = self._nms(boxes, scores, keep, a.rpn_nms_thresh, post)
            return jnp.take(boxes, kidx, axis=0), jnp.take(scores, kidx), kvalid

        pb, ps, pv = jax.vmap(per_image)(obj, deltas, image_hw)
        return Proposals(pb, ps, pv)

    # --------------------------------------------------------- RPN sup losses
    def rpn_supervised_losses(self, anchors, obj, deltas, gt: GroundTruth, rng,
                              image_hw=None) -> Dict[str, jnp.ndarray]:
        """``GuassianRPN.losses`` (``rpn.py:191-255``): sampled BCE objectness +
        Gaussian/Laplace NLL box regression, both / (256 * N)."""
        a = self.arch
        n = obj.shape[0]
        anchors_sg = jax.lax.stop_gradient(anchors)
        if image_hw is None:
            image_hw = jnp.zeros((n, 2), jnp.float32)  # unused unless boundary filter on

        def label_one(key, gt_boxes, gt_valid, hw):
            iou = masked_iou(box_ops.pairwise_iou(gt_boxes, anchors_sg), gt_valid)
            midx, labels = match(iou, a.rpn_iou_thresholds, (0, -1, 1), True)
            if a.rpn_boundary_thresh >= 0:
                # legacy RPN boundary filter (detectron2 rpn label path;
                # MODEL.RPN.BOUNDARY_THRESH, default -1 = off): anchors not
                # fully inside image+margin are ignored (label -1)
                inside = box_ops.inside_box(anchors_sg, hw, a.rpn_boundary_thresh)
                labels = jnp.where(inside, labels, -1)
            pos, neg = subsample_labels(
                key, labels.astype(jnp.int32), a.rpn_batch_per_image, a.rpn_pos_fraction, 0
            )
            return pos, neg, jnp.take(gt_boxes, midx, axis=0)

        keys = jax.random.split(rng, n)
        pos, neg, matched = jax.vmap(label_one)(keys, gt.boxes, gt.valid, image_hw)
        matched = jax.lax.stop_gradient(matched)

        obj_loss = L.binary_cross_entropy_with_logits_sum(obj, pos.astype(jnp.float32), pos | neg)
        gt_deltas = get_deltas(jnp.broadcast_to(anchors_sg, matched.shape), matched, a.rpn_reg_weights)
        loc_loss = L.prob_box_nll_sum(deltas[..., :4], deltas[..., 4:], gt_deltas, pos, a.model_type)
        normalizer = a.rpn_batch_per_image * n
        w = a.rpn_loss_weight
        return {
            "loss_rpn_cls": w * obj_loss / normalizer,
            "loss_rpn_loc": w * loc_loss / normalizer,
            # per-image sampling stats (reference rpn.py:226-228 via EventStorage)
            "rpn/num_pos_anchors": jnp.sum(pos) / n,
            "rpn/num_neg_anchors": jnp.sum(neg) / n,
        }

    # --------------------------------------------------------- ROI sup losses
    def _sample_rois_sup(self, rng, proposals: Proposals, gt: GroundTruth):
        """label_and_sample_proposals (``roi_heads.py:192-255``): append gt, IoU
        match, sample ``roi_batch_per_image`` with pos fraction."""
        a = self.arch
        n = proposals.boxes.shape[0]
        if a.proposal_append_gt:
            all_boxes = jnp.concatenate([proposals.boxes, gt.boxes], axis=1)
            all_valid = jnp.concatenate([proposals.valid, gt.valid], axis=1)
        else:
            all_boxes, all_valid = proposals.boxes, proposals.valid
        s = a.roi_batch_per_image
        k = a.num_classes

        def sample_one(key, boxes_i, pvalid_i, gtb, gtc, gtv):
            iou = masked_iou(box_ops.pairwise_iou(gtb, boxes_i), gtv)
            midx, labels = match(iou, (a.roi_iou_threshold,), (0, 1), False)
            cls = jnp.where(labels == 1, jnp.take(gtc, midx), k)
            lab = jnp.where((labels == 1) & pvalid_i, 1,
                            jnp.where((labels == 0) & pvalid_i, 0, -1))
            pos, neg = subsample_labels(key, lab, s, a.roi_pos_fraction, 0)
            idx, valid = _first_k_indices(pos | neg, s)
            s_boxes = jnp.take(boxes_i, idx, axis=0)
            s_cls = jnp.where(valid, jnp.take(cls, idx), k)
            s_fg = jnp.take(pos, idx) & valid
            s_matched = jnp.take(gtb, jnp.take(midx, idx), axis=0)
            return s_boxes, s_cls.astype(jnp.int32), s_fg, s_matched, valid

        keys = jax.random.split(rng, n)
        s_boxes, s_cls, s_fg, s_matched, s_valid = jax.vmap(sample_one)(
            keys, all_boxes, all_valid, gt.boxes, gt.classes, gt.valid
        )
        return jax.lax.stop_gradient(s_boxes), s_cls, s_fg, s_matched, s_valid

    def _roi_sup_loss_tail(self, scores, pdeltas, s_boxes, s_cls, s_fg,
                           s_matched, s_valid) -> Dict[str, jnp.ndarray]:
        """FastRCNN supervised losses (``fast_rcnn.py:265-336``): CE mean over
        sampled rows + Gaussian NLL / R."""
        a = self.arch
        n, s = s_cls.shape
        k = a.num_classes
        loss_cls = L.softmax_cross_entropy_mean(scores, s_cls, s_valid)
        d = pdeltas.reshape(n, s, k, 8)
        cls_idx = jnp.clip(s_cls, 0, k - 1)
        sel = jnp.take_along_axis(d, cls_idx[..., None, None], axis=2)[:, :, 0]  # (N, S, 8)
        gt_deltas = get_deltas(s_boxes, s_matched, a.roi_reg_weights)
        total = jnp.maximum(jnp.sum(s_valid.astype(jnp.float32)), 1.0)
        loss_box = L.prob_box_nll_sum(sel[..., :4], sel[..., 4:], gt_deltas, s_fg, a.model_type) / total
        return {
            "loss_cls": loss_cls,
            "loss_box_reg": loss_box,
            # sampling stats (reference roi_heads.py:247-253 via EventStorage)
            "roi_head/num_fg_samples": jnp.sum(s_fg) / n,
            "roi_head/num_bg_samples": jnp.sum(s_valid & ~s_fg) / n,
        }

    def roi_supervised_losses(
        self, params, feat, proposals: Proposals, gt: GroundTruth, rng
    ) -> Dict[str, jnp.ndarray]:
        """label_and_sample_proposals + FastRCNN losses (``roi_heads.py:192-255``,
        ``fast_rcnn.py:265-336``)."""
        s_boxes, s_cls, s_fg, s_matched, s_valid = self._sample_rois_sup(rng, proposals, gt)
        scores, pdeltas = self.roi_predict(params, feat, s_boxes)
        return self._roi_sup_loss_tail(scores, pdeltas, s_boxes, s_cls, s_fg,
                                       s_matched, s_valid)

    # ------------------------------------------------------ supervised branch
    def supervised_losses(
        self, params, images: ImageBatch, gt: GroundTruth, rng
    ) -> Dict[str, jnp.ndarray]:
        """branch="supervised" (``rcnn.py:40-62``): RPN sup + ROI sup losses."""
        kr, ko = jax.random.split(rng)
        feat = self.features(params, images)
        obj, deltas = self.rpn_predict(params, feat)
        anchors = jax.lax.stop_gradient(self.anchors(params, feat.shape[1], feat.shape[2]))
        losses = self.rpn_supervised_losses(anchors, obj, deltas, gt, kr,
                                            images.image_hw)
        proposals = self.predict_proposals(anchors, obj, deltas, images.image_hw,
                                           training=True, grid_hw=feat.shape[1:3])
        # divergence canary: the reference RAISES on non-finite proposals
        # (proposal_utils.py:118-122); a static-shape graph masks them instead
        # (PARITY deviation), so surface the collapse as a metric — a healthy
        # run sits at ~post_nms_topk, a diverged one drops toward 0
        losses["rpn/num_valid_proposals"] = (
            jnp.sum(proposals.valid.astype(jnp.float32)) / proposals.valid.shape[0])
        losses.update(self.roi_supervised_losses(params, feat, proposals, gt, ko))
        return losses

    # ------------------------------------------------------ teacher weak pass
    def pseudo_labels(self, params, images: ImageBatch) -> PseudoLabels:
        """branch="unsup_data_weak" (``rcnn.py:64-78`` + ``trainer.py:179-246``):
        RPN proposals (train topk — the teacher stays in train mode) -> ROI inference
        with sigma-discounted scores -> "all" pseudo labels (no thresholding beyond
        the standard 0.05 score filter inside fast_rcnn inference).

        TEACHER_{PRE,POST}_NMS_TOPK (when >0) override the proposal budgets of
        this pass only: the teacher pools/classifies every post-NMS proposal but
        keeps just the top DETECTIONS_PER_IMAGE, so a lower post budget cuts its
        ROIAlign/box-head/class-NMS cost without touching the student."""
        a = self.arch
        budget = None
        if a.teacher_pre_nms_topk > 0 or a.teacher_post_nms_topk > 0:
            budget = (
                a.teacher_pre_nms_topk if a.teacher_pre_nms_topk > 0
                else a.rpn_pre_nms_topk[1],
                a.teacher_post_nms_topk if a.teacher_post_nms_topk > 0
                else a.rpn_post_nms_topk[1],
            )
        feat = self.features(params, images)
        obj, deltas = self.rpn_predict(params, feat)
        anchors = self.anchors(params, feat.shape[1], feat.shape[2])
        proposals = self.predict_proposals(anchors, obj, deltas, images.image_hw,
                                           training=True, grid_hw=feat.shape[1:3],
                                           budget=budget)
        det = self._roi_inference(params, feat, proposals, images.image_hw,
                                  nms_candidates=a.teacher_nms_candidates)
        out = PseudoLabels(boxes=det.boxes, logits=det.logits, sigma=det.sigma, valid=det.valid)
        return jax.tree.map(jax.lax.stop_gradient, out)

    def detect(self, params, images: ImageBatch) -> Detections:
        """Inference path (eval): test-time topk proposals + ROI inference."""
        feat = self.features(params, images)
        obj, deltas = self.rpn_predict(params, feat)
        anchors = self.anchors(params, feat.shape[1], feat.shape[2])
        proposals = self.predict_proposals(anchors, obj, deltas, images.image_hw,
                                           training=False, grid_hw=feat.shape[1:3])
        return self._roi_inference(params, feat, proposals, images.image_hw)

    def _roi_inference(self, params, feat, proposals: Proposals, image_hw,
                       nms_candidates: int = -1) -> Detections:
        """``fast_rcnn_inference_single_image`` (``fast_rcnn.py:34-120``):
        softmax minus bg -> per-class decode + clip -> score_thresh filter ->
        sigma discount ``score *= 1 - sum(sigmoid(sigma))/4`` -> class-aware NMS ->
        top ``detections_per_image``; keeps raw class logits + raw sigma.

        ``nms_candidates`` > 0 prefilters the P*K (proposal, class) candidates
        to the top-C by score before the class-aware NMS while-loop — a perf
        lever for the teacher weak pass (a candidate outside the top C could in
        principle survive suppression into the top ``detections_per_image``, so
        this is near-exact, not exact; keep C >= ~10x detections_per_image).
        Eval (``detect``) never sets it: inference stays exact."""
        a = self.arch
        k = a.num_classes
        n, p, _ = proposals.boxes.shape
        scores_logits, pdeltas = self.roi_predict(params, feat, proposals.boxes)
        max_det = a.detections_per_image
        use_prefilter = 0 < nms_candidates < p * k

        def per_image(logits_i, deltas_i, pboxes_i, pvalid_i, hw):
            probs = jax.nn.softmax(logits_i, axis=-1)[:, :-1]           # (P, K)
            d = deltas_i.reshape(p, k, 8)
            boxes = apply_deltas(
                d[..., :4].reshape(p, k * 4), pboxes_i, a.roi_reg_weights
            ).reshape(p, k, 4)
            boxes = box_ops.clip_boxes(boxes, hw)
            sigma = d[..., 4:]                                           # (P, K, 4)
            fmask = (probs > a.score_thresh) & pvalid_i[:, None]
            disc = 1.0 - jnp.sum(jax.nn.sigmoid(sigma), axis=-1) / 4.0
            scores = probs * disc
            flat_boxes = boxes.reshape(p * k, 4)
            flat_scores = scores.reshape(p * k)
            flat_valid = fmask.reshape(p * k)
            cls_ids = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None, :], (p, k)).reshape(-1)
            if use_prefilter:
                _, cidx = jax.lax.top_k(
                    jnp.where(flat_valid, flat_scores, -jnp.inf), nms_candidates)
                flat_boxes = jnp.take(flat_boxes, cidx, axis=0)
                flat_scores = jnp.take(flat_scores, cidx)
                flat_valid = jnp.take(flat_valid, cidx)
                cls_ids = jnp.take(cls_ids, cidx)
            # block 256 (not the 1024 RPN default): with the keep budget at
            # DETECTIONS_PER_IMAGE (100), smaller blocks hit the early exit
            # with ~16x less intra-block IoU work; block size never changes
            # results (invariance unit-tested) — measured 93.5 vs 93.4 img/s
            kidx, kvalid = self._batched_nms(
                flat_boxes, flat_scores, cls_ids, flat_valid, a.nms_thresh,
                max_det, block_size=256,
            )
            orig = jnp.take(cidx, kidx) if use_prefilter else kidx       # index into P*K
            row = orig // k
            out_boxes = jnp.take(flat_boxes, kidx, axis=0)
            out_scores = jnp.take(flat_scores, kidx)
            out_cls = jnp.take(cls_ids, kidx)
            out_logits = jnp.take(logits_i, row, axis=0)                 # (D, K+1)
            out_sigma = jnp.take(sigma.reshape(p * k, 4), orig, axis=0)  # (D, 4)
            return out_boxes, out_scores, out_cls, out_logits, out_sigma, kvalid

        b, sc, c, lg, sg, v = jax.vmap(per_image)(
            scores_logits, pdeltas, proposals.boxes, proposals.valid, image_hw
        )
        return Detections(b, sc, c, lg, sg, v)

    # --------------------------------------------------- unsupervised branch
    def _rpn_unsup_losses(self, anchors, anchors_sg, obj, deltas,
                          pseudo: PseudoLabels, image_hw=None) -> Dict[str, jnp.ndarray]:
        """Soft RPN losses vs teacher pseudo-labels (``rpn.py:115-135,257-361``).

        ``anchors`` carries gradient (anchor adaptation); matching uses the
        detached ``anchors_sg``."""
        a = self.arch
        k = a.num_classes
        n = obj.shape[0]
        if image_hw is None:
            image_hw = jnp.zeros((n, 2), jnp.float32)  # unused unless boundary filter on

        def rpn_label_one(pboxes, plogits, psigma, pvalid, hw):
            iou = masked_iou(box_ops.pairwise_iou(pboxes, anchors_sg), pvalid)
            midx, labels = match(iou, a.rpn_iou_thresholds, (0, -1, 1), True)
            if a.rpn_boundary_thresh >= 0:
                # the reference applies the legacy boundary-ignore BEFORE
                # anchor_mask = labels == 1 in BOTH branches (rpn.py:421-425
                # precedes the use_soft_label mask at rpn.py:427)
                inside = box_ops.inside_box(anchors_sg, hw, a.rpn_boundary_thresh)
                labels = jnp.where(inside, labels, -1)
            amask = labels == 1
            return (
                amask,
                jnp.take(plogits, midx, axis=0),
                jnp.take(psigma, midx, axis=0),
                jnp.take(pboxes, midx, axis=0),
            )

        amask, t_logits, t_sigma, t_boxes = jax.vmap(rpn_label_one)(
            pseudo.boxes, pseudo.logits, pseudo.sigma, pseudo.valid, image_hw
        )
        fg = jnp.argmax(t_logits, axis=-1) != k
        normalizer = a.rpn_batch_per_image * n
        loss_rpn_cls = L.rpn_soft_cls_loss(
            obj, t_logits, amask, a.tau[0], a.efl, a.efl_lambda[0]
        ) / normalizer
        # mean_p carries anchor gradients (anchors NOT detached here)
        mean_p = get_deltas(jnp.broadcast_to(anchors, t_boxes.shape), t_boxes, a.rpn_reg_weights)
        loss_rpn_loc = L.kl_consistency_box_loss(
            deltas[..., :4], deltas[..., 4:], mean_p, t_sigma,
            amask & fg, a.tau[1], a.efl, a.efl_lambda[1], a.model_type, "sum",
        ) / normalizer
        # NOTE: the reference multiplies by RPN loss_weight only in the
        # SUPERVISED branch (rpn.py:141 is inside the `elif self.training`
        # arm; the `branch == 'unsupervised'` arm at rpn.py:115-135 returns
        # unweighted) — so no rpn_loss_weight here
        return {
            "loss_rpn_cls": loss_rpn_cls,
            "loss_rpn_loc": loss_rpn_loc,
        }

    def _keep_rois_unsup(self, proposals: Proposals, pseudo: PseudoLabels):
        """Unsup proposal keep: only matcher-label-1 proposals survive, up to the
        static budget (``roi_heads.py:257-291``)."""
        a = self.arch
        b = a.unsup_roi_budget

        def roi_keep_one(pboxes, plogits, psigma, pvalid, prop_boxes, prop_valid):
            iou = masked_iou(box_ops.pairwise_iou(pboxes, prop_boxes), pvalid)
            midx, labels = match(iou, (a.roi_iou_threshold,), (0, 1), False)
            kept = (labels == 1) & prop_valid
            idx, kvalid = _first_k_indices(kept, b)
            kmidx = jnp.take(midx, idx)
            return (
                jnp.take(prop_boxes, idx, axis=0),
                jnp.take(pboxes, kmidx, axis=0),
                jnp.take(plogits, kmidx, axis=0),
                jnp.take(psigma, kmidx, axis=0),
                kvalid,
            )

        return jax.vmap(roi_keep_one)(
            pseudo.boxes, pseudo.logits, pseudo.sigma, pseudo.valid,
            proposals.boxes, proposals.valid,
        )

    def _roi_unsup_loss_tail(self, scores, pdeltas, k_boxes, k_pboxes, k_logits,
                             k_sigma, k_valid) -> Dict[str, jnp.ndarray]:
        """Unsup ROI losses (``roi_heads.py:131-172``, ``fast_rcnn.py:179-263``)."""
        a = self.arch
        k = a.num_classes
        n, b = k_valid.shape
        # cls: soft CE, normalized by the total kept count across the batch
        # (reference concatenates images then divides by rows, fast_rcnn.py:208-209)
        flat_valid = k_valid.reshape(-1)
        loss_cls = L.roi_soft_cls_loss(
            scores.reshape(-1, k + 1), k_logits.reshape(-1, k + 1), flat_valid,
            a.tau[0], a.efl, a.efl_lambda[0],
        )

        # box: KL on rows whose pseudo argmax is foreground, mean over elements
        pseudo_cls = jnp.argmax(k_logits, axis=-1)
        fg_rows = k_valid & (pseudo_cls != k)
        d = pdeltas.reshape(n, b, k, 8)
        cls_idx = jnp.clip(pseudo_cls, 0, k - 1)
        sel = jnp.take_along_axis(d, cls_idx[..., None, None], axis=2)[:, :, 0]  # (N, B, 8)
        mean_p_roi = get_deltas(k_boxes, k_pboxes, a.roi_reg_weights)
        loss_box = L.kl_consistency_box_loss(
            sel[..., :4], sel[..., 4:], mean_p_roi, k_sigma,
            fg_rows, a.tau[1], a.efl, a.efl_lambda[1], a.model_type, "mean",
        )
        return {
            "loss_cls": loss_cls,
            "loss_box_reg": loss_box,
            # observability: mean valid pseudo boxes per image (the reference's
            # num_proposal_output metric, ``trainer.py:242-245``) is emitted by
            # the train step from pseudo.valid, not here.
        }

    def unsupervised_losses(
        self, params, images: ImageBatch, pseudo: PseudoLabels, rng
    ) -> Dict[str, jnp.ndarray]:
        """branch="unsupervised" with danchor=True (``rcnn.py:47-62``,
        ``rpn.py:115-135,257-361``, ``roi_heads.py:131-172,257-291``).

        The learnable anchors receive gradient ONLY here, through mean_p =
        get_deltas(anchors, matched_pseudo_box) in the RPN KL term (anchor
        adaptation, ``rpn.py:91-94,311``)."""
        del rng  # no sampling in the unsupervised branch (soft labels, no subsample)
        feat = self.features(params, images)
        obj, deltas = self.rpn_predict(params, feat)
        anchors = self.anchors(params, feat.shape[1], feat.shape[2])  # grads flow (danchor)
        anchors_sg = jax.lax.stop_gradient(anchors)
        losses = self._rpn_unsup_losses(anchors, anchors_sg, obj, deltas, pseudo,
                                        images.image_hw)
        proposals = self.predict_proposals(anchors_sg, obj, deltas, images.image_hw,
                                           training=True, grid_hw=feat.shape[1:3])
        k_boxes, k_pboxes, k_logits, k_sigma, k_valid = self._keep_rois_unsup(proposals, pseudo)
        scores, pdeltas = self.roi_predict(params, feat, k_boxes)
        losses.update(self._roi_unsup_loss_tail(scores, pdeltas, k_boxes, k_pboxes,
                                                k_logits, k_sigma, k_valid))
        return losses

    # ------------------------------------------------ fused student forward
    def student_losses(
        self, params, images_l: ImageBatch, gt_l: GroundTruth,
        images_u: ImageBatch, pseudo: PseudoLabels, rng
    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        """Supervised + unsupervised student losses in ONE backbone/RPN/ROI pass.

        TPU-native fusion of the reference's two separate student forwards
        (``trainer.py:350-380``): the labeled and unlabeled views share the same
        canvas and weights, so the conv stack, RPN head, proposal NMS, ROIAlign
        and box head all run once on the concatenated batch — fewer kernel
        launches and better MXU utilization than two half-size passes.
        Numerics are identical to supervised_losses + unsupervised_losses.
        """
        a = self.arch
        nl = images_l.image.shape[0]
        nu = images_u.image.shape[0]
        if (nl + nu) % 8 != 0:
            # a non-8-aligned combined batch pads to the next sublane tile in
            # every spatial conv (measured +24 ms at 8+4=12 on v5e) — run the
            # two aligned passes separately instead
            kr2, ko2 = jax.random.split(rng)
            return (self.supervised_losses(params, images_l, gt_l, kr2),
                    self.unsupervised_losses(params, images_u, pseudo, ko2))
        kr, ko = jax.random.split(rng)
        images = ImageBatch(
            image=jnp.concatenate([images_l.image, images_u.image], axis=0),
            image_hw=jnp.concatenate([images_l.image_hw, images_u.image_hw], axis=0),
        )
        feat = self.features(params, images)
        obj, deltas = self.rpn_predict(params, feat)
        anchors = self.anchors(params, feat.shape[1], feat.shape[2])
        anchors_sg = jax.lax.stop_gradient(anchors)

        sup = self.rpn_supervised_losses(anchors_sg, obj[:nl], deltas[:nl], gt_l, kr,
                                         images.image_hw[:nl])
        unsup = self._rpn_unsup_losses(anchors, anchors_sg, obj[nl:], deltas[nl:],
                                       pseudo, images.image_hw[nl:])

        # one NMS pass over all images (both branches use train-time topk)
        proposals = self.predict_proposals(anchors_sg, obj, deltas, images.image_hw,
                                           training=True, grid_hw=feat.shape[1:3])
        prop_l = Proposals(proposals.boxes[:nl], proposals.logits[:nl], proposals.valid[:nl])
        prop_u = Proposals(proposals.boxes[nl:], proposals.logits[nl:], proposals.valid[nl:])
        # divergence canary (see supervised_losses): non-finite proposals are
        # masked, not raised — make the collapse observable per branch
        sup["rpn/num_valid_proposals"] = (
            jnp.sum(prop_l.valid.astype(jnp.float32)) / nl)
        unsup["rpn/num_valid_proposals"] = (
            jnp.sum(prop_u.valid.astype(jnp.float32)) / nu)

        s_boxes, s_cls, s_fg, s_matched, s_valid = self._sample_rois_sup(ko, prop_l, gt_l)
        k_boxes, k_pboxes, k_logits, k_sigma, k_valid = self._keep_rois_unsup(prop_u, pseudo)

        if s_boxes.shape[1] == k_boxes.shape[1]:
            # equal per-image ROI budgets: one fused ROIAlign + box-head pass
            scores, pdeltas = self.roi_predict(
                params, feat, jnp.concatenate([s_boxes, k_boxes], axis=0))
            sc_l, sc_u = scores[:nl], scores[nl:]
            pd_l, pd_u = pdeltas[:nl], pdeltas[nl:]
        else:
            sc_l, pd_l = self.roi_predict(params, feat[:nl], s_boxes)
            sc_u, pd_u = self.roi_predict(params, feat[nl:], k_boxes)
        sup.update(self._roi_sup_loss_tail(sc_l, pd_l, s_boxes, s_cls, s_fg,
                                           s_matched, s_valid))
        unsup.update(self._roi_unsup_loss_tail(sc_u, pd_u, k_boxes, k_pboxes,
                                               k_logits, k_sigma, k_valid))
        return sup, unsup


def _first_k_indices(mask: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of the first k True entries of mask (in order), plus a validity mask."""
    num = mask.shape[0]
    key = jnp.where(mask, -jnp.arange(num, dtype=jnp.float32), -jnp.inf)
    _, idx = jax.lax.top_k(key, min(k, num))
    valid = jnp.take(mask, idx)
    if k > num:  # pad (degenerate; budgets are always <= row count in practice)
        idx = jnp.pad(idx, (0, k - num))
        valid = jnp.pad(valid, (0, k - num))
    return idx.astype(jnp.int32), valid
