"""Numpy reference oracles for geometry ops (torchvision semantics, reimplemented).

These restate the *published algorithms* (greedy NMS, aligned ROIAlign bilinear
sampling, IoU) in plain numpy for golden testing; they are intentionally slow and
simple.
"""

import numpy as np


def iou_matrix(a, b):
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(inter > 0, inter / np.where(union > 0, union, 1), 0.0)
    return out


def greedy_nms(boxes, scores, thresh):
    """Classic greedy NMS; suppress iou > thresh (strict). Returns kept indices by score."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        ious = iou_matrix(boxes[i : i + 1], boxes)[0]
        suppressed |= ious > thresh
        suppressed[i] = True  # processed
    return np.asarray(keep, np.int64)


def batched_greedy_nms(boxes, scores, idxs, thresh):
    max_coord = boxes.max() + 1
    shifted = boxes + (idxs.astype(boxes.dtype) * max_coord)[:, None]
    return greedy_nms(shifted, scores, thresh)


def roi_align_aligned(feat_hwc, rois, spatial_scale, pooled, sampling_ratio):
    """Aligned ROIAlign (torchvision aligned=True), fixed sampling_ratio, numpy loops."""
    h, w, c = feat_hwc.shape
    r = len(rois)
    s = sampling_ratio
    out = np.zeros((r, pooled, pooled, c), np.float32)

    def bilinear(y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c, np.float32)
        y = min(max(y, 0.0), h - 1)
        x = min(max(x, 0.0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        ly, lx = y - y0, x - x0
        return (
            feat_hwc[y0, x0] * (1 - ly) * (1 - lx)
            + feat_hwc[y0, x1] * (1 - ly) * lx
            + feat_hwc[y1, x0] * ly * (1 - lx)
            + feat_hwc[y1, x1] * ly * lx
        )

    for ri in range(r):
        x1, y1, x2, y2 = rois[ri] * spatial_scale - 0.5
        bin_h = (y2 - y1) / pooled
        bin_w = (x2 - x1) / pooled
        for py in range(pooled):
            for px in range(pooled):
                acc = np.zeros(c, np.float32)
                for iy in range(s):
                    for ix in range(s):
                        yy = y1 + (py + (iy + 0.5) / s) * bin_h
                        xx = x1 + (px + (ix + 0.5) / s) * bin_w
                        acc += bilinear(yy, xx)
                out[ri, py, px] = acc / (s * s)
    return out
