from . import anchors, box_regression, boxes, losses, matcher, nms, roi_align, sampling  # noqa: F401
