from . import (anchors, box_regression, boxes, grad, losses, matcher, nms,  # noqa: F401
               roi_align, roi_align_pallas, sampling)
