"""Single-image inference API (detectron2 ``DefaultPredictor`` equivalent).

Takes a raw BGR uint8 numpy image, applies the test-time resize, runs the jitted
detect path on the static canvas, and returns detections in original-image
coordinates. Usage:

    from probabilisticteacher_tpu.predictor import Predictor
    pred = Predictor(cfg, checkpoint_path="output/c2f/model_0030000")
    out = pred(image_bgr)   # {"boxes", "scores", "classes"}
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from .checkpoint import load_vgg_caffe, load_weights
from .data.loader import Mapper
from .modeling.detector import Arch, PTDetector
from .structures import ImageBatch


class Predictor:
    def __init__(self, cfg, checkpoint_path: Optional[str] = None,
                 params=None, use_teacher: bool = True):
        self.cfg = cfg
        self.arch = Arch.from_cfg(cfg)
        self.detector = PTDetector(self.arch)
        self.mapper = Mapper(cfg, is_train=False)
        if params is None:
            params = self.detector.init(jax.random.key(0), tuple(cfg.INPUT.CANVAS.WIDE))
            if checkpoint_path:
                from .engine.steps import TrainState
                import jax.numpy as jnp

                state = TrainState(jnp.asarray(0), params,
                                   jax.tree.map(np.copy, params), ())
                state = load_weights(checkpoint_path, state)
                # headline metric tracks the teacher (trainer.py:529-542)
                params = state.teacher if use_teacher else state.student
        self.params = params
        self._detect = jax.jit(self.detector.detect)

    def __call__(self, image_bgr: np.ndarray) -> Dict[str, np.ndarray]:
        """image_bgr: (H, W, 3) uint8 -> detections in original coordinates."""
        h, w = image_bgr.shape[:2]
        record = {
            "file_name": None, "image_id": 0, "height": h, "width": w,
            "annotations": [],
        }
        # inline mapper logic without file IO
        from .data.loader import resize_shortest_edge

        img, _, scale = resize_shortest_edge(
            image_bgr, np.zeros((0, 4), np.float32),
            self.cfg.INPUT.MIN_SIZE_TEST, self.cfg.INPUT.MAX_SIZE_TEST,
        )
        hh, ww = img.shape[:2]
        ch, cw = (self.cfg.INPUT.CANVAS.WIDE if ww > hh else self.cfg.INPUT.CANVAS.TALL)
        canvas = np.zeros((ch, cw, 3), np.float32)
        canvas[:min(hh, ch), :min(ww, cw)] = img[:ch, :cw]
        batch = ImageBatch(canvas[None], np.asarray([[hh, ww]], np.float32))
        dets = self._detect(self.params, batch)
        v = np.asarray(dets.valid[0])
        return {
            "boxes": np.asarray(dets.boxes[0])[v] / scale,
            "scores": np.asarray(dets.scores[0])[v],
            "classes": np.asarray(dets.classes[0])[v],
        }
