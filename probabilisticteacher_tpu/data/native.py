"""ctypes bindings for the native C++ loader (csrc/ptloader.cpp).

Auto-builds libptloader.so on first use (g++, links libjpeg/libpng) and falls
back to the PIL path in loader.py when the toolchain or libraries are missing.
ctypes releases the GIL during the call, so a Python thread pool achieves real
decode parallelism — the reference gets the same effect from worker processes
(``DATALOADER.NUM_WORKERS``).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger("probabilisticteacher_tpu")

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.abspath(os.path.join(_CSRC, "libptloader.so"))
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["sh", os.path.join(_CSRC, "build.sh")],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ptl_load_image.restype = ctypes.c_int
        lib.ptl_load_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        logger.info("native loader: using %s", _LIB_PATH)
    except Exception as e:  # toolchain/libs missing -> PIL fallback
        logger.warning("native loader unavailable (%s); falling back to PIL", e)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def load_image(path: str, short_edge: int, max_size: int, flip: bool,
               canvas_hw: Tuple[int, int]) -> Optional[Tuple[np.ndarray, np.ndarray, float]]:
    """Decode+resize+flip+pad in native code.

    Returns (canvas uint8 (ch, cw, 3) BGR, valid_hw (2,) float32, scale), or None
    if the native library is unavailable / decode failed (caller falls back).
    """
    lib = _load()
    if lib is None:
        return None
    ch, cw = canvas_hw
    canvas = np.zeros((ch, cw, 3), np.uint8)
    out_hw = (ctypes.c_int * 2)()
    out_scale = ctypes.c_float()
    rc = lib.ptl_load_image(
        path.encode(), short_edge, max_size, int(flip), ch, cw,
        canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_hw,
        ctypes.byref(out_scale),
    )
    if rc != 0:
        return None
    hw = np.asarray([out_hw[0], out_hw[1]], np.float32)
    return canvas, hw, float(out_scale.value)
