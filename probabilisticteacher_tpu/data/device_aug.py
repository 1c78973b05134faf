"""On-device augmentation (fused into the train step — TPU-first redesign).

The reference runs its strong photometric stack on the host with PIL/torchvision
(``pt/data/detection_utils.py:49-57``: ColorJitter(.4,.4,.4,.1) p=.8, Grayscale p=.2,
GaussianBlur sigma U[0.1,2] p=.5, Solarize(128) p=.2) and its random-resize jitter with
``F.interpolate`` on the host (``pt/engine/trainer.py:557-590``). On a TPU the host is
the bottleneck, so both run on device here, vectorized over the batch, as part of the
compiled step (DESIGN.md).

Channel-order note: the reference feeds its BGR array to torchvision labeled as RGB
(``dataset_mapper.py:159``), so the luma/hue math is applied to the raw channel order
as-is. We reproduce exactly that: all formulas below treat channel 0 as "R" no matter
the actual order.

All functions take/return float images in the 0..255 range, NHWC.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# torchvision rgb_to_grayscale weights. Plain tuple, NOT a jnp array: a
# module-level device constant initializes the default backend at import,
# which races ahead of PTrainer's MODEL.DEVICE=cpu platform override (the
# CLI then binds to the tunneled TPU and hangs on the first host fetch).
_LUMA = (0.299, 0.587, 0.114)


def _blend(img1: jnp.ndarray, img2: jnp.ndarray, ratio: jnp.ndarray) -> jnp.ndarray:
    """torchvision _blend: ratio*img1 + (1-ratio)*img2, clamped to [0, 255]."""
    return jnp.clip(ratio.astype(img1.dtype) * img1
                    + (1.0 - ratio).astype(img1.dtype) * img2, 0.0, 255.0)


def _grayscale(img: jnp.ndarray) -> jnp.ndarray:
    l = jnp.tensordot(img, jnp.asarray(_LUMA, img.dtype), axes=[[-1], [0]])
    return jnp.broadcast_to(l[..., None], img.shape)


def adjust_brightness(img, factor):
    return _blend(img, jnp.zeros_like(img), factor)


def adjust_contrast(img, factor):
    # torchvision: blend with the mean of the grayscale image (mean in f32:
    # a bf16 accumulation over ~740k pixels would lose the low bits entirely)
    mean = jnp.mean(_grayscale(img)[..., 0].astype(jnp.float32)).astype(img.dtype)
    return _blend(img, jnp.full_like(img, mean), factor)


def adjust_saturation(img, factor):
    return _blend(img, _grayscale(img), factor)


def _rgb_to_hsv(img):
    """img (..., 3) in [0,1] -> h,s,v each (...)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    deltac = maxc - minc
    s = jnp.where(maxc > 0, deltac / jnp.where(maxc > 0, maxc, 1.0), 0.0)
    dc = jnp.where(deltac > 0, deltac, 1.0)
    rc = (maxc - r) / dc
    gc = (maxc - g) / dc
    bc = (maxc - b) / dc
    h = jnp.where(maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(deltac > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    i = i.astype(jnp.int32) % 6
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(img, delta):
    # HSV roundtrip in f32 regardless of the pixel dtype (the hue channel is a
    # ratio of small differences — bf16 would visibly quantize it), cast back.
    x = img.astype(jnp.float32) / 255.0
    h, s, v = _rgb_to_hsv(x)
    h = (h + delta) % 1.0
    return jnp.clip(_hsv_to_rgb(h, s, v) * 255.0, 0.0, 255.0).astype(img.dtype)


def color_jitter(key: jax.Array, img: jnp.ndarray,
                 brightness: float = 0.4, contrast: float = 0.4,
                 saturation: float = 0.4, hue: float = 0.1) -> jnp.ndarray:
    """torchvision ColorJitter: the four ops in random order with random factors."""
    kb, kc, ks, kh, kp = jax.random.split(key, 5)
    fb = jax.random.uniform(kb, (), minval=1 - brightness, maxval=1 + brightness)
    fc = jax.random.uniform(kc, (), minval=1 - contrast, maxval=1 + contrast)
    fs = jax.random.uniform(ks, (), minval=1 - saturation, maxval=1 + saturation)
    fh = jax.random.uniform(kh, (), minval=-hue, maxval=hue)
    perm = jax.random.permutation(kp, 4)

    branches = [
        lambda im: adjust_brightness(im, fb),
        lambda im: adjust_contrast(im, fc),
        lambda im: adjust_saturation(im, fs),
        lambda im: adjust_hue(im, fh),
    ]

    def body(t, im):
        return jax.lax.switch(perm[t], branches, im)

    return jax.lax.fori_loop(0, 4, body, img)


def gaussian_blur(key: jax.Array, img: jnp.ndarray,
                  sigma_range: Tuple[float, float] = (0.1, 2.0), taps: int = 13) -> jnp.ndarray:
    """Separable Gaussian blur with per-image random sigma (PIL GaussianBlur analog).

    13 taps cover radius 6 = 3*sigma_max; the kernel is built on device from the
    sampled sigma so the op stays static-shape.
    """
    sigma = jax.random.uniform(key, (), minval=sigma_range[0], maxval=sigma_range[1])
    r = taps // 2
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    k = k / jnp.sum(k)

    h, w, c = img.shape
    # horizontal then vertical, depthwise; NHWC conv with feature groups
    img4 = img[None]
    k = k.astype(img.dtype)
    kh = k.reshape(1, taps, 1, 1) * jnp.ones((1, 1, 1, c), img.dtype)  # (1, taps, 1, C)
    kv = k.reshape(taps, 1, 1, 1) * jnp.ones((1, 1, 1, c), img.dtype)  # (taps, 1, 1, C)
    dn = jax.lax.conv_dimension_numbers(img4.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(img4, kh, (1, 1), [(0, 0), (r, r)],
                                       dimension_numbers=dn, feature_group_count=c)
    out = jax.lax.conv_general_dilated(out, kv, (1, 1), [(r, r), (0, 0)],
                                       dimension_numbers=dn, feature_group_count=c)
    return out[0]


def solarize(img: jnp.ndarray, threshold: float = 128.0) -> jnp.ndarray:
    """PIL ImageOps.solarize: invert pixels >= threshold (reference threshold 128,
    ``augmentation_impl.py:40-45``)."""
    return jnp.where(img >= threshold, 255.0 - img, img)


def strong_augment_one(key: jax.Array, img: jnp.ndarray) -> jnp.ndarray:
    """The full strong stack for one image (``detection_utils.py:49-57``)."""
    k1, k2, k3, k4, p1, p2, p3, p4 = jax.random.split(key, 8)

    img = jax.lax.cond(
        jax.random.uniform(p1) < 0.8, lambda im: color_jitter(k1, im), lambda im: im, img
    )
    img = jax.lax.cond(
        jax.random.uniform(p2) < 0.2, lambda im: _grayscale(im), lambda im: im, img
    )
    img = jax.lax.cond(
        jax.random.uniform(p3) < 0.5, lambda im: gaussian_blur(k3, im), lambda im: im, img
    )
    img = jax.lax.cond(
        jax.random.uniform(p4) < 0.2, lambda im: solarize(im), lambda im: im, img
    )
    return img


def strong_augment(key: jax.Array, images: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Batched strong augmentation: images (N, H, W, 3) 0..255 float.

    ``dtype`` is the pixel compute dtype: bf16 under AMP halves the bandwidth of
    the whole photometric chain; its ~8-bit mantissa matches the uint8 precision
    the reference's PIL pipeline works in anyway.
    """
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(strong_augment_one)(keys, images.astype(dtype))


# --------------------------------------------------------------------------- #
# Random scale jitter (the trainer's ``resize()``, ``trainer.py:557-590``)
# --------------------------------------------------------------------------- #
def _scale_jitter_one(key, img, hw, pixel_mean, lo, hi):
    """Shrink the image by ratio U[lo,hi] into the canvas center, fill pixel_mean.

    Static-shape inverse warp: output pixel (y, x) samples input at
    ((y - y1) / ratio, (x - x1) / ratio) with bilinear weights; outside -> mean.
    The valid region is centered on the VALID (h, w), matching the reference which
    operates on the unpadded image.
    """
    h, w, _ = img.shape
    ratio = jax.random.uniform(key, (), minval=lo, maxval=hi)
    # reference: d_h = int(h*ratio); x1 = int((w - d_w)/2)
    d_h = jnp.floor(hw[0] * ratio)
    d_w = jnp.floor(hw[1] * ratio)
    y1 = jnp.floor((hw[0] - d_h) / 2.0)
    x1 = jnp.floor((hw[1] - d_w) / 2.0)

    # align_corners=False bilinear: src = (dst + 0.5) / scale - 0.5, where scale = d/hw
    ys = (jnp.arange(h, dtype=jnp.float32) - y1 + 0.5) * (hw[0] / jnp.maximum(d_h, 1.0)) - 0.5
    xs = (jnp.arange(w, dtype=jnp.float32) - x1 + 0.5) * (hw[1] / jnp.maximum(d_w, 1.0)) - 0.5

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)

    g00 = img[y0i][:, x0i]
    g01 = img[y0i][:, x1i]
    g10 = img[y1i][:, x0i]
    g11 = img[y1i][:, x1i]
    # blend weights in the image dtype (coordinates above stay f32: bf16 cannot
    # address a 1216-px axis); bf16 weights only quantize the interpolation
    wy_ = wy.astype(img.dtype)[:, None, None]
    wx_ = wx.astype(img.dtype)[None, :, None]
    out = (g00 * (1 - wy_) * (1 - wx_) + g01 * (1 - wy_) * wx_
           + g10 * wy_ * (1 - wx_) + g11 * wy_ * wx_)

    in_y = (jnp.arange(h, dtype=jnp.float32) >= y1) & (jnp.arange(h, dtype=jnp.float32) < y1 + d_h)
    in_x = (jnp.arange(w, dtype=jnp.float32) >= x1) & (jnp.arange(w, dtype=jnp.float32) < x1 + d_w)
    inside = in_y[:, None] & in_x[None, :]
    out = jnp.where(inside[..., None], out, pixel_mean.astype(img.dtype))
    return out, ratio, jnp.stack([x1, y1])


def scale_jitter(key: jax.Array, images: jnp.ndarray, image_hw: jnp.ndarray,
                 boxes: jnp.ndarray, pixel_mean: Tuple[float, ...],
                 lo: float = 0.5, hi: float = 1.0, dtype=jnp.float32):
    """Batched scale jitter; transforms boxes like the reference
    (``box *= ratio; box[0::2] += x1; box[1::2] += y1``).

    Returns (images, boxes). ``boxes`` may be any (N, ..., 4) array.
    """
    n = images.shape[0]
    keys = jax.random.split(key, n)
    mean = jnp.asarray(pixel_mean, jnp.float32)
    out, ratio, off = jax.vmap(partial(_scale_jitter_one, lo=lo, hi=hi))(
        keys, images.astype(dtype), image_hw, pixel_mean=jnp.broadcast_to(mean, (n, 3))
    )
    shape = (n,) + (1,) * (boxes.ndim - 2)
    r = ratio.reshape(shape + (1,))
    offs = jnp.concatenate([off, off], axis=-1).reshape(shape + (4,))  # (x1, y1, x1, y1)
    new_boxes = boxes * r + offs
    return out, new_boxes
