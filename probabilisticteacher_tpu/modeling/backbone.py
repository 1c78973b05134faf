"""VGG backbone (flax/linen, NHWC, TPU-friendly).

Behavioral mirror of the reference's VGG (``pt/modeling/backbone/vgg.py:36-230``):
- 5 stages ("vgg_block1".."vgg_block5"), 3x3 convs with bias, ReLU, no norm by default;
- 2x2 max-pool after blocks 1-4 only, so the block5 feature keeps stride 16
  (``vgg.py:94-95,211-214``);
- conv init: MSRA/He fan-out (detectron2 ``c2_msra_fill``).

The Caffe-pretrained weight import lives in ``caffe_import.py``; freezing
(``MODEL.BACKBONE.FREEZE_AT``) is done in the optimizer via a parameter mask, not in
the module (idiomatic JAX: modules stay pure).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

# channel plan per VGG depth (torchvision layout, exercised via MODEL.VGG.DEPTH)
VGG_STAGES: Dict[int, Sequence[Sequence[int]]] = {
    11: ((64,), (128,), (256, 256), (512, 512), (512, 512)),
    13: ((64, 64), (128, 128), (256, 256), (512, 512), (512, 512)),
    16: ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512)),
    19: ((64, 64), (128, 128), (256, 256, 256, 256), (512, 512, 512, 512), (512, 512, 512, 512)),
}

_msra = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def _max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """Non-overlapping 2x2/2 max pool via reshape+max.

    Equivalent to nn.max_pool(x, (2,2), (2,2)) for even H, W, but its backward is
    a fused elementwise select instead of XLA SelectAndScatter (very slow on TPU).
    NOTE: a strided-slice variant (x[:, 0::2, 0::2] etc.) crashes the TPU runtime
    at production shapes on this toolchain — do not switch back without re-testing.
    Odd trailing rows/cols are dropped, matching torch MaxPool2d floor semantics.
    """
    n, h, w, c = x.shape
    x = x[:, : h - h % 2, : w - w % 2]
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return jnp.max(jnp.max(x, axis=4), axis=2)


class VGG(nn.Module):
    """Returns a dict of requested stage outputs, e.g. {"vgg_block5": (N, H/16, W/16, 512)}."""

    depth: int = 16
    out_features: Sequence[str] = ("vgg_block5",)
    dtype: Any = jnp.float32
    freeze_at: int = 0  # blocks 1..freeze_at frozen (vgg.py:175-180)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        import jax

        x = x.astype(self.dtype)
        outputs: Dict[str, jnp.ndarray] = {}
        for bi, channels in enumerate(VGG_STAGES[self.depth], start=1):
            for ci, ch in enumerate(channels, start=1):
                x = nn.Conv(
                    ch,
                    (3, 3),
                    padding=1,
                    use_bias=True,
                    kernel_init=_msra,
                    dtype=self.dtype,
                    name=f"block{bi}_conv{ci}",
                )(x)
                x = nn.relu(x)
            if bi < 5:  # no pool in block5 -> stride stays 16
                x = _max_pool_2x2(x)
            if bi == self.freeze_at:
                # frozen stem: truncate backward entirely (requires_grad=False
                # semantics); the optimizer additionally zero-masks these params.
                # Saves the full-resolution conv backward of blocks 1..freeze_at.
                x = jax.lax.stop_gradient(x)
            name = f"vgg_block{bi}"
            if name in self.out_features:
                outputs[name] = x
        return outputs

    @staticmethod
    def out_channels(depth: int, feature: str) -> int:
        block = int(feature.replace("vgg_block", ""))
        return VGG_STAGES[depth][block - 1][-1]

    @staticmethod
    def stride(feature: str) -> int:
        block = int(feature.replace("vgg_block", ""))
        return 2 ** min(block - 1, 4)
