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
import jax
import jax.numpy as jnp

# channel plan per VGG depth (torchvision layout, exercised via MODEL.VGG.DEPTH)
VGG_STAGES: Dict[int, Sequence[Sequence[int]]] = {
    11: ((64,), (128,), (256, 256), (512, 512), (512, 512)),
    13: ((64, 64), (128, 128), (256, 256), (512, 512), (512, 512)),
    16: ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512)),
    19: ((64, 64), (128, 128), (256, 256, 256, 256), (512, 512, 512, 512), (512, 512, 512, 512)),
}

_msra = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def _max_pool_2x2_impl(x: jnp.ndarray) -> jnp.ndarray:
    """Non-overlapping 2x2/2 max pool: reduce_window forward + custom backward.

    XLA's native max-pool backward (SelectAndScatter) is very slow on TPU, and a
    reshape+max formulation pays large relayout copies on both passes (a
    strided-slice variant even crashes the TPU runtime at production shapes).
    Here the forward is a plain reduce_window and the backward routes the
    cotangent to window maxima by comparison, divided by the tie count so each
    window routes exactly its cotangent mass (torch picks ONE tied maximum;
    under bf16, flat activation regions tie at positive values, so without the
    division tied windows would receive 2-4x the reference's gradient mass).
    Odd trailing rows/cols are dropped (torch floor semantics).
    """
    n, h, w, c = x.shape
    x = x[:, : h - h % 2, : w - w % 2]
    return jax.lax.reduce_window(
        x, -jnp.inf if x.dtype == jnp.float32 else jnp.asarray(-jnp.inf, x.dtype),
        jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    )


_max_pool_2x2 = jax.custom_vjp(_max_pool_2x2_impl)


def _pool_fwd(x):
    out = _max_pool_2x2_impl(x)
    return out, (x, out)


def _pool_bwd(res, g):
    x, out = res
    n, h, w, c = x.shape
    he, we = h - h % 2, w - w % 2
    xe = x[:, :he, :we]
    up = lambda t: jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)
    mask = (xe == up(out)).astype(g.dtype)
    # tie count per window (>= 1: the max is always attained); divide at the
    # pooled resolution — one cheap sum reduce_window, no extra full-res pass
    cnt = jax.lax.reduce_window(
        mask, jnp.asarray(0, mask.dtype), jax.lax.add,
        (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    )
    gx = up(g / cnt) * mask
    if he != h or we != w:
        gx = jnp.pad(gx, ((0, 0), (0, h - he), (0, w - we), (0, 0)))
    return (gx,)


_max_pool_2x2.defvjp(_pool_fwd, _pool_bwd)


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
