"""RPN head, box head, and the Gaussian Fast R-CNN predictor (flax/linen).

Mirrors:
- ``GuassianRPNHead`` (StandardRPNHead with box_dim doubled to 8,
  ``pt/modeling/proposal_generator/rpn.py:44-55``): shared 3x3 conv + 1x1 objectness
  (A) + 1x1 anchor deltas (A*8); init normal(0.01), bias 0.
- ``FastRCNNConvFCHead`` with 2 FC x 1024 (``configs/Guassian-RCNN-VGG.yaml:26-28``).
- ``GuassianFastRCNNOutputLayers`` linear heads (``fast_rcnn.py:157-169``):
  cls (K+1) init normal(0.01); bbox (K*8) init normal(0.001); biases 0.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_normal01 = nn.initializers.normal(stddev=0.01)
_normal001 = nn.initializers.normal(stddev=0.001)
_xavier = nn.initializers.xavier_uniform()


class RPNHead(nn.Module):
    """Outputs per-location objectness (A) and anchor deltas (A*box_dim)."""

    num_anchors: int
    box_dim: int = 8  # 4 mean + 4 sigma (Gaussian/Laplace model)
    conv_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """feat (N, H, W, C) -> (objectness (N, H*W*A), deltas (N, H*W*A, box_dim)).

        Flattening order (H, W, A) matches ops.anchors.grid_anchors row ordering and
        the reference's permute+flatten (``rpn.py:97-113``).
        """
        n, h, w, _ = feat.shape
        x = nn.Conv(self.conv_dim, (3, 3), padding=1, kernel_init=_normal01,
                    dtype=self.dtype, name="conv")(feat.astype(self.dtype))
        x = nn.relu(x)
        obj = nn.Conv(self.num_anchors, (1, 1), kernel_init=_normal01,
                      dtype=self.dtype, name="objectness")(x)
        deltas = nn.Conv(self.num_anchors * self.box_dim, (1, 1), kernel_init=_normal01,
                         dtype=self.dtype, name="deltas")(x)
        obj = obj.reshape(n, h * w * self.num_anchors).astype(jnp.float32)
        deltas = deltas.reshape(n, h * w * self.num_anchors, self.box_dim).astype(jnp.float32)
        return obj, deltas


class _StructuredDense(nn.Module):
    """Dense over a structured (P, P, C) input WITHOUT flattening the activations.

    The (..., 7, 7, 512) -> (..., 25088) activation reshape is a sublane/lane
    relayout on TPU (~7 ms/step measured); reshaping the WEIGHT (25088, F) ->
    (7, 7, 512, F) only splits a major dim (free). Parameters keep the flat
    (P*P*C, F) "kernel"/"bias" layout so checkpoints/importers are unchanged.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p1, p2, c = x.shape[-3:]
        kernel = self.param("kernel", _xavier, (p1 * p2 * c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        nbatch = x.ndim - 3
        out = jax.lax.dot_general(
            x.astype(self.dtype),
            kernel.reshape(p1, p2, c, self.features).astype(self.dtype),
            dimension_numbers=(
                ((nbatch, nbatch + 1, nbatch + 2), (0, 1, 2)), ((), ())),
        )
        return out + bias.astype(self.dtype)


class BoxHead(nn.Module):
    """2x FC-1024 head over pooled ROI features (FastRCNNConvFCHead, FC-only)."""

    fc_dim: int = 1024
    num_fc: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x (..., P, P, C) -> (..., fc_dim)."""
        x = nn.relu(_StructuredDense(self.fc_dim, dtype=self.dtype, name="fc1")(x))
        for i in range(1, self.num_fc):
            x = nn.Dense(self.fc_dim, kernel_init=_xavier, dtype=self.dtype,
                         name=f"fc{i + 1}")(x)
            x = nn.relu(x)
        return x


class FastRCNNPredictor(nn.Module):
    """Gaussian Fast R-CNN output layers: scores (K+1) and box deltas (K * box_dim)."""

    num_classes: int
    box_dim: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        scores = nn.Dense(self.num_classes + 1, kernel_init=_normal01, name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * self.box_dim, kernel_init=_normal001, name="bbox_pred")(x)
        return scores.astype(jnp.float32), deltas.astype(jnp.float32)
