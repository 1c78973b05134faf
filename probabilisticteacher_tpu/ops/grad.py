"""Gradient-flow utilities (reference ``pt/modeling/utils.py:31-60``).

- :func:`grad_zero`: identity forward, zero backward — the reference gates anchor
  gradients with this outside the danchor branch (``rpn.py:91-94``). In JAX this
  is exactly ``jax.lax.stop_gradient``; provided under the reference's name for
  API parity.
- :func:`grad_reverse`: gradient reversal layer (GRL, alpha=0.1 in the reference).
  The reference's adversarial heads are dead code (losses zeroed,
  ``trainer.py:285-286``), but the utility is part of the public surface.
"""

from __future__ import annotations

from functools import partial

import jax


def grad_zero(x):
    """Identity forward, zero gradient backward (ZeroLayer)."""
    return jax.lax.stop_gradient(x)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def grad_reverse(x, alpha: float = 0.1):
    """Identity forward; backward multiplies the gradient by -alpha (GRLayer)."""
    return x


def _gr_fwd(x, alpha):
    return x, None


def _gr_bwd(alpha, _, g):
    return (jax.tree.map(lambda t: -alpha * t, g),)


grad_reverse.defvjp(_gr_fwd, _gr_bwd)
