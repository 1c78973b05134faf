"""LR schedules + optimizer (optax equivalents of the reference solver stack).

- Schedules: WarmupMultiStepLR / WarmupCosineLR (detectron2) and the reference's
  WarmupTwoStageMultiStepLR with FACTOR_LIST (``pt/solver/lr_scheduler.py:22-66``,
  ``pt/solver/build.py:22-57``). All are pure step->lr functions usable inside jit.
- Optimizer: SGD momentum 0.9 + coupled weight decay (detectron2 ``build_optimizer``
  semantics: grad += wd * param before the momentum update), preceded by the
  trainer's clip-by-global-norm 10 (``pt/engine/trainer.py:592-603`` — scale =
  clip / max(total_norm, clip), exactly optax.clip_by_global_norm).
- Backbone freezing (``MODEL.BACKBONE.FREEZE_AT``, ``vgg.py:175-180``) as a
  zero-update parameter partition (idiomatic JAX replacement for requires_grad).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
import optax


def warmup_factor(method: str, it, warmup_iters: int, factor: float):
    """detectron2 _get_warmup_factor_at_iter as a traceable function."""
    if method == "constant":
        wf = jnp.where(it < warmup_iters, factor, 1.0)
    elif method == "linear":
        alpha = jnp.minimum(it / max(warmup_iters, 1), 1.0)
        wf = jnp.where(it < warmup_iters, factor * (1 - alpha) + alpha, 1.0)
    else:
        raise ValueError(f"Unknown warmup method: {method}")
    return wf


def build_lr_schedule(cfg) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """step -> lr, mirroring pt/solver/build.py:22-57."""
    s = cfg.SOLVER
    name = s.LR_SCHEDULER_NAME
    base_lr = float(s.BASE_LR)
    steps = tuple(int(x) for x in s.STEPS)
    gamma = float(s.GAMMA)
    wf0 = float(s.WARMUP_FACTOR)
    wi = int(s.WARMUP_ITERS)
    wm = s.WARMUP_METHOD

    if name == "WarmupMultiStepLR":

        def sched(it):
            it = jnp.asarray(it, jnp.float32)
            n_passed = sum(jnp.where(it >= m, 1.0, 0.0) for m in steps)
            return base_lr * warmup_factor(wm, it, wi, wf0) * gamma ** n_passed

    elif name == "WarmupCosineLR":
        max_iter = int(s.MAX_ITER)

        def sched(it):
            it = jnp.asarray(it, jnp.float32)
            cos = 0.5 * (1.0 + jnp.cos(math.pi * it / max_iter))
            return base_lr * warmup_factor(wm, it, wi, wf0) * cos

    elif name == "WarmupTwoStageMultiStepLR":
        factor_list = tuple(float(f) for f in s.FACTOR_LIST)
        assert len(factor_list) == len(steps) + 1, "FACTOR_LIST must be len(STEPS)+1"

        def sched(it):
            it = jnp.asarray(it, jnp.float32)
            idx = sum(jnp.where(it >= m, 1, 0) for m in steps)
            factors = jnp.asarray(factor_list)
            return base_lr * warmup_factor(wm, it, wi, wf0) * factors[idx]

    else:
        raise ValueError(f"Unknown LR scheduler: {name}")

    return sched


def _freeze_label_tree(params, freeze_at: int):
    """'frozen' for vgg blocks <= freeze_at, 'train' elsewhere."""
    import jax

    def label(path, _):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        for k in keys:
            if isinstance(k, str) and k.startswith("block"):
                try:
                    block_idx = int(k.split("_")[0].replace("block", ""))
                except ValueError:
                    continue
                if block_idx <= freeze_at and "backbone" in keys:
                    return "frozen"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def auto_scale_config(cfg):
    """detectron2 ``DefaultTrainer.auto_scale_workers`` semantics: when
    SOLVER.REFERENCE_BATCH_SIZE > 0 and the actual labeled batch differs, scale
    LR linearly and iteration counts inversely (exercised via
    ``configs/pt/final_c2f.yaml:15`` REFERENCE_BATCH_SIZE: 16)."""
    ref = int(cfg.SOLVER.get("REFERENCE_BATCH_SIZE", 0) or 0)
    bs = int(cfg.SOLVER.IMG_PER_BATCH_LABEL)
    if ref <= 0 or bs == ref:
        return cfg
    scale = bs / ref
    frozen = getattr(cfg, "__immutable__", False)
    if frozen:
        cfg.defrost()
    cfg.SOLVER.BASE_LR = cfg.SOLVER.BASE_LR * scale
    cfg.SOLVER.MAX_ITER = int(round(cfg.SOLVER.MAX_ITER / scale))
    cfg.SOLVER.WARMUP_ITERS = int(round(cfg.SOLVER.WARMUP_ITERS / scale))
    cfg.SOLVER.STEPS = tuple(int(round(s / scale)) for s in cfg.SOLVER.STEPS)
    cfg.SOLVER.CHECKPOINT_PERIOD = int(round(cfg.SOLVER.CHECKPOINT_PERIOD / scale))
    cfg.UNSUPNET.BURN_UP_STEP = int(round(cfg.UNSUPNET.BURN_UP_STEP / scale))
    if frozen:
        cfg.freeze()
    return cfg


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    """clip(10) -> coupled weight decay -> SGD momentum, with frozen-backbone mask."""
    s = cfg.SOLVER
    sched = build_lr_schedule(cfg)
    chain = [
    ]
    if s.CLIP_GRADIENTS.ENABLED:
        chain.append(optax.clip_by_global_norm(float(s.CLIP_GRADIENTS.CLIP_VALUE)))
    if float(s.WEIGHT_DECAY) > 0:
        chain.append(optax.add_decayed_weights(float(s.WEIGHT_DECAY)))
    chain.append(optax.sgd(learning_rate=sched, momentum=float(s.MOMENTUM),
                           nesterov=bool(s.NESTEROV)))
    tx = optax.chain(*chain)

    freeze_at = int(cfg.MODEL.BACKBONE.FREEZE_AT)
    if freeze_at > 0:
        labels = _freeze_label_tree(params, freeze_at)
        tx = optax.multi_transform({"train": tx, "frozen": optax.set_to_zero()}, labels)
    return tx
