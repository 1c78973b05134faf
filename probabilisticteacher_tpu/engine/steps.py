"""Fused train steps: burn-in and mutual learning, each ONE compiled XLA graph.

TPU-native redesign of ``PTrainer.run_step`` (``pt/engine/trainer.py:263-392``). The
reference runs 4 separate model forwards plus a host-side Python EMA walk
(``trainer.py:431-449``) per iteration; here each phase is a single jitted, donated
function containing:

  burn-in:  on-device strong aug -> scale jitter -> supervised loss on
            (strong + weak) views -> clip/SGD update.
  mutual:   EMA teacher update -> teacher pseudo-labels on weak unlabeled
            (stop_gradient) -> supervised loss on labeled (jittered strong + weak)
            -> unsupervised soft losses on jittered strong unlabeled (danchor)
            -> one combined backward -> clip/SGD update.

The teacher EMA is a pure functional tree_map (zero communication under data
parallelism: every replica holds identical student params post-psum).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..data.device_aug import scale_jitter, strong_augment
from ..modeling.detector import PTDetector
from ..structures import GroundTruth, ImageBatch, PseudoLabels


class TrainState(NamedTuple):
    step: jnp.ndarray          # () int32, the iteration about to run
    student: Any               # param pytree
    teacher: Any               # param pytree (same structure)
    opt_state: Any


def create_train_state(detector: PTDetector, tx: optax.GradientTransformation,
                       rng: jax.Array = None, canvas_hw=(64, 64),
                       params: Any = None) -> TrainState:
    """Fresh TrainState at step 0; pass ``params`` (e.g. pretrained-initialized)
    to skip the detector init — the single construction path for trainer,
    bench, and tests."""
    if params is None:
        params = detector.init(rng, canvas_hw)
    teacher = jax.tree.map(jnp.copy, params)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        student=params,
        teacher=teacher,
        opt_state=tx.init(params),
    )


def _sum_losses(d):
    """Sum only loss_* entries (dicts also carry sampling stats for EventStorage,
    matching the reference's key[:4] == 'loss' filter, ``trainer.py:283-286``)."""
    return sum(v for k, v in d.items() if k.startswith("loss"))


def ema_update(teacher, student, keep_rate):
    """teacher <- student * (1 - keep) + teacher * keep (``trainer.py:431-449``)."""
    return jax.tree.map(lambda t, s: s * (1.0 - keep_rate) + t * keep_rate, teacher, student)


def make_train_steps(
    cfg, detector: PTDetector, tx: optax.GradientTransformation
) -> Tuple[Callable, Callable]:
    """Returns (burnin_step, mutual_step), both jit-compiled with donated state."""
    arch = detector.arch
    pix_dtype = detector.dtype  # bf16 pixel/aug chain under AMP
    w_sup = float(cfg.UNSUPNET.SOURCE_LOSS_WEIGHT)
    w_unsup = float(cfg.UNSUPNET.TARGET_UNSUP_LOSS_WEIGHT)
    burn_up = int(cfg.UNSUPNET.BURN_UP_STEP)
    unsup_warmup = int(cfg.UNSUPNET.UNSUP_LOSS_WARMUP_ITERS)
    ema_keep = float(cfg.UNSUPNET.EMA_KEEP_RATE)
    teacher_update_iter = int(cfg.UNSUPNET.TEACHER_UPDATE_ITER)

    def _apply_updates(state: TrainState, grads, losses: Dict[str, jnp.ndarray],
                       new_teacher) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        updates, new_opt = tx.update(grads, state.opt_state, state.student)
        new_student = optax.apply_updates(state.student, updates)
        metrics = dict(losses)
        metrics["total_loss"] = _sum_losses(losses)
        return (
            TrainState(state.step + 1, new_student, new_teacher, new_opt),
            metrics,
        )

    # ------------------------------------------------------------- burn-in
    def burnin_step(state: TrainState, limg: ImageBatch, lgt: GroundTruth, rng: jax.Array):
        """Source-only supervised step on strong+weak views (``trainer.py:274-288``)."""
        k_aug, k_jit, k_sup = jax.random.split(jax.random.fold_in(rng, state.step), 3)
        strong = strong_augment(k_aug, limg.image, dtype=pix_dtype)
        images = jnp.concatenate([strong, limg.image.astype(pix_dtype)], axis=0)
        hw = jnp.concatenate([limg.image_hw, limg.image_hw], axis=0)
        gt = GroundTruth(
            boxes=jnp.concatenate([lgt.boxes, lgt.boxes], axis=0),
            classes=jnp.concatenate([lgt.classes, lgt.classes], axis=0),
            valid=jnp.concatenate([lgt.valid, lgt.valid], axis=0),
        )
        # reference: extend THEN resize -> jitter applies to all views
        images, jboxes = scale_jitter(k_jit, images, hw, gt.boxes, arch.pixel_mean,
                                      dtype=pix_dtype)
        gt = gt._replace(boxes=jboxes)
        batch = ImageBatch(images, hw)

        def loss_fn(params):
            losses = detector.supervised_losses(params, batch, gt, k_sup)
            return _sum_losses(losses), losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.student)
        return _apply_updates(state, grads, losses, state.teacher)

    # ------------------------------------------------------------- mutual
    def mutual_step(state: TrainState, limg: ImageBatch, lgt: GroundTruth,
                    uimg: ImageBatch, rng: jax.Array):
        """Mutual-learning step (``trainer.py:290-392``)."""
        k_aug_l, k_aug_u, k_jit_l, k_jit_u, k_sup = jax.random.split(
            jax.random.fold_in(rng, state.step), 5
        )

        # teacher update BEFORE pseudo-labeling (trainer.py:292-298):
        # full copy at the burn-up boundary, EMA every TEACHER_UPDATE_ITER after.
        is_boundary = state.step == burn_up
        do_update = ((state.step - burn_up) % teacher_update_iter) == 0
        keep = jnp.where(is_boundary, 0.0, jnp.where(do_update, ema_keep, 1.0))
        teacher = ema_update(state.teacher, state.student, keep)

        pseudo = detector.pseudo_labels(teacher, uimg)

        # labeled: jittered strong view + plain weak view (trainer.py:350-355)
        strong_l = strong_augment(k_aug_l, limg.image, dtype=pix_dtype)
        strong_l, lboxes_j = scale_jitter(k_jit_l, strong_l, limg.image_hw,
                                          lgt.boxes, arch.pixel_mean, dtype=pix_dtype)
        images_l = jnp.concatenate([strong_l, limg.image.astype(pix_dtype)], axis=0)
        hw_l = jnp.concatenate([limg.image_hw, limg.image_hw], axis=0)
        gt_l = GroundTruth(
            boxes=jnp.concatenate([lboxes_j, lgt.boxes], axis=0),
            classes=jnp.concatenate([lgt.classes, lgt.classes], axis=0),
            valid=jnp.concatenate([lgt.valid, lgt.valid], axis=0),
        )
        batch_l = ImageBatch(images_l, hw_l)

        # unlabeled: jittered strong view with jitter-transformed pseudo boxes
        strong_u = strong_augment(k_aug_u, uimg.image, dtype=pix_dtype)
        strong_u, pboxes_j = scale_jitter(k_jit_u, strong_u, uimg.image_hw,
                                          pseudo.boxes, arch.pixel_mean, dtype=pix_dtype)
        pseudo_j = PseudoLabels(
            boxes=jax.lax.stop_gradient(pboxes_j),
            logits=pseudo.logits, sigma=pseudo.sigma, valid=pseudo.valid,
        )
        batch_u = ImageBatch(strong_u, uimg.image_hw)

        # opt-in boundary ramp (UNSUP_LOSS_WARMUP_ITERS; 0 = reference-exact
        # full weight from the first mutual iter)
        if unsup_warmup > 0:
            ramp = jnp.clip(
                (state.step - burn_up).astype(jnp.float32) / unsup_warmup, 0.0, 1.0)
            w_u = w_unsup * ramp
        else:
            w_u = w_unsup

        def loss_fn(params):
            # fused student forward: one backbone/RPN/ROI pass over both views
            sup, unsup = detector.student_losses(
                params, batch_l, gt_l, batch_u, pseudo_j, k_sup)
            losses = {k + "_sup": v for k, v in sup.items()}
            losses.update({k + "_unsup": v for k, v in unsup.items()})
            total = w_sup * _sum_losses(sup) + w_u * _sum_losses(unsup)
            return total, losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.student)
        # observability: mean valid pseudo boxes per image, the reference's
        # num_proposal_output metric (``pt/engine/trainer.py:242-245``)
        losses["num_pseudo_boxes"] = (
            jnp.sum(pseudo.valid.astype(jnp.float32)) / pseudo.valid.shape[0])
        return _apply_updates(state, grads, losses, teacher)

    return (
        jax.jit(burnin_step, donate_argnums=0),
        jax.jit(mutual_step, donate_argnums=0),
    )
