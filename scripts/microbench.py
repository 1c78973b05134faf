#!/usr/bin/env python
"""Component-level timing on the real chip: where does the mutual step spend time?

Times (per call, after compile): backbone fwd, rpn-losses-only train step,
proposal NMS, teacher ROI inference, full supervised, full pseudo_labels,
full mutual step. Run: python scripts/microbench.py [--batch 4]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def timeit(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--canvas", type=int, nargs=2, default=[608, 1216])
    p.add_argument("--roi-impl", default="mxu", choices=["mxu", "gather", "pallas"])
    args = p.parse_args()

    from probabilisticteacher_tpu.config import get_cfg
    from probabilisticteacher_tpu.engine.steps import create_train_state, make_train_steps
    from probabilisticteacher_tpu.modeling.detector import Arch, PTDetector
    from probabilisticteacher_tpu.solver import build_optimizer
    from probabilisticteacher_tpu.structures import GroundTruth, ImageBatch

    cfg = get_cfg()
    cfg.MODEL.VGG.PRETRAIN = ""
    cfg.SOLVER.AMP.ENABLED = True
    cfg.UNSUPNET.BURN_UP_STEP = 0
    b = args.batch
    cfg.SOLVER.IMG_PER_BATCH_LABEL = b
    cfg.SOLVER.IMG_PER_BATCH_UNLABEL = b
    arch = Arch.from_cfg(cfg)
    arch = arch.__class__(**{**arch.__dict__, "roi_align_impl": args.roi_impl})
    det = PTDetector(arch)
    h, w = args.canvas

    rng = np.random.RandomState(0)
    params = det.init(jax.random.key(0), (h, w))
    images = ImageBatch(
        jnp.asarray(rng.randint(0, 255, (b, h, w, 3)).astype(np.float32)),
        jnp.asarray([[float(h), float(w)]] * b),
    )
    g = 24
    boxes = rng.uniform(0, 300, (b, g, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(16, 200, (b, g, 2))
    gt = GroundTruth(jnp.asarray(boxes), jnp.asarray(rng.randint(0, 8, (b, g)), jnp.int32),
                     jnp.ones((b, g), bool))

    # 1. backbone fwd
    t = timeit(jax.jit(lambda p, im: det.features(p, im)), params, images)
    print(f"backbone fwd (b={b}):            {t*1e3:8.1f} ms")

    feat = jax.jit(det.features)(params, images)
    obj, deltas = jax.jit(det.rpn_predict)(params, feat)
    anchors = det.anchors(params, feat.shape[1], feat.shape[2])

    # 2. rpn sup losses (match + sample + loss)
    t = timeit(jax.jit(lambda o, d: det.rpn_supervised_losses(anchors, o, d, gt, jax.random.key(1))), obj, deltas)
    print(f"rpn label+sample+losses:         {t*1e3:8.1f} ms")

    # 3. proposal NMS (train topk)
    prop_fn = jax.jit(lambda o, d: det.predict_proposals(anchors, o, d, images.image_hw, True))
    t = timeit(prop_fn, obj, deltas)
    print(f"predict_proposals (12k->2k NMS): {t*1e3:8.1f} ms")
    proposals = prop_fn(obj, deltas)

    # 4. roi_predict on 2000 proposals (teacher scale)
    t = timeit(jax.jit(lambda p, f, bx: det.roi_predict(p, f, bx)), params, feat, proposals.boxes)
    print(f"roi_predict (P=2000):            {t*1e3:8.1f} ms")

    # 5. roi inference (decode+filter+NMS 16k)
    t = timeit(jax.jit(lambda p, f, pr: det._roi_inference(p, f, pr, images.image_hw)), params, feat, proposals)
    print(f"roi inference (incl 16k NMS):    {t*1e3:8.1f} ms")

    # 5b. roi_predict fwd+bwd at student scale (ROI_BATCH+MAX_GT boxes)
    sb = cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE
    sboxes = proposals.boxes[:, :sb]
    t = timeit(jax.jit(lambda p, f, bx: jax.grad(
        lambda q: jnp.sum(det.roi_predict(q, f, bx)[0]))(p)), params, feat, sboxes)
    print(f"roi_predict fwd+bwd (P={sb}):    {t*1e3:8.1f} ms")

    # 5c. rpn-only supervised fwd+bwd (no proposals/roi)
    def rpn_only(p):
        ft = det.features(p, images)
        o, d = det.rpn_predict(p, ft)
        anc = jax.lax.stop_gradient(det.anchors(p, ft.shape[1], ft.shape[2]))
        return sum(det.rpn_supervised_losses(anc, o, d, gt, jax.random.key(1)).values())

    t = timeit(jax.jit(lambda p: jax.grad(rpn_only)(p)), params)
    print(f"rpn-only sup fwd+bwd:            {t*1e3:8.1f} ms")

    # 5d. backbone fwd+bwd alone
    t = timeit(jax.jit(lambda p: jax.grad(
        lambda q: jnp.sum(det.features(q, images)))(p)), params)
    print(f"backbone fwd+bwd:                {t*1e3:8.1f} ms")

    # 6. full branches
    t = timeit(jax.jit(det.pseudo_labels), params, images)
    print(f"pseudo_labels (teacher pass):    {t*1e3:8.1f} ms")
    sup = jax.jit(lambda p: sum(det.supervised_losses(p, images, gt, jax.random.key(2)).values()))
    t = timeit(sup, params)
    print(f"supervised fwd:                  {t*1e3:8.1f} ms")
    supg = jax.jit(lambda p: jax.grad(lambda q: sum(det.supervised_losses(q, images, gt, jax.random.key(2)).values()))(p))
    t = timeit(supg, params)
    print(f"supervised fwd+bwd:              {t*1e3:8.1f} ms")

    # 7. full mutual step
    tx = build_optimizer(cfg, params)
    state = create_train_state(det, tx, jax.random.key(0), (h, w))
    _, mutual = make_train_steps(cfg, det, tx)
    key = jax.random.key(3)

    def step(s):
        s, m = mutual(s, images, gt, images, key)
        return s, m

    s2, m = step(state)
    jax.block_until_ready(m["total_loss"])
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        s2, m = step(s2)
    jax.block_until_ready(m["total_loss"])
    t = (time.perf_counter() - t0) / iters
    print(f"FULL mutual step:                {t*1e3:8.1f} ms   ({4*b/t:.1f} img/s)")


if __name__ == "__main__":
    main()
