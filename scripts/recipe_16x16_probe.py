"""Single-chip 16+16 recipe measurement (VERDICT r4 Next #6).

Does the reference's exact global batch — 16 labeled + 16 unlabeled
(``/root/reference/configs/pt/final_c2f.yaml:5-7``) — fit ONE v5e chip at
600 px production shapes, and at what img/s, under each memory lever?

Levers measured (round-4 dress rehearsal showed plain overflows by ~3 GB):
  plain      — reference-exact graph
  remat      — MODEL.BACKBONE.REMAT=True (recompute VGG activations in bwd)
  fused_bwd  — PT_ROIALIGN_FUSED_BWD=1 (Pallas bwd kernel, kills a ~1.6 GB
               transient; see DESIGN.md round 4)
  both       — remat + fused_bwd

One config per invocation (the env toggle must be set before import, and OOM
isolation wants a process boundary anyway):

    python scripts/recipe_16x16_probe.py plain|remat|fused_bwd|both

Prints one JSON line: compiled memory analysis (argument/output/temp/code
bytes from XLA) + 3-iter img/s, or the OOM shortfall.
"""

import json
import os
import sys
import time

MODE = sys.argv[1] if len(sys.argv) > 1 else "plain"
assert MODE in ("plain", "remat", "fused_bwd", "both"), MODE
# Fallback decomposition (the 16+16 compile crashes the remote compile
# helper — HTTP 500, see DESIGN.md round 5): measure the levers at a batch
# that DOES compile and extrapolate the activation-linear parts.
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 16

if MODE in ("fused_bwd", "both"):
    os.environ["PT_ROIALIGN_FUSED_BWD"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

if not os.environ.get("PT_PROBE_NO_CACHE"):  # isolate compile-helper crashes
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def build(remat: bool):
    import jax.numpy as jnp

    from probabilisticteacher_tpu.config import get_cfg
    from probabilisticteacher_tpu.engine.steps import create_train_state, make_train_steps
    from probabilisticteacher_tpu.modeling.detector import Arch, PTDetector
    from probabilisticteacher_tpu.parallel import make_mesh, replicate, shard_batch
    from probabilisticteacher_tpu.solver import build_optimizer
    from probabilisticteacher_tpu.structures import GroundTruth, ImageBatch

    batch, canvas = BATCH, (608, 1216)
    cfg = get_cfg()
    cfg.merge_from_file("/root/repo/configs/pt/final_c2f.yaml")
    cfg.MODEL.VGG.PRETRAIN = ""
    cfg.MODEL.BACKBONE.REMAT = remat
    cfg.SOLVER.IMG_PER_BATCH_LABEL = batch
    cfg.SOLVER.IMG_PER_BATCH_UNLABEL = batch
    cfg.UNSUPNET.BURN_UP_STEP = 0
    cfg.INPUT.CANVAS.WIDE = list(canvas)

    det = PTDetector(Arch.from_cfg(cfg))
    mesh = make_mesh()
    params = det.init(jax.random.key(0), canvas)
    tx = build_optimizer(cfg, params)
    state = replicate(mesh, create_train_state(det, tx, jax.random.key(0), canvas))
    _, mutual = make_train_steps(cfg, det, tx)

    rng = np.random.RandomState(0)
    h, w = canvas
    imgs = lambda: ImageBatch(  # noqa: E731
        image=jnp.asarray(rng.randint(0, 255, (batch, h, w, 3), dtype=np.uint8)),
        image_hw=jnp.asarray([[float(h), float(w)]] * batch))
    boxes = rng.uniform(0, min(h, w) // 2, (batch, 24, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(8, min(h, w) // 3, (batch, 24, 2))
    gt = GroundTruth(jnp.asarray(boxes),
                     jnp.asarray(rng.randint(0, 8, (batch, 24)), jnp.int32),
                     jnp.ones((batch, 24), bool))
    return (mutual, state,
            (shard_batch(mesh, imgs()), shard_batch(mesh, gt),
             shard_batch(mesh, imgs())))


out = {"mode": MODE, "batch": f"{BATCH}+{BATCH}", "canvas": [608, 1216]}
try:
    mutual, state, (limg, lgt, uimg) = build(remat=MODE in ("remat", "both"))
    key = jax.random.key(0)
    lowered = mutual.lower(state, limg, lgt, uimg, key)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    out["compile_s"] = round(time.perf_counter() - t0, 1)
    try:
        ma = compiled.memory_analysis()
        out["hbm"] = {
            "argument_gb": round(ma.argument_size_in_bytes / 2**30, 2),
            "output_gb": round(ma.output_size_in_bytes / 2**30, 2),
            "temp_gb": round(ma.temp_size_in_bytes / 2**30, 2),
            "code_gb": round(ma.generated_code_size_in_bytes / 2**30, 3),
            # peak program footprint: args alias donated outputs, so peak ~=
            # args + temp + code
            "peak_gb": round((ma.argument_size_in_bytes + ma.temp_size_in_bytes
                              + ma.generated_code_size_in_bytes) / 2**30, 2),
        }
    except Exception as e:  # noqa: BLE001 — memory_analysis optional on axon
        out["hbm_error"] = str(e)[:200]

    # 3 timed iters (scalar fetch = real sync on tunneled backends)
    state, m = compiled(state, limg, lgt, uimg, key)
    float(m["total_loss"])
    t0 = time.perf_counter()
    prev = None
    iters = 3
    for _ in range(iters):
        state, m = compiled(state, limg, lgt, uimg, key)
        if prev is not None:
            float(prev)
        prev = m["total_loss"]
    float(prev)
    dt = (time.perf_counter() - t0) / iters
    out["step_s"] = round(dt, 3)
    out["img_per_s"] = round(4 * BATCH / dt, 2)  # 2 student + 1 teacher + strong-aug: 4x convention of bench.py
    out["fits"] = True
except Exception as e:  # noqa: BLE001 — report OOM shortfall
    msg = str(e)
    oom = any(s in msg for s in ("RESOURCE_EXHAUSTED", "Out of memory", "OOM",
                                 "exceeds the amount of memory available"))
    out["fits"] = False
    out["error"] = ("OOM: " if oom else "ERROR: ") + msg[:400]

print(json.dumps(out), flush=True)
