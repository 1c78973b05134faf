"""Differential tests against the reference's OWN torch code (not restatements).

The reference repo at /root/reference carries four modules that import cleanly
with torch-cpu plus a few tiny symbol shims (detectron2/fvcore are NOT installed
here, but these modules only touch ``cat``, ``Boxes`` and
``_get_warmup_factor_at_iter`` from them):

- ``pt/modeling/box_regression.py`` — Box2BoxTransform + Gaussian/Laplace pdfs
- ``pt/solver/lr_scheduler.py``     — WarmupTwoStageMultiStepLR
- ``pt/modeling/utils.py``          — grad_zero / grad_reverse autograd Functions
- ``pt/data/transforms/augmentation_impl.py`` — PIL GaussianBlur / Solarize

Running them as oracles upgrades the parity evidence for these components from
"numpy restatement of the published formula" (tests/oracles.py) to "differential
vs the reference implementation executing in-process". Skipped cleanly when the
reference checkout is absent.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REF / "pt" / "modeling" / "box_regression.py").exists(),
    reason="reference checkout not available",
)

torch = pytest.importorskip("torch")


def _shims():
    """Minimal stand-ins for the detectron2/fvcore symbols the reference modules
    import at module level. Each is a line or two of glue — behavior under test
    lives entirely in the reference files."""
    fv = types.ModuleType("fvcore")
    fvnn = types.ModuleType("fvcore.nn")

    def _unused(*a, **k):  # giou/smooth-l1 branches are never exercised here
        raise NotImplementedError

    fvnn.giou_loss = _unused
    fvnn.smooth_l1_loss = _unused
    fv.nn = fvnn

    d2 = types.ModuleType("detectron2")
    lay = types.ModuleType("detectron2.layers")
    lay.cat = lambda ts, dim=0: torch.cat(ts, dim)
    st = types.ModuleType("detectron2.structures")

    class Boxes:  # only referenced in type annotations of unexercised helpers
        def __init__(self, tensor):
            self.tensor = tensor

    st.Boxes = Boxes
    sol = types.ModuleType("detectron2.solver")
    lrs = types.ModuleType("detectron2.solver.lr_scheduler")

    def _get_warmup_factor_at_iter(method, it, warmup_iters, warmup_factor):
        # detectron2's published warmup semantics (solver/lr_scheduler.py).
        if it >= warmup_iters:
            return 1.0
        if method == "constant":
            return warmup_factor
        if method == "linear":
            alpha = it / warmup_iters
            return warmup_factor * (1 - alpha) + alpha
        raise ValueError(method)

    lrs._get_warmup_factor_at_iter = _get_warmup_factor_at_iter
    sol.lr_scheduler = lrs
    return {
        "fvcore": fv,
        "fvcore.nn": fvnn,
        "detectron2": d2,
        "detectron2.layers": lay,
        "detectron2.structures": st,
        "detectron2.solver": sol,
        "detectron2.solver.lr_scheduler": lrs,
    }


def _load(rel: str, name: str):
    spec = importlib.util.spec_from_file_location(name, str(REF / rel))
    mod = importlib.util.module_from_spec(spec)
    # torch.jit.script needs the module registered for source introspection
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    shims = _shims()
    saved = {k: sys.modules.get(k) for k in shims}
    sys.modules.update(shims)
    try:
        mods = types.SimpleNamespace(
            box_regression=_load("pt/modeling/box_regression.py", "_ref_box_regression"),
            lr_scheduler=_load("pt/solver/lr_scheduler.py", "_ref_lr_scheduler"),
            utils=_load("pt/modeling/utils.py", "_ref_utils"),
            aug=_load("pt/data/transforms/augmentation_impl.py", "_ref_aug_impl"),
        )
    finally:
        for k, old in saved.items():
            if old is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = old
    return mods


def _random_boxes(rng, n, lo=0.0, hi=600.0, min_size=1.0):
    x1 = rng.uniform(lo, hi - 2 * min_size, n)
    y1 = rng.uniform(lo, hi - 2 * min_size, n)
    w = rng.uniform(min_size, 120.0, n)
    h = rng.uniform(min_size, 120.0, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


@pytest.mark.parametrize("weights", [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)])
def test_get_deltas_matches_reference(ref, weights):
    """ops/box_regression.py::get_deltas vs Box2BoxTransform.get_deltas
    (pt/modeling/box_regression.py:66-97), incl. the +1e-9 inside the log."""
    from probabilisticteacher_tpu.ops import box_regression as br

    rng = np.random.default_rng(0)
    src = _random_boxes(rng, 256)
    tgt = _random_boxes(rng, 256)
    t = ref.box_regression.Box2BoxTransform(weights=weights)
    want = t.get_deltas(torch.from_numpy(src), torch.from_numpy(tgt)).numpy()
    got = np.asarray(br.get_deltas(jnp.asarray(src), jnp.asarray(tgt), weights))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [1, 8])
def test_apply_deltas_matches_reference(ref, k):
    """ops/box_regression.py::apply_deltas vs Box2BoxTransform.apply_deltas
    (pt/modeling/box_regression.py:99-139): weight division, dw/dh clamp at
    log(1000/16), class-specific (N, K*4) layout."""
    from probabilisticteacher_tpu.ops import box_regression as br

    rng = np.random.default_rng(1)
    boxes = _random_boxes(rng, 128)
    deltas = rng.normal(0.0, 2.0, (128, 4 * k)).astype(np.float32)
    deltas[::7] *= 20.0  # force clamp-triggering dw/dh rows
    weights = (10.0, 10.0, 5.0, 5.0)
    t = ref.box_regression.Box2BoxTransform(weights=weights)
    want = t.apply_deltas(torch.from_numpy(deltas), torch.from_numpy(boxes)).numpy()
    got = np.asarray(br.apply_deltas(jnp.asarray(deltas), jnp.asarray(boxes), weights))
    np.testing.assert_allclose(got, want.reshape(got.shape), rtol=1e-4, atol=1e-3)


def test_probabilistic_pdfs_match_reference(ref):
    """gaussian_dist_pdf / laplace_dist_pdf vs the reference's torch versions
    (pt/modeling/box_regression.py:33-40, sigma-constant 0.3, eps 1e-9)."""
    from probabilisticteacher_tpu.ops import box_regression as br

    rng = np.random.default_rng(2)
    val = rng.normal(0, 1, 1000).astype(np.float32)
    mean = rng.normal(0, 1, 1000).astype(np.float32)
    var = rng.uniform(0, 4, 1000).astype(np.float32)  # includes var == 0 region
    var[:10] = 0.0
    tv, tm, tvar = map(torch.from_numpy, (val, mean, var))
    want_g = ref.box_regression.gaussian_dist_pdf(tv, tm, tvar).numpy()
    want_l = ref.box_regression.laplace_dist_pdf(tv, tm, tvar).numpy()
    got_g = np.asarray(br.gaussian_dist_pdf(jnp.asarray(val), jnp.asarray(mean), jnp.asarray(var)))
    got_l = np.asarray(br.laplace_dist_pdf(jnp.asarray(val), jnp.asarray(mean), jnp.asarray(var)))
    np.testing.assert_allclose(got_g, want_g, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_l, want_l, rtol=1e-5, atol=1e-6)


def test_two_stage_lr_schedule_matches_reference(ref):
    """solver.py::build_lr_schedule("WarmupTwoStageMultiStepLR") vs the
    reference scheduler stepped through a real torch optimizer
    (pt/solver/lr_scheduler.py:22-66). Covers warmup boundary (iter ==
    warmup_iters), every milestone edge, and the factor-list indexing."""
    from probabilisticteacher_tpu.config import get_cfg
    from probabilisticteacher_tpu.solver import build_lr_schedule

    base_lr, milestones, factors = 0.016, [30, 60, 90], [1.0, 1.0, 0.5, 0.25]
    wi, wf = 13, 0.001

    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    sched_ref = ref.lr_scheduler.WarmupTwoStageMultiStepLR(
        opt, milestones=milestones, factor_list=factors,
        warmup_factor=wf, warmup_iters=wi)
    want = []
    for _ in range(120):
        want.append(opt.param_groups[0]["lr"])
        sched_ref.step()

    cfg = get_cfg()
    cfg.SOLVER.LR_SCHEDULER_NAME = "WarmupTwoStageMultiStepLR"
    cfg.SOLVER.BASE_LR = base_lr
    cfg.SOLVER.STEPS = tuple(milestones)
    cfg.SOLVER.FACTOR_LIST = tuple(factors)
    cfg.SOLVER.WARMUP_ITERS = wi
    cfg.SOLVER.WARMUP_FACTOR = wf
    cfg.SOLVER.WARMUP_METHOD = "linear"
    sched = build_lr_schedule(cfg)
    got = [float(sched(it)) for it in range(120)]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


def test_grad_utils_match_reference(ref):
    """ops/grad.py::{grad_zero, grad_reverse} vs ZeroLayer/GRLayer
    (pt/modeling/utils.py:30-57): identity forward; zero / -0.1-scaled backward."""
    from probabilisticteacher_tpu.ops.grad import grad_reverse, grad_zero

    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, 32).astype(np.float32)
    w = rng.normal(0, 1, 32).astype(np.float32)

    for ref_fn, our_fn in [(ref.utils.grad_zero, grad_zero),
                           (ref.utils.grad_reverse, grad_reverse)]:
        tx = torch.from_numpy(x).requires_grad_(True)
        out = (ref_fn(tx) * torch.from_numpy(w)).sum()
        out.backward()
        want_fwd = ref_fn(torch.from_numpy(x)).detach().numpy()
        want_grad = tx.grad.numpy()

        got_fwd = np.asarray(our_fn(jnp.asarray(x)))
        got_grad = np.asarray(
            jax.grad(lambda v: jnp.sum(our_fn(v) * jnp.asarray(w)))(jnp.asarray(x)))
        np.testing.assert_allclose(got_fwd, want_fwd, rtol=1e-6)
        np.testing.assert_allclose(got_grad, want_grad, rtol=1e-5, atol=1e-7)


def test_solarize_matches_reference_pil(ref):
    """data/device_aug.py::solarize vs the reference Solarize(0.5) -> PIL
    ImageOps.solarize(img, 128) (pt/data/transforms/augmentation_impl.py:38-49).
    Exact equality on uint8 pixels, including the >= threshold edge."""
    from PIL import Image

    from probabilisticteacher_tpu.data import device_aug as da

    img = np.arange(256, dtype=np.uint8).reshape(16, 16)[..., None].repeat(3, axis=2)
    sol = ref.aug.Solarize(0.5)
    assert sol.threshold == 128
    want = np.asarray(sol(Image.fromarray(img))).astype(np.float32)
    got = np.asarray(da.solarize(jnp.asarray(img, jnp.float32)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("sigma", [0.5, 1.0, 2.0])
def test_gaussian_blur_matches_reference_pil(ref, sigma):
    """data/device_aug.py::gaussian_blur vs the reference GaussianBlur -> PIL
    ImageFilter.GaussianBlur(radius=sigma) (augmentation_impl.py:20-36), with
    the random sigma pinned via random.seed on the reference side and a
    degenerate sigma_range on ours.

    PIL implements Gaussian blur as a sequence of extended box filters
    (an approximation); ours is a true separable Gaussian. Compared on interior
    pixels (away from edge-padding semantics) the two agree to ~1 intensity
    level in the mean — this pins the radius==sigma parameterization and the
    overall kernel scale, the failure modes that would silently skew the
    strong-aug distribution."""
    import random as pyrandom

    from PIL import Image

    from probabilisticteacher_tpu.data import device_aug as da

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)

    blur = ref.aug.GaussianBlur(sigma=[sigma, sigma])  # degenerate range
    pyrandom.seed(0)
    want = np.asarray(blur(Image.fromarray(img))).astype(np.float32)

    key = jax.random.PRNGKey(0)
    got = np.asarray(da.gaussian_blur(key, jnp.asarray(img, jnp.float32),
                                      sigma_range=(sigma, sigma)))

    interior = (slice(8, -8), slice(8, -8), slice(None))
    diff = np.abs(got[interior] - want[interior])
    assert diff.mean() <= 1.5, f"mean abs diff {diff.mean():.3f} (sigma={sigma})"
    assert diff.max() <= 6.0, f"max abs diff {diff.max():.2f} (sigma={sigma})"
