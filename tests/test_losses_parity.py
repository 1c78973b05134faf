"""Golden-value parity tests for the PT loss formulas vs torch oracles.

Each oracle below restates the loss formula documented in SURVEY.md / DESIGN.md
(with reference file:line citations) in plain torch, then the jnp implementation
must match numerically. This is the "bit-comparable pseudo-label distribution"
strategy of SURVEY.md section 4.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from probabilisticteacher_tpu.ops import losses as L
from probabilisticteacher_tpu.ops.box_regression import (gaussian_dist_pdf,
                                                         laplace_dist_pdf)

RNG = np.random.RandomState(0)


def test_gaussian_pdf_golden():
    """pdf = exp(-(v-m)^2/(var+eps)/2) / sqrt(2*pi*(var+0.3))  (box_regression.py:33-36)."""
    v = RNG.randn(5, 4).astype(np.float32)
    m = RNG.randn(5, 4).astype(np.float32)
    var = RNG.uniform(0.01, 0.99, (5, 4)).astype(np.float32)
    tv, tm, tvar = map(torch.tensor, (v, m, var))
    want = torch.exp(-(tv - tm) ** 2 / (tvar + 1e-9) / 2) / torch.sqrt(2 * math.pi * (tvar + 0.3))
    got = gaussian_dist_pdf(jnp.asarray(v), jnp.asarray(m), jnp.asarray(var))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5)


def test_laplace_pdf_golden():
    """pdf = exp(-|v-m|/sqrt(var+eps)) / sqrt(4*(var+0.3))  (box_regression.py:38-40)."""
    v = RNG.randn(5, 4).astype(np.float32)
    m = RNG.randn(5, 4).astype(np.float32)
    var = RNG.uniform(0.01, 0.99, (5, 4)).astype(np.float32)
    tv, tm, tvar = map(torch.tensor, (v, m, var))
    want = torch.exp(-torch.abs(tv - tm) / torch.sqrt(tvar + 1e-9)) / torch.sqrt(4 * (tvar + 0.3))
    got = laplace_dist_pdf(jnp.asarray(v), jnp.asarray(m), jnp.asarray(var))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5)


def test_efl_class_weight_golden():
    """w = (1 - H(softmax(t))/log(n))**lam  (rpn.py:285-290)."""
    t = RNG.randn(7, 9).astype(np.float32)
    lam = 0.5
    tt = torch.tensor(t)
    p = torch.softmax(tt, -1)
    entropy = -(p * torch.log(p)).sum(-1)
    want = (1 - entropy / math.log(9)) ** lam
    got = L.efl_class_weight(jnp.asarray(t), lam)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5)


def _torch_rpn_soft_cls(obj, t_logits, mask, tau0, efl, lam0):
    """rpn.py:285-307: target=[softmax(t/tau)[bg], sum fg] vs -log(sigmoid([1-o, o]))."""
    gt = t_logits[mask]
    o = obj[mask]
    if efl:
        temp = torch.softmax(gt, -1)
        entropy = -(temp * torch.log(temp)).sum(-1)
        weight = (1 - entropy / math.log(gt.shape[-1])) ** lam0
    soft = torch.softmax(gt / tau0, -1)
    soft = torch.stack([soft[:, -1], soft[:, :-1].sum(-1)], -1)
    if efl:
        soft = soft * weight.unsqueeze(-1)
    cls_out = torch.sigmoid(torch.stack([1 - o, o], -1))
    return torch.sum(soft * (-torch.log(cls_out + 1e-9)))


def test_rpn_soft_cls_loss_golden():
    r, k = 50, 8
    obj = RNG.randn(2, r).astype(np.float32)
    t_logits = RNG.randn(2, r, k + 1).astype(np.float32)
    mask = RNG.rand(2, r) < 0.3
    for efl in (False, True):
        want = sum(
            _torch_rpn_soft_cls(torch.tensor(obj[i]), torch.tensor(t_logits[i]),
                                torch.tensor(mask[i]), 0.5, efl, 0.5).item()
            for i in range(2)
        )
        got = L.rpn_soft_cls_loss(jnp.asarray(obj), jnp.asarray(t_logits),
                                  jnp.asarray(mask), 0.5, efl, 0.5)
        np.testing.assert_allclose(float(got), want, rtol=1e-4)


def _torch_kl(mean_q, sq_raw, mean_p, sp_raw, tau1, efl, lam1, model):
    """rpn.py:309-348 / fast_rcnn.py:215-263."""
    sigma_p = torch.sigmoid(sp_raw)
    if efl:
        if model == "GUASSIAN":
            entropy = 0.5 * torch.log(2 * math.pi * math.e * sigma_p)
            max_entropy = 0.5 * math.log(2 * math.pi * math.e)
        else:
            entropy = 1 + 0.5 * torch.log(4 * sigma_p)
            max_entropy = 1 + math.log(2)
        weight = (1 - entropy / max_entropy) ** lam1
    sigma_p = sigma_p * tau1
    sigma_q = torch.sigmoid(sq_raw)
    if model == "GUASSIAN":
        loss = 0.5 * torch.log(sigma_q / sigma_p) - 0.5 + (sigma_p + (mean_q - mean_p) ** 2) / (2 * sigma_q)
    else:
        loss = (torch.sqrt(sigma_p) * torch.exp(-torch.abs(mean_q - mean_p) / torch.sqrt(sigma_p)) / torch.sqrt(sigma_q)
                + torch.abs(mean_q - mean_p) / torch.sqrt(sigma_q)
                + 0.5 * torch.log(sigma_q / sigma_p) - 1)
    if efl:
        loss = loss * weight
    return loss


def test_kl_consistency_golden():
    n = 30
    mq = RNG.randn(n, 4).astype(np.float32)
    sq = RNG.randn(n, 4).astype(np.float32)
    mp = RNG.randn(n, 4).astype(np.float32)
    sp = RNG.randn(n, 4).astype(np.float32)
    mask = RNG.rand(n) < 0.5
    for model in ("GUASSIAN", "LAPLACE"):
        for efl in (False, True):
            t = _torch_kl(*map(torch.tensor, (mq, sq, mp, sp)), 0.5, efl, 0.5, model)
            want_sum = t[torch.tensor(mask)].sum().item()
            want_mean = t[torch.tensor(mask)].mean().item()
            got_sum = L.kl_consistency_box_loss(
                jnp.asarray(mq), jnp.asarray(sq), jnp.asarray(mp), jnp.asarray(sp),
                jnp.asarray(mask), 0.5, efl, 0.5, model, "sum")
            got_mean = L.kl_consistency_box_loss(
                jnp.asarray(mq), jnp.asarray(sq), jnp.asarray(mp), jnp.asarray(sp),
                jnp.asarray(mask), 0.5, efl, 0.5, model, "mean")
            np.testing.assert_allclose(float(got_sum), want_sum, rtol=2e-4)
            np.testing.assert_allclose(float(got_mean), want_mean, rtol=2e-4)


def test_roi_soft_cls_golden():
    """fast_rcnn.py:179-213: sum(softmax(t/tau)[*efl] * -log_softmax(s)) / rows."""
    n, k = 40, 8
    s = RNG.randn(n, k + 1).astype(np.float32)
    t = RNG.randn(n, k + 1).astype(np.float32)
    ts, tt = torch.tensor(s), torch.tensor(t)
    for efl in (False, True):
        pred = -torch.log_softmax(ts, -1)
        soft = torch.softmax(tt / 0.5, -1)
        if efl:
            temp = torch.softmax(tt, -1)
            entropy = -(temp * torch.log(temp)).sum(-1)
            w = (1 - entropy / math.log(k + 1)) ** 0.5
            soft = soft * w.unsqueeze(-1)
        want = (soft * pred).sum().item() / n
        got = L.roi_soft_cls_loss(jnp.asarray(s), jnp.asarray(t),
                                  jnp.ones(n, bool), 0.5, efl, 0.5)
        np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_prob_box_nll_golden():
    """rpn dense / roi box NLL: -log(pdf(gt; mean, sigmoid(raw)) + 1e-9), summed."""
    n = 25
    mean = RNG.randn(n, 4).astype(np.float32)
    raw = RNG.randn(n, 4).astype(np.float32)
    gt = RNG.randn(n, 4).astype(np.float32)
    mask = RNG.rand(n) < 0.6
    tm, tr, tg = map(torch.tensor, (mean, raw, gt))
    var = torch.sigmoid(tr)
    pdf = torch.exp(-(tm - tg) ** 2 / (var + 1e-9) / 2) / torch.sqrt(2 * math.pi * (var + 0.3))
    want = (-torch.log(pdf + 1e-9))[torch.tensor(mask)].sum().item()
    got = L.prob_box_nll_sum(jnp.asarray(mean), jnp.asarray(raw), jnp.asarray(gt),
                             jnp.asarray(mask), "GUASSIAN")
    np.testing.assert_allclose(float(got), want, rtol=2e-4)


def test_sigma_discount_golden():
    """score *= 1 - sum(sigmoid(sigma))/4  (fast_rcnn.py:100-101, proposal_utils.py:134-138)."""
    sigma = RNG.randn(10, 4).astype(np.float32)
    scores = RNG.rand(10).astype(np.float32)
    want = (torch.tensor(scores) * (1 - torch.sigmoid(torch.tensor(sigma)).sum(-1) / 4)).numpy()
    got = jnp.asarray(scores) * (1.0 - jnp.sum(jax.nn.sigmoid(jnp.asarray(sigma)), -1) / 4.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)
