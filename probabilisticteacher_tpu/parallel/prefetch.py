"""Device-input pipelining: overlap the host->device batch upload with the step.

``jax.device_put`` dispatch is asynchronous, but the transfer of batch N
still serializes with step N when both are issued back-to-back on one thread:
the step cannot start until its operands exist on device. On hosts where the
upload is slow relative to the step (this repo's tunneled TPU moves ~41 MB/s;
a 608x1216 batch-8 mutual iteration uploads ~18 MB against a 0.35 s step) that
serialization costs more than half the end-to-end throughput — BENCH_r04
measured 41.98 img/s e2e vs 92.47 device-only.

``DevicePrefetcher`` moves the upload off the critical path: a background
thread pulls host batches, uploads batch N+1 (``shard_fn``) while step N runs
on device, and hands fully-resident device batches to the training loop.
Steady-state rate becomes 1/max(upload, step) instead of 1/(upload + step).

Reference behavior replaced: the hot loop includes dataloading
(``/root/reference/pt/engine/trainer.py:267-270``); detectron2 hides uploads
behind CUDA streams implicitly — this explicit pipeline is the TPU-native
equivalent.

The phase decision (does this batch need the unlabeled stream uploaded?) is
EXACT, not heuristic: the worker counts iterations from ``start_iter`` in
consumption order, so the burn-in/mutual boundary is honored per batch even
with uploads running several steps ahead.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator

__all__ = ["DevicePrefetcher"]


class DevicePrefetcher:
    """Iterator of device-resident batches, uploaded one-or-more steps ahead.

    Args:
        host_iter: iterator of host (numpy) batches.
        shard_fn: ``(host_batch, iteration) -> device_batch`` — performs the
            device_put/sharding; runs on the background thread.
        start_iter: iteration number of the FIRST batch that will be consumed
            (resume support — the phase decision inside shard_fn depends on it).
        depth: max uploaded-but-unconsumed batches (device memory for ``depth``
            extra batches is the cost of the overlap; 1 is enough to hide one
            upload, 2 tolerates jitter).
    """

    def __init__(self, host_iter: Iterator, shard_fn: Callable[[Any, int], Any],
                 start_iter: int = 0, depth: int = 2):
        assert depth >= 1, depth
        self._host = host_iter
        self._shard = shard_fn
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._start_iter = start_iter
        self._thread = threading.Thread(target=self._worker, daemon=True,
                                        name="device-prefetch")
        self._thread.start()

    def _put(self, item) -> bool:
        """Blocking put that still honors close(); True if delivered."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self):
        it = self._start_iter
        try:
            while not self._stop.is_set():
                batch = next(self._host)
                dev = self._shard(batch, it)
                if not self._put(dev):
                    return
                it += 1
        except BaseException as e:  # noqa: BLE001 — surface to the consumer
            import sys

            if sys.is_finalizing() or isinstance(e, (KeyboardInterrupt,
                                                     SystemExit)):
                return
            import logging
            import traceback

            logging.getLogger("probabilisticteacher_tpu").error(
                "Device prefetch worker failed:\n" + traceback.format_exc())
            self._put(e)

    def __iter__(self):
        return self

    def __next__(self):
        if self._stop.is_set():
            raise StopIteration
        item = self._q.get()
        if isinstance(item, BaseException):
            raise RuntimeError("Device prefetch worker failed") from item
        return item

    def close(self):
        """Stop the worker; pending uploads are dropped."""
        self._stop.set()
        # unblock a worker stuck in q.put by draining
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=10)
