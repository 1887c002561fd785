"""Dynamic micro-batching: aggregate concurrent requests into one
device batch.

A TPU forward at batch 1 and at batch 16 cost nearly the same wall time
(the gemms are far from the MXU's saturation point at serving shapes),
so batching concurrent requests multiplies throughput almost for free.
The batcher owns a single worker thread — JAX dispatch stays
single-threaded, which also serializes access to the (not thread-safe)
jitted callable — and hands results back through futures.

Policy: the worker blocks for the first request, then drains whatever
else arrived within ``max_wait_ms`` up to ``max_batch_size``. Under
load the wait never triggers (the queue is non-empty when a batch
finishes, so the next batch forms immediately); at low load a lone
request pays at most ``max_wait_ms`` extra latency.
"""

from __future__ import annotations

import collections
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, List, Optional, Sequence


class MicroBatcher:
    """Queue front-end for a ``predict_many(items) -> results`` callable.

    ``predict_many`` receives a list of request payloads and must return
    a sequence of equally many results (order-aligned). Exceptions fail
    every request in the batch.
    """

    def __init__(
        self,
        predict_many: Callable[[List[Any]], Sequence[Any]],
        max_batch_size: int = 32,
        max_wait_ms: float = 5.0,
        name: str = "mmf-serve-batcher",
        predict_many_async: Optional[Callable] = None,
        pipeline_depth: int = 2,
    ):
        """``predict_many_async``: dispatch-only variant returning a
        ``finalize()`` (ServingEngine.predict_many_async). When given,
        the batcher pipelines: the worker dispatches batch N+1 while a
        finalizer thread waits on batch N's results — host stacking and
        input transfer overlap device compute. ``pipeline_depth`` bounds
        how many dispatched-but-unfinished batches may be in flight."""
        if max_batch_size < 1:
            raise ValueError("max_batch_size must be >= 1")
        self._predict_many = predict_many
        self._predict_many_async = predict_many_async
        self.max_batch_size = max_batch_size
        self.max_wait_s = max_wait_ms / 1000.0
        self._queue = collections.deque()
        self._cv = threading.Condition()
        self._closed = False
        # stats (guarded by _cv)
        self._n_requests = 0
        self._n_batches = 0
        self._batch_hist = collections.Counter()
        self._latencies = collections.deque(maxlen=2048)
        self._inflight = None
        self._finalizer = None
        if predict_many_async is not None:
            import queue as queue_mod

            self._inflight = queue_mod.Queue(maxsize=max(1, pipeline_depth))
            self._finalizer = threading.Thread(
                target=self._finalize_loop, name=name + "-finalize",
                daemon=True,
            )
            self._finalizer.start()
        self._worker = threading.Thread(
            target=self._loop, name=name, daemon=True
        )
        self._worker.start()

    # -- client side ------------------------------------------------------

    def submit(self, item: Any) -> Future:
        fut = Future()
        with self._cv:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            self._queue.append((item, fut, time.perf_counter()))
            self._n_requests += 1
            self._cv.notify()
        return fut

    def predict(self, item: Any, timeout: float = None) -> Any:
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(item).result(timeout=timeout)

    # -- worker side ------------------------------------------------------

    def _take_batch(self):
        """Block for the first request, then drain up to max_batch_size
        within the wait window. Returns [] only when closed."""
        with self._cv:
            while not self._queue and not self._closed:
                self._cv.wait()
            if not self._queue:
                return []
            batch = [self._queue.popleft()]
            deadline = time.perf_counter() + self.max_wait_s
            while len(batch) < self.max_batch_size:
                if self._queue:
                    batch.append(self._queue.popleft())
                    continue
                remaining = deadline - time.perf_counter()
                if remaining <= 0 or self._closed:
                    break
                self._cv.wait(timeout=remaining)
            return batch

    def _complete(self, futures, t_in, results):
        now = time.perf_counter()
        with self._cv:
            self._n_batches += 1
            self._batch_hist[len(futures)] += 1
            for t0 in t_in:
                self._latencies.append(now - t0)
        for fut, res in zip(futures, results):
            if not fut.cancelled():
                fut.set_result(res)

    @staticmethod
    def _fail(futures, e):
        for fut in futures:
            if not fut.cancelled():
                fut.set_exception(e)

    def _loop(self):
        while True:
            batch = self._take_batch()
            if not batch:
                if self._inflight is not None:
                    self._inflight.put(None)  # unblock + stop finalizer
                return  # closed and drained
            items = [b[0] for b in batch]
            futures = [b[1] for b in batch]
            t_in = [b[2] for b in batch]
            if self._inflight is not None:
                try:
                    finalize = self._predict_many_async(items)
                except BaseException as e:  # noqa: BLE001
                    self._fail(futures, e)
                    continue
                self._inflight.put((finalize, futures, t_in))
                continue
            try:
                results = self._predict_many(items)
                if len(results) != len(items):
                    raise RuntimeError(
                        f"predict_many returned {len(results)} results "
                        f"for {len(items)} requests"
                    )
            except BaseException as e:  # noqa: BLE001 — fail the batch
                self._fail(futures, e)
                continue
            self._complete(futures, t_in, results)

    def _finalize_loop(self):
        while True:
            entry = self._inflight.get()
            if entry is None:
                return
            finalize, futures, t_in = entry
            try:
                results = finalize()
                if len(results) != len(futures):
                    raise RuntimeError(
                        f"finalize returned {len(results)} results "
                        f"for {len(futures)} requests"
                    )
            except BaseException as e:  # noqa: BLE001
                self._fail(futures, e)
                continue
            self._complete(futures, t_in, results)

    # -- introspection / lifecycle ---------------------------------------

    def stats(self) -> dict:
        with self._cv:
            lats = sorted(self._latencies)
            n = len(lats)

            def pct(p):
                return lats[min(n - 1, int(p * n))] * 1000 if n else None

            return {
                "requests": self._n_requests,
                "batches": self._n_batches,
                "mean_batch_size": (
                    self._n_requests / self._n_batches
                    if self._n_batches else None
                ),
                "batch_size_hist": dict(sorted(self._batch_hist.items())),
                "latency_ms": {
                    "p50": pct(0.50), "p95": pct(0.95), "p99": pct(0.99)
                },
                "queue_depth": len(self._queue),
            }

    def close(self, drain: bool = True):
        """Stop the worker. With ``drain`` the queue is processed first;
        otherwise pending requests fail."""
        with self._cv:
            self._closed = True
            if not drain:
                pending = list(self._queue)
                self._queue.clear()
                for _, fut, _ in pending:
                    fut.set_exception(RuntimeError("MicroBatcher closed"))
            self._cv.notify_all()
        self._worker.join(timeout=30)
        if self._finalizer is not None:
            self._finalizer.join(timeout=30)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
