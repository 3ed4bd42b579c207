"""Dynamic query batcher: coalesces concurrent callers into device batches.

The reference's API is async (every query returns a CompletableFuture,
api/VectorIndex.java:114-130) and each query runs independently. On TPU the
throughput lever is batching: this batcher collects queries arriving within a
small window (or until the target batch size) and executes them as ONE
`query_batch` call, so independent callers share each device program.

Usage:
    batcher = QueryBatcher(index, max_batch=256, max_wait_ms=2.0)
    future = batcher.submit(q, k)          # returns concurrent.futures.Future
    results = future.result()
    batcher.close()

Queries with differing (k, params) batch separately (they change the compiled
program); same-key queries coalesce.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from typing import Optional

import numpy as np

from vectorsearch_tpu.params import SearchParams


class QueryBatcher:
    def __init__(self, index, max_batch: int = 256, max_wait_ms: float = 2.0):
        self.index = index
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self._lock = threading.Condition()
        self._pending: dict[tuple, list[tuple[np.ndarray, Future]]] = {}
        self._closed = False
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="query-batcher")
        self._thread.start()

    @staticmethod
    def _key(k: int, params: Optional[SearchParams]) -> tuple:
        return (k, params)

    def submit(self, q, k: int, params: Optional[SearchParams] = None) -> Future:
        """Enqueues one query; the Future resolves to list[SearchResult]."""
        fut: Future = Future()
        q = np.asarray(q, np.float32)
        with self._lock:
            if self._closed:
                raise RuntimeError("batcher closed")
            self._pending.setdefault(self._key(k, params), []).append((q, fut))
            self._lock.notify()
        return fut

    def _drain(self) -> list[tuple[tuple, list]]:
        with self._lock:
            deadline = time.monotonic() + self.max_wait_s
            while not self._closed:
                total = sum(len(v) for v in self._pending.values())
                if total >= self.max_batch:
                    break
                remaining = deadline - time.monotonic()
                if total > 0 and remaining <= 0:
                    break
                self._lock.wait(max(remaining, 0.0005) if total else 0.05)
            out = list(self._pending.items())
            self._pending = {}
            return out

    def _loop(self) -> None:
        while True:
            batches = self._drain()
            with self._lock:
                if self._closed and not batches:
                    return
            for (k, params), items in batches:
                qs = np.stack([q for q, _ in items])
                try:
                    results = self.index.query_batch(qs, k, params)
                    for (_, fut), res in zip(items, results):
                        fut.set_result(res)
                except Exception as e:  # propagate to every caller
                    for _, fut in items:
                        if not fut.done():
                            fut.set_exception(e)

    def close(self) -> None:
        with self._lock:
            self._closed = True
            self._lock.notify_all()
        self._thread.join(timeout=10.0)
