"""Segment caches: codebook + adjacency device-residency tracking with stats
(reference: cache/SegmentCaches.java:33-271).

The reference caches decoded codebooks and adjacency rows loaded from FDB. In
the TPU design those artifacts live in each sealed segment's device bundle, so
the "cache" is HBM residency: a get materializes the host array onto the
device on miss, and eviction frees HBM. Hit/miss/load gauges keep the
reference's metric names ({cache=codebook|adjacency}).
"""

from __future__ import annotations

import threading

from vectorsearch_tpu.utils.metrics import get_registry


class SegmentCaches:
    def __init__(self, store):
        self.store = store
        self._lock = threading.Lock()
        self._metrics = get_registry()

    # ---------------------------------------------------------------- codebook

    def get_codebook(self, seg):
        """Device codebook for a sealed segment (loads on miss)."""
        attrs = {"cache": "codebook"}
        with seg._dev_lock:
            resident = seg._codebook_dev is not None
        if resident:
            self._metrics.inc("vectorsearch.cache.hit", attrs=attrs)
        else:
            self._metrics.inc("vectorsearch.cache.miss", attrs=attrs)
        cb = seg.codebook_dev
        if cb is None:
            self._metrics.inc("vectorsearch.cache.load_failure", attrs=attrs)
        elif not resident:
            self._metrics.inc("vectorsearch.cache.load_success", attrs=attrs)
        return cb

    def prefetch_codebooks(self, segments) -> None:
        """Warms codebooks for sealed segments (reference:
        fdb/FdbVectorIndex.java:377-416 codebook prefetch)."""
        for seg in segments:
            if seg.codebook_np is not None:
                self.get_codebook(seg)

    def codebook_cache_size(self) -> int:
        with self.store.lock:
            segs = list(self.store.segments.values())
        n = 0
        for seg in segs:
            with seg._dev_lock:
                if seg._codebook_dev is not None:
                    n += 1
        return n

    # --------------------------------------------------------------- adjacency

    def get_adjacency(self, seg):
        attrs = {"cache": "adjacency"}
        with seg._dev_lock:
            resident = seg._adjacency_dev is not None
        if resident:
            self._metrics.inc("vectorsearch.cache.hit", attrs=attrs)
        else:
            self._metrics.inc("vectorsearch.cache.miss", attrs=attrs)
        adj = seg.adjacency_dev
        if adj is None:
            self._metrics.inc("vectorsearch.cache.load_failure", attrs=attrs)
        elif not resident:
            self._metrics.inc("vectorsearch.cache.load_success", attrs=attrs)
        return adj

    def adjacency_cache_size(self) -> int:
        """Number of adjacency rows resident on device (the reference counts
        per-(segId,vecId) entries)."""
        with self.store.lock:
            segs = list(self.store.segments.values())
        n = 0
        for seg in segs:
            with seg._dev_lock:
                if seg._adjacency_dev is not None:
                    n += seg.next_row
        return n

    # ---------------------------------------------------------------- eviction

    def evict_segment(self, seg) -> None:
        """Frees a segment's device bundle (HBM pressure relief)."""
        seg.invalidate_device()
