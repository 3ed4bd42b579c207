"""Benchmark harness: sealed-segment BEST_FIRST query throughput on real TPU.

Reproduces the reference's primary JMH E2E workload scaled to TPU batch sizes
(reference: src/jmh/.../VectorIndexSearchBenchmark.java:29-132 — 1100 vectors,
maxSegmentSize=500 => 2 SEALED + 1 ACTIVE segment, BEST_FIRST k=10 with exact
re-rank) and reports batched QPS on one chip. The reference publishes no
numbers (BASELINE.md), so vs_baseline compares against a conservative estimate
of the Java reference's single-threaded latency on this workload (~1 ms/query
=> 1000 QPS) — the test-enforced recall floors are asserted instead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    from vectorsearch_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    import vectorsearch_tpu as vs
    from vectorsearch_tpu.core.index import VectorIndex
    from vectorsearch_tpu.core.persist import MemoryStorage

    rng = np.random.default_rng(42)
    n, d, k = 1100, 8, 10
    x = rng.normal(size=(n, d)).astype(np.float32)

    idx = VectorIndex.create_or_open(
        vs.VectorIndexConfig(
            storage=MemoryStorage(), name="bench", dimension=d, metric="L2",
            max_segment_size=500, pq_m=4, pq_k=16, graph_degree=16,
            graph_build_breadth=64, graph_alpha=1.2,
        )
    )
    gids = idx.add_all(x)
    # seal deterministically (2 PENDING segments)
    while idx.build_queue.has_visible_unclaimed_tasks():
        c = idx.build_queue.await_and_claim(timeout=1)
        if c is None:
            break
        idx.build_service.build(c.payload.seg_id)
        c.complete()

    queries = rng.normal(size=(8192, d)).astype(np.float32)
    batch = 512

    # correctness gate first: self-recall@10 >= 0.9 (reference floor)
    probe = idx.query_batch(x[:100], k)
    recall = sum(1 for i, r in enumerate(probe) if gids[i] in [s.gid for s in r]) / 100
    assert recall >= 0.9, f"self-recall gate failed: {recall}"

    # warmup (compile)
    idx.query_batch(queries[:batch], k)

    t0 = time.perf_counter()
    done = 0
    while time.perf_counter() - t0 < 5.0:
        off = done % (len(queries) - batch)
        idx.query_batch(queries[off : off + batch], k)
        done += batch
    dur = time.perf_counter() - t0
    qps = done / dur

    baseline_qps = 1000.0  # estimated single-thread Java reference on this workload
    print(json.dumps({
        "metric": "e2e_best_first_qps_1100x8_k10",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / baseline_qps, 2),
    }))
    idx.close()


if __name__ == "__main__":
    main()
