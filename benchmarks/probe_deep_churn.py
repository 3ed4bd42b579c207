"""Diagnose the Deep10M churn QPS collapse at 1/5 scale (2M x 96, 10
segments of 200k): measures serving QPS idle vs under churn, and the
synchronous cost of the writer's own operations, so the collapse factor is
attributable. Run on the chip: python -u benchmarks/probe_deep_churn.py"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench
    import vectorsearch_tpu as vs
    from vectorsearch_tpu.core.index import VectorIndex
    from vectorsearch_tpu.core.persist import MemoryStorage
    from vectorsearch_tpu.params import Mode, SearchParams

    rng = np.random.default_rng(42)
    n, d, k = 2_000_000, 96, 10
    seg = n // 10
    centers = rng.normal(size=(1024, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 1024, n)] + 0.18 * rng.normal(
        size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    idx = VectorIndex.create_or_open(
        vs.VectorIndexConfig(
            storage=MemoryStorage(), name="probe", dimension=d, metric="L2",
            max_segment_size=seg, pq_m=16, pq_k=256, graph_degree=32,
            graph_build_breadth=64, local_worker_threads=1,
            local_maintenance_worker_threads=1,
            sealed_search_mode="exact", graph_build_mode="skip_for_flat",
            pq_build_mode="skip_for_exact",
            vacuum_min_deleted_ratio=0.1, vacuum_cooldown_s=5.0,
        )
    )
    t0 = time.time()
    idx.add_all(x)
    idx.await_indexing_complete(timeout=3600)
    print(json.dumps({"build_s": round(time.time() - t0, 1)}), flush=True)

    params = SearchParams(ef_search=150, beam_width=128, max_iters=6,
                          max_explore=150, mode=Mode.BEST_FIRST)
    q = x[rng.integers(0, n, 512)] + 0.02 * rng.normal(
        size=(512, d)).astype(np.float32)
    # warm the serving shapes the CHURN phase will use: one row in the
    # ACTIVE segment compiles the brute program (an empty ACTIVE is skipped
    # from dispatch, so warming before any insert misses that shape)
    idx.add_all(x[:1], [None])
    t_warm = time.time()
    idx.query_batch_arrays(q, k, params)
    print(json.dumps({"warm_with_active_s": round(time.time() - t_warm, 1)}),
          flush=True)

    # single-batch sync latency (includes tunnel RTT)
    ts = []
    for _ in range(6):
        t1 = time.perf_counter()
        idx.query_batch_arrays(q, k, params)
        ts.append(time.perf_counter() - t1)
    print(json.dumps({"sync_batch_ms": round(
        float(np.median(ts[1:])) * 1e3, 1)}), flush=True)

    qps_idle = bench.measure_qps(idx, np.concatenate([q] * 4), k, batch=512,
                                 seconds=12.0, params=params, in_flight=8)
    print(json.dumps({"qps_idle": round(qps_idle, 1)}), flush=True)

    # writer op costs, synchronous
    fresh = centers[rng.integers(0, 1024, 2000)] + 0.18 * rng.normal(
        size=(2000, d)).astype(np.float32)
    t1 = time.perf_counter(); idx.add_all(fresh)
    add_ms = (time.perf_counter() - t1) * 1e3
    t1 = time.perf_counter(); idx.delete_all(list(range(n // 2, n // 2 + 2000)))
    del_ms = (time.perf_counter() - t1) * 1e3
    t1 = time.perf_counter(); idx.query_batch_arrays(q, k, params)
    q_after_mut_ms = (time.perf_counter() - t1) * 1e3
    t1 = time.perf_counter(); idx.query_batch_arrays(q, k, params)
    q_after_mut2_ms = (time.perf_counter() - t1) * 1e3
    print(json.dumps({"add2000_ms": round(add_ms, 1),
                      "del2000_ms": round(del_ms, 1),
                      "query_after_mut_ms": round(q_after_mut_ms, 1),
                      "query_after_mut2_ms": round(q_after_mut2_ms, 1)}),
          flush=True)

    stop = [False]
    iters = [0]

    def writer():
        wrng = np.random.default_rng(7)
        next_del = n // 2 + 2000
        while not stop[0]:
            f = centers[wrng.integers(0, 1024, 2000)] + 0.18 * wrng.normal(
                size=(2000, d)).astype(np.float32)
            idx.add_all(f)
            idx.delete_all(list(range(next_del, next_del + 2000)))
            next_del += 2000
            iters[0] += 1
            time.sleep(0.05)

    wt = threading.Thread(target=writer, daemon=True)
    wt.start()
    time.sleep(1.0)
    qps_churn = bench.measure_qps(idx, np.concatenate([q] * 4), k, batch=512,
                                  seconds=15.0, params=params, in_flight=8)
    stop[0] = True
    wt.join()
    print(json.dumps({"qps_churn": round(qps_churn, 1),
                      "writer_iters": iters[0]}), flush=True)

    # attribution: same churn but with vacuum/compaction gated OFF — the
    # difference is pure maintenance cost (1-core host: vacuums/compactions
    # steal CPU and hold the store lock)
    object.__setattr__(idx.config.effective, "vacuum_min_deleted_ratio", 1.1)
    object.__setattr__(
        idx.config.effective, "auto_find_compaction_candidates", False
    )
    stop[0] = False
    iters[0] = 0
    wt2 = threading.Thread(target=writer, daemon=True)
    wt2.start()
    time.sleep(1.0)
    qps_churn_nomaint = bench.measure_qps(
        idx, np.concatenate([q] * 4), k, batch=512, seconds=15.0,
        params=params, in_flight=8)
    stop[0] = True
    wt2.join()
    print(json.dumps({"qps_churn_nomaint": round(qps_churn_nomaint, 1),
                      "writer_iters2": iters[0]}), flush=True)
    idx.close()


if __name__ == "__main__":
    main()
