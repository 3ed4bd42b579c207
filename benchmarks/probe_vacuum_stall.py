"""What does a vacuum cost serving? (r5: with writer-driven sync fixed,
probe_churn_attrib's remaining 0-QPS windows all have vac=1.) Builds a
2M-row exact index, tombstones 15% of one segment, then times
vacuum_segment's phases (remove_rows / checkpoint_segment / flag sync)
and measures a serving window WHILE a vacuum runs.

Run: python -u benchmarks/probe_vacuum_stall.py
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import vectorsearch_tpu as vs
    from vectorsearch_tpu.core.index import VectorIndex
    from vectorsearch_tpu.core.persist import MemoryStorage
    from vectorsearch_tpu.params import Mode, SearchParams

    rng = np.random.default_rng(42)
    n, d, k = 2_000_000, 96, 10
    seg = n // 2  # 2 segments of 1M: vacuum cost at the deep10m seg size
    centers = rng.normal(size=(1024, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 1024, n)] + 0.18 * rng.normal(
        size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    idx = VectorIndex.create_or_open(vs.VectorIndexConfig(
        storage=MemoryStorage(), name="vstall", dimension=d, metric="L2",
        max_segment_size=seg, pq_m=16, pq_k=256, graph_degree=32,
        graph_build_breadth=64, local_worker_threads=1,
        local_maintenance_worker_threads=0,  # vacuum runs on OUR schedule
        sealed_search_mode="exact", graph_build_mode="skip_for_flat",
        pq_build_mode="skip_for_exact",
        vacuum_min_deleted_ratio=0.1, vacuum_cooldown_s=0.0,
    ))
    gids = idx.add_all(x)
    idx.await_indexing_complete(timeout=3600)

    params = SearchParams(ef_search=150, beam_width=128, max_iters=6,
                          max_explore=150, mode=Mode.BEST_FIRST)
    q = centers[rng.integers(0, 1024, 512 * 8)] + 0.18 * rng.normal(
        size=(512 * 8, d)).astype(np.float32)
    q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
    idx.add_all(x[:1])
    idx.delete_all([gids[10]])
    idx.query_batch_arrays(q[:512], k, params)
    idx.query_batch_arrays(q[:512], k, params)
    time.sleep(8)  # let the first-query ladder warm finish off-path

    # tombstone 15% of segment 0
    idx.delete_all(list(range(0, 150_000)))
    time.sleep(1.0)

    # phase timings, synchronous (instrument by calling internals the way
    # MaintenanceService does)
    store = idx.store
    seg0 = store.segments[0]
    t0 = time.perf_counter()
    doomed = np.flatnonzero(
        seg0.exists_np[: seg0.next_row] & ~seg0.alive_np[: seg0.next_row]
    )
    t_scan = time.perf_counter() - t0
    with store.lock:
        t0 = time.perf_counter()
        seg0.remove_rows(doomed)
        t_remove = time.perf_counter() - t0
        t0 = time.perf_counter()
        store.checkpoint_segment(0)
        t_ckpt = time.perf_counter() - t0
    t0 = time.perf_counter()
    seg0.sync_device()
    import jax
    jax.block_until_ready(seg0._alive_dev)
    t_sync = time.perf_counter() - t0
    print(json.dumps({
        "metric": "vacuum_phases_ms", "rows_removed": int(len(doomed)),
        "scan": round(t_scan * 1e3, 1), "remove_rows": round(t_remove * 1e3, 1),
        "checkpoint_segment": round(t_ckpt * 1e3, 1),
        "flag_sync": round(t_sync * 1e3, 1),
    }), flush=True)

    # serving window WITH a vacuum mid-window (segment 1 this time)
    idx.delete_all(list(range(seg, seg + 150_000)))
    time.sleep(1.0)
    stop = [False]
    counts = [0] * 8

    def client(i):
        done = 0
        while not stop[0]:
            off = (i * 512 + done) % (len(q) - 512)
            uniq = np.float32(i * 1_000_003 + done) * np.float32(1e-7)
            idx.query_batch_arrays(q[off:off + 512] + uniq, k, params)
            done += 512
            counts[i] += 512

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    time.sleep(3.0)
    base, t_base = sum(counts), time.perf_counter()
    time.sleep(2.0)
    pre, t_pre = sum(counts), time.perf_counter()
    t0 = time.perf_counter()
    removed = idx.maintenance.vacuum_segment(1, min_ratio=0.05)
    t_vac = time.perf_counter() - t0
    mid, t_mid = sum(counts), time.perf_counter()
    time.sleep(3.0)
    post, t_post = sum(counts), time.perf_counter()
    stop[0] = True
    for t in threads:
        t.join()
    print(json.dumps({
        "metric": "serving_around_vacuum",
        "qps_before": round((pre - base) / (t_pre - t_base), 1),
        "vacuum_wall_s": round(t_vac, 2),
        "qps_during": round((mid - pre) / max(1e-9, t_mid - t_pre), 1),
        "qps_after": round((post - mid) / (t_post - t_mid), 1),
        "removed": removed,
    }), flush=True)
    idx.close()


if __name__ == "__main__":
    main()
