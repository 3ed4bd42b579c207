"""Deep10M IDLE serving probe (r4): what bounds the 10M-row exact path
when NOTHING mutates? Separates the churn cost (writer contention,
per-mutation syncs) from the dispatch/merge cost that remains at 2.9k QPS
under churn (bench deep10m). Reports: idle window QPS (8 clients), single
synchronous batch wall, and a fetch-forced chained device-time estimate of
the full per-batch dispatch set.

Run: python -u benchmarks/probe_deep_idle.py  [VSTPU_DEEP_N rows]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import vectorsearch_tpu as vs
    from vectorsearch_tpu.core.index import VectorIndex
    from vectorsearch_tpu.core.persist import MemoryStorage
    from vectorsearch_tpu.params import Mode, SearchParams

    rng = np.random.default_rng(42)
    n = int(os.environ.get("VSTPU_DEEP_N", 10_000_000))
    d, k = 96, 10
    seg = max(1000, n // 10)
    centers = rng.normal(size=(4096, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = np.empty((n, d), np.float32)
    for off in range(0, n, 1_000_000):
        hi = min(off + 1_000_000, n)
        c = centers[rng.integers(0, 4096, hi - off)]
        x[off:hi] = c + 0.18 * rng.normal(size=(hi - off, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    idx = VectorIndex.create_or_open(vs.VectorIndexConfig(
        storage=MemoryStorage(), name="deepidle", dimension=d, metric="L2",
        max_segment_size=seg, pq_m=16, pq_k=256, graph_degree=32,
        graph_build_breadth=64, local_worker_threads=1,
        sealed_search_mode="exact", graph_build_mode="skip_for_flat",
        pq_build_mode="skip_for_exact",
    ))
    t0 = time.time()
    idx.add_all(x)
    idx.await_indexing_complete(timeout=7200)
    print(json.dumps({"metric": "ingest_s", "value": round(time.time() - t0, 1)}),
          flush=True)

    q = centers[rng.integers(0, 4096, 512 * 8)] + 0.18 * rng.normal(
        size=(512 * 8, d)).astype(np.float32)
    q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
    params = SearchParams(ef_search=150, beam_width=128, max_iters=6,
                          max_explore=150, mode=Mode.BEST_FIRST)
    idx.query_batch_arrays(q[:512], k, params)  # warm
    # single synchronous client
    ts = []
    for i in range(12):
        off = (i * 512) % (len(q) - 512)
        t0 = time.perf_counter()
        idx.query_batch_arrays(q[off:off + 512], k, params)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(json.dumps({"metric": "single_batch_ms",
                      "median": round(float(np.median(ts)), 1),
                      "all": [round(t, 1) for t in ts]}), flush=True)

    # 8-client idle windows
    import threading

    def window(seconds=6.0, in_flight=8):
        stop = [False]
        counts = [0] * in_flight

        def client(i):
            done = 0
            while not stop[0]:
                off = (i * 512 + done) % (len(q) - 512)
                # per-call-unique block: the axon runtime memoizes repeated
                # identical executions (CLAUDE.md) — cycling 7 slices would
                # let memoizer hits inflate the window
                uniq = np.float32(i * 1_000_003 + done) * np.float32(1e-7)
                idx.query_batch_arrays(q[off:off + 512] + uniq, k, params)
                done += 512
                counts[i] += 512

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(in_flight)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        time.sleep(seconds)
        stop[0] = True
        for t in threads:
            t.join()
        return sum(counts) / (time.perf_counter() - t0)

    window(3.0)
    vals = [round(window(), 1) for _ in range(4)]
    print(json.dumps({"metric": "idle_qps_windows", "values": vals,
                      "median": round(float(np.median(vals)), 1)}), flush=True)

    # r5: the chained device time for the full 10M dispatch set is ~26 ms
    # (probe_deep_fold: 8M scan + 2M scan + merge) yet idle serves
    # 57 ms/batch — locate the gap: (a) more in-flight clients to overlap
    # more tunnel round-trips, (b) DEVICE-RESIDENT query batches (kills the
    # per-batch 196 KB host->device put).
    vals16 = [round(window(in_flight=16), 1) for _ in range(3)]
    print(json.dumps({"metric": "idle_qps_16clients", "values": vals16,
                      "median": round(float(np.median(vals16)), 1)}),
          flush=True)

    import jax.numpy as jnp
    qdev = [jnp.asarray(q[off:off + 512]) for off in range(0, 512 * 8, 512)]
    import jax
    jax.block_until_ready(qdev)

    def window_dev(seconds=6.0, in_flight=8):
        stop = [False]
        counts = [0] * in_flight

        def client(i):
            done = 0
            while not stop[0]:
                idx.query_batch_arrays(qdev[(i + done) % len(qdev)], k, params)
                done += 1
                counts[i] += 512

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(in_flight)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        time.sleep(seconds)
        stop[0] = True
        for t in threads:
            t.join()
        return sum(counts) / (time.perf_counter() - t0)

    window_dev(3.0)
    valsd = [round(window_dev(), 1) for _ in range(3)]
    print(json.dumps({"metric": "idle_qps_device_resident_q",
                      "values": valsd,
                      "median": round(float(np.median(valsd)), 1)}),
          flush=True)
    idx.close()


if __name__ == "__main__":
    main()
