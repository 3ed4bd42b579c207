"""Packed-vs-twoplane under REAL serving windows (r5 regression hunt):
the unified exact programs chain at ~5 ms either way, single-API-call sync
batches differ by ~5 ms — yet the 8-client bench window halves with packed
(16.6k vs 37.1k). Measure windows at in_flight 1/2/4/8 in one process
(packed selected via VSTPU_EXACT_PACKED before launch).

Run: VSTPU_EXACT_PACKED=0|1 python -u benchmarks/probe_packed_window.py
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
    n, d, k = 1_000_000, 128, 10
    centers = rng.normal(size=(2048, d)).astype(np.float32) * 4
    x = centers[rng.integers(0, 2048, n)] + rng.normal(size=(n, d)).astype(
        np.float32
    )
    idx = VectorIndex.create_or_open(vs.VectorIndexConfig(
        storage=MemoryStorage(), name="pw", dimension=d, metric="L2",
        max_segment_size=100_000, sealed_search_mode="exact",
        graph_build_mode="skip_for_flat", pq_build_mode="skip_for_exact",
    ))
    idx.add_all(x)
    while idx.build_queue.has_visible_unclaimed_tasks():
        c = idx.build_queue.await_and_claim(timeout=1)
        if c is None:
            break
        idx.build_service.build(c.payload.seg_id)
        c.complete()

    params = SearchParams(ef_search=150, beam_width=128, max_iters=6,
                          max_explore=150, mode=Mode.BEST_FIRST)
    q0 = centers[rng.integers(0, 2048, 512)] + rng.normal(
        size=(512, d)).astype(np.float32)
    queries = np.concatenate([q0] * 8)
    idx.query_batch_arrays(queries[:512], k, params)

    # VSTPU_UNIQUE_Q=1: perturb every call by a fresh scalar so NO two calls
    # in a window carry identical argument buffers — the axon runtime
    # memoizes repeated identical executions (CLAUDE.md), and a window that
    # cycles 7 slices repeats each ~23x: any memoizer hits inflate QPS, and
    # WHICH programs hit is inconsistent across program structures.
    unique_q = os.environ.get("VSTPU_UNIQUE_Q", "0") == "1"
    ctr = [0]
    ctr_lock = threading.Lock()

    def window(in_flight, seconds=4.0):
        stop = [False]
        counts = [0] * in_flight

        def client(i):
            done = 0
            while not stop[0]:
                off = (i * 512 + done) % (len(queries) - 512)
                qb = queries[off:off + 512]
                if unique_q:
                    with ctr_lock:
                        ctr[0] += 1
                        c = ctr[0]
                    qb = qb + np.float32(c) * np.float32(1e-6)
                idx.query_batch_arrays(qb, k, params)
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

    window(1, 3.0)  # warm discard
    out = {"packed_env": os.environ.get("VSTPU_EXACT_PACKED", "1"),
           "unique_q": unique_q}
    for nf in (1, 2, 4, 8):
        out[f"qps_{nf}cl"] = round(window(nf), 1)
    # repeat 8 to see drift
    out["qps_8cl_b"] = round(window(8), 1)
    print(json.dumps(out), flush=True)
    idx.close()


if __name__ == "__main__":
    main()
