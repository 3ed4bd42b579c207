"""Cross-process churn probe (r4): is serving churn-immune when the writer
is a SEPARATE process?

Single-process deep10m churn serves at ~1/3 of idle QPS (2.9k vs 8.9k,
bench + probe_deep_idle): the writer's host work shares the reader's GIL.
The architecture's answer is the cluster model (parallel/cluster.py): one
writer process holds the lease and mutates; reader processes serve their
storage view and absorb mutations in batches via refresh() (the WAL doubles
as a replication log). This probe measures exactly that split on one chip:

  parent  = reader: opens the index read-only, serves 8-client windows,
            refresh() every ~0.5 s on a timer thread
  child   = writer: opens the same DiskStorage with the writer lease, runs
            continuous add/delete/vacuum batches (compaction off so reader
            segment reloads don't dominate a short probe)

Both processes dispatch to the same v5e through the axon tunnel (verified
concurrent-safe). Reports reader QPS idle vs during-churn, the writer's
applied-mutation count, and the reader's refresh lag cost.

Run: python -u benchmarks/probe_cluster_churn.py  [VSTPU_CC_N rows]
"""

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N = int(os.environ.get("VSTPU_CC_N", 2_000_000))
D, K = 96, 10
DIR = os.environ.get("VSTPU_CC_DIR", "/tmp/vscc")

WRITER = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
import numpy as np
import vectorsearch_tpu as vs
from vectorsearch_tpu.core.index import VectorIndex
from vectorsearch_tpu.core.persist import DiskStorage

n, d = {n}, {d}
rng = np.random.default_rng(7)
idx = VectorIndex.create_or_open(vs.VectorIndexConfig(
    storage=DiskStorage({dir!r}), name="cc", dimension=d, metric="L2",
    max_segment_size=max(1000, n // 10), pq_m=16, pq_k=256, graph_degree=32,
    local_worker_threads=1, local_maintenance_worker_threads=1,
    sealed_search_mode="exact", graph_build_mode="skip_for_flat",
    pq_build_mode="skip_for_exact", vacuum_min_deleted_ratio=0.1,
    vacuum_cooldown_s=5.0, auto_find_compaction_candidates=False,
))
deadline = time.monotonic() + {secs}
mutations = 0
new_gids = []
while time.monotonic() < deadline:
    batch = (rng.normal(size=(2000, d)) * 0.2).astype(np.float32)
    new_gids.extend(idx.add_all(batch))
    mutations += 2000
    if len(new_gids) > 4000:
        victims, new_gids = new_gids[:1000], new_gids[1000:]
        idx.delete_all(victims)
        mutations += 1000
    time.sleep(0.01)
idx.close()
print(json.dumps({{"metric": "writer_mutations", "value": mutations}}),
      flush=True)
"""


def main():
    import vectorsearch_tpu as vs
    from vectorsearch_tpu.core.index import VectorIndex
    from vectorsearch_tpu.core.persist import DiskStorage
    from vectorsearch_tpu.params import Mode, SearchParams

    rng = np.random.default_rng(42)
    centers = rng.normal(size=(4096, D)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    if not os.path.exists(os.path.join(DIR, "cc")):
        x = np.empty((N, D), np.float32)
        for off in range(0, N, 1_000_000):
            hi = min(off + 1_000_000, N)
            c = centers[rng.integers(0, 4096, hi - off)]
            x[off:hi] = c + 0.18 * rng.normal(size=(hi - off, D)).astype(
                np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        t0 = time.time()
        b = VectorIndex.create_or_open(vs.VectorIndexConfig(
            storage=DiskStorage(DIR), name="cc", dimension=D, metric="L2",
            max_segment_size=max(1000, N // 10), pq_m=16, pq_k=256,
            graph_degree=32, local_worker_threads=1,
            sealed_search_mode="exact", graph_build_mode="skip_for_flat",
            pq_build_mode="skip_for_exact",
        ))
        b.add_all(x)
        b.await_indexing_complete(timeout=7200)
        b.checkpoint()
        b.close()
        print(json.dumps({"metric": "build_s",
                          "value": round(time.time() - t0, 1)}), flush=True)

    reader = VectorIndex.create_or_open(vs.VectorIndexConfig(
        storage=DiskStorage(DIR), name="cc", dimension=D, metric="L2",
        max_segment_size=max(1000, N // 10), pq_m=16, pq_k=256,
        graph_degree=32, local_worker_threads=0,
        sealed_search_mode="exact", graph_build_mode="skip_for_flat",
        pq_build_mode="skip_for_exact",
    ))
    q = centers[rng.integers(0, 4096, 512 * 8)] + 0.18 * rng.normal(
        size=(512 * 8, D)).astype(np.float32)
    q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
    params = SearchParams(ef_search=150, beam_width=128, max_iters=6,
                          max_explore=150, mode=Mode.BEST_FIRST)
    reader.query_batch_arrays(q[:512], K, params)  # warm

    def window(seconds=6.0, in_flight=8):
        stop = [False]
        counts = [0] * in_flight

        def client(i):
            done = 0
            while not stop[0]:
                off = (i * 512 + done) % (len(q) - 512)
                # per-call-unique block: the axon memoizer inflates windows
                # that repeat identical calls (CLAUDE.md r5 trap)
                uniq = np.float32(i * 1_000_003 + done) * np.float32(1e-7)
                reader.query_batch_arrays(q[off:off + 512] + uniq, K, params)
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
    idle = [round(window(), 1) for _ in range(3)]
    print(json.dumps({"metric": "reader_idle_qps", "values": idle,
                      "median": round(float(np.median(idle)), 1)}),
          flush=True)

    # reader-side refresh loop (the cluster server's refresh_every analogue)
    stop_refresh = threading.Event()
    refresh_ms = []

    def refresher():
        while not stop_refresh.is_set():
            t0 = time.perf_counter()
            try:
                reader.store.refresh()
            except Exception:
                pass
            refresh_ms.append((time.perf_counter() - t0) * 1e3)
            stop_refresh.wait(0.5)

    churn_secs = 40
    wp = subprocess.Popen(
        [sys.executable, "-u", "-c",
         WRITER.format(root=ROOT, n=N, d=D, dir=DIR, secs=churn_secs)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    time.sleep(6.0)  # writer open + first mutations in flight
    rt = threading.Thread(target=refresher, daemon=True)
    rt.start()
    churn = [round(window(), 1) for _ in range(4)]
    stop_refresh.set()
    rt.join(timeout=2)
    out, _ = wp.communicate(timeout=600)
    print(json.dumps({
        "metric": "reader_churn_qps", "values": churn,
        "median": round(float(np.median(churn)), 1),
        "refresh_ms_median": round(float(np.median(refresh_ms)), 1)
        if refresh_ms else None,
    }), flush=True)
    for line in out.splitlines():
        if line.startswith("{"):
            print(line, flush=True)
    reader.close()


if __name__ == "__main__":
    main()
