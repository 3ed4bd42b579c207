"""Deep10M churn attribution probe (r5, VERDICT r4 #7): decompose the
churn-vs-idle serving gap (idle ~13.8k QPS vs churn 4.5k median with a
2.8-7.9k band) into its components by running the SAME serving window
under ablated writer workloads, with per-window mutation counts and
vacuum/compaction counter deltas so low windows are attributable to the
maintenance phase actually running inside them.

Phases (all on one ingested 10M x 96 index, windows 5 s, 8 clients,
per-call-unique query blocks per CLAUDE.md memoizer trap):
  idle          — no writer
  adds_only     — writer add_all(2000)/loop (appends + background sync puts)
  dels_nomaint  — writer delete_all(2000)/loop, vacuum/compaction gated OFF
                  (flag puts only, no maintenance device work)
  full_nomaint  — adds+deletes, maintenance OFF
  full          — production churn (adds+deletes+vacuum+compaction)

Run: python -u benchmarks/probe_churn_attrib.py   [VSTPU_DEEP_N rows]
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
    from vectorsearch_tpu.utils.metrics import get_registry

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
        storage=MemoryStorage(), name="attrib", dimension=d, metric="L2",
        max_segment_size=seg, pq_m=16, pq_k=256, graph_degree=32,
        graph_build_breadth=64, local_worker_threads=1,
        local_maintenance_worker_threads=1,
        sealed_search_mode="exact", graph_build_mode="skip_for_flat",
        pq_build_mode="skip_for_exact",
        vacuum_min_deleted_ratio=0.1, vacuum_cooldown_s=5.0,
    ))
    t0 = time.time()
    gids = idx.add_all(x)
    idx.await_indexing_complete(timeout=7200)
    print(json.dumps({"metric": "ingest_s", "value": round(time.time() - t0, 1)}),
          flush=True)

    params = SearchParams(ef_search=150, beam_width=128, max_iters=6,
                          max_explore=150, mode=Mode.BEST_FIRST)
    q = centers[rng.integers(0, 4096, 512 * 8)] + 0.18 * rng.normal(
        size=(512 * 8, d)).astype(np.float32)
    q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
    # warm every churn-phase shape (CLAUDE.md: an empty ACTIVE is skipped
    # from dispatch; its brute program must not compile mid-window)
    idx.add_all(x[:1])
    idx.delete_all([gids[300]])
    idx.query_batch_arrays(q[:512], k, params)
    idx.query_batch_arrays(q[:512], k, params)

    m = get_registry()
    mutations = [0]
    stop = [False]
    next_del = [n // 2]

    def writer(adds=True, dels=True):
        wrng = np.random.default_rng(7)
        while not stop[0]:
            if adds:
                fresh = centers[wrng.integers(0, 4096, 2000)] + 0.18 * (
                    wrng.normal(size=(2000, d)).astype(np.float32))
                idx.add_all(fresh)
                mutations[0] += 2000
            if dels:
                idx.delete_all(list(range(next_del[0], next_del[0] + 2000)))
                next_del[0] += 2000
                mutations[0] += 2000
            time.sleep(0.05)

    def phase(name, adds=None, dels=None, windows=3, seconds=5.0,
              in_flight=8):
        stop[0] = False
        wt = None
        if adds is not None:
            wt = threading.Thread(target=writer, args=(adds, dels),
                                  daemon=True)
            wt.start()
            time.sleep(1.0)
        counts = [0] * in_flight
        run = [True]

        def client(i):
            done = 0
            while run[0]:
                off = (i * 512 + done) % (len(q) - 512)
                uniq = np.float32(i * 1_000_003 + done) * np.float32(1e-7)
                idx.query_batch_arrays(q[off:off + 512] + uniq, k, params)
                done += 512
                counts[i] += 512

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(in_flight)]
        for t in threads:
            t.start()
        time.sleep(2.0)  # warm-in (first window of a fresh loop reads slow)
        rows = []
        last, t_last = sum(counts), time.perf_counter()
        mu_last = mutations[0]
        vac_last = m.counter_value("vectorsearch.vacuum.run")
        comp_last = m.counter_value("vectorsearch.compaction.run")
        for _ in range(windows):
            time.sleep(seconds)
            now, t_now = sum(counts), time.perf_counter()
            mu_now = mutations[0]
            vac = m.counter_value("vectorsearch.vacuum.run")
            comp = m.counter_value("vectorsearch.compaction.run")
            rows.append({
                "qps": round((now - last) / (t_now - t_last), 1),
                "mut": mu_now - mu_last,
                "vac": int(vac - vac_last),
                "comp": int(comp - comp_last),
            })
            last, t_last, mu_last = now, t_now, mu_now
            vac_last, comp_last = vac, comp
        run[0] = False
        for t in threads:
            t.join()
        stop[0] = True
        if wt is not None:
            wt.join()
        med = float(np.median([r["qps"] for r in rows]))
        print(json.dumps({"phase": name, "median_qps": round(med, 1),
                          "windows": rows,
                          "total_mutations": mutations[0]}), flush=True)
        return med

    eff = idx.config.effective
    orig_ratio = eff.vacuum_min_deleted_ratio
    orig_auto = eff.auto_find_compaction_candidates

    phase("idle", adds=None)
    phase("adds_only", adds=True, dels=False)
    # gate maintenance OFF for the next two phases
    object.__setattr__(eff, "vacuum_min_deleted_ratio", 1.1)
    object.__setattr__(eff, "auto_find_compaction_candidates", False)
    phase("dels_nomaint", adds=False, dels=True)
    phase("full_nomaint", adds=True, dels=True)
    # production maintenance back on
    object.__setattr__(eff, "vacuum_min_deleted_ratio", orig_ratio)
    object.__setattr__(eff, "auto_find_compaction_candidates", orig_auto)
    phase("full", adds=True, dels=True, windows=5)
    idx.close()


if __name__ == "__main__":
    main()
