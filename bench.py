"""Benchmark harness — prints ONE JSON line {metric, value, unit, vs_baseline}.

Default workload (VSTPU_BENCH=sift1m): the BASELINE.json north-star shape —
1M vectors dim=128 as 10 SEALED 100k segments, k=10, batched queries through
the full VectorIndex API. Default sealed mode is "exact" (raw-vector MXU
scan): the round-3 interleaved A/B (benchmarks/ab_sift1m.py) measured exact
at 37.1k QPS @ recall 0.995 / 5 s build vs flat (PQ/ADC) at 8.9k QPS @ 0.994
/ 110 s build on this workload — and the r4 deep10m capture (exact 2,902
QPS / 61 s build vs flat 1,226 / 381 s at 10M rows) makes exact the
measured winner at every HBM-resident scale probed; flat remains the
config default because PQ is what scales PAST HBM (~25M+ rows at d=128). Clustered data
(Gaussian clusters) stands in for SIFT1M structure since the real dataset
can't be downloaded here (zero egress). VSTPU_BENCH=sift100k runs the
single-segment 100k variant.

VSTPU_BENCH=ref reproduces the reference's JMH E2E workload instead
(src/jmh/.../VectorIndexSearchBenchmark.java:29-132: 1100 vectors dim=8,
maxSegmentSize=500 => 2 SEALED + 1 ACTIVE segments, k=10).

The reference publishes no numbers and no JVM exists on this host, so a
Java-reference denominator cannot be measured (BASELINE.md). vs_baseline is
therefore the ratio against THIS project's prior-round recorded number for
the same workload (BENCH_r03 / ROADMAP.md tables) — a real measured
comparator tracking round-over-round progress — or null for workloads with
no recorded prior.
"""

import json
import os
import statistics
import time

import numpy as np

# Prior-round recorded QPS per workload (BENCH_r04.json / ROADMAP.md r4
# table). The denominator for vs_baseline: measured on this hardware by the
# round-4 driver/session runs — NOT an estimate of the never-run Java
# reference. r4's single-window artifacts ride the pinned 25.7-41.5k
# tunnel/session band (benchmarks/probe_serving_host.py); from r5 on the
# bench itself reports a median of >=5 consecutive windows so the recorded
# numbers stop being single samples of that band.
PRIOR_RECORDED = {
    "sift1m": 32530.6,   # BENCH_r04.json (single window; band 26-43k)
    "sift100k": 41468.0,  # ROADMAP r4 table (single window)
    "ref": 66735.0,       # ROADMAP r4 (reference JMH shape, this chip)
    "glove": 24006.0,     # ROADMAP r4 table
    "deep10m": 6081.0,    # ROADMAP r4 (exact-mode churn, 1.16M mutations)
}


def vs_prior(workload: str, qps: float):
    prior = PRIOR_RECORDED.get(workload)
    return None if not prior else round(qps / prior, 2)

# PQ operating point for the sift benches. 16x256 is the reference's default
# profile; 64x16 is the measured TPU sweet spot (smaller one-hot width per
# subspace -> 2.5x faster Pallas scan AND higher recall at the same 128-dim
# corpus; see ROADMAP.md "PQ operating point").
PQ_M = int(os.environ.get("VSTPU_PQ_M", "16"))
PQ_K = int(os.environ.get("VSTPU_PQ_K", "256"))
# Sealed-search mode for the sift benches: "exact" (direct raw-vector MXU
# scan — the measured winner at these corpus sizes, module docstring) or
# "flat" (PQ/ADC scan, the library's config default).
SEALED_MODE = os.environ.get("VSTPU_SEALED_MODE", "exact")
# In exact mode, PQ+graph builds at seal are skipped by default
# (pq_build_mode="skip_for_exact"); VSTPU_PQ_BUILD=always keeps them.
PQ_BUILD = (
    "skip_for_exact"
    if os.environ.get("VSTPU_PQ_BUILD", "skip") == "skip"
    and SEALED_MODE == "exact"
    else "always"
)


def build_index(x, d, seg_size, pq_m, pq_k, degree, breadth):
    import vectorsearch_tpu as vs
    from vectorsearch_tpu.core.index import VectorIndex
    from vectorsearch_tpu.core.persist import MemoryStorage

    idx = VectorIndex.create_or_open(
        vs.VectorIndexConfig(
            storage=MemoryStorage(), name="bench", dimension=d, metric="L2",
            max_segment_size=seg_size, pq_m=pq_m, pq_k=pq_k, graph_degree=degree,
            graph_build_breadth=breadth, graph_alpha=1.2,
            sealed_search_mode=SEALED_MODE,
            graph_build_mode=(
                "skip_for_flat" if PQ_BUILD == "skip_for_exact" else "always"
            ),
            pq_build_mode=PQ_BUILD,
        )
    )
    gids = idx.add_all(x)
    while idx.build_queue.has_visible_unclaimed_tasks():
        c = idx.build_queue.await_and_claim(timeout=1)
        if c is None:
            break
        idx.build_service.build(c.payload.seg_id)
        c.complete()
    return idx, gids


def measure_qps(idx, queries, k, batch, seconds=4.0, params=None, in_flight=8,
                arrays=True, windows=6):
    """Serving throughput as a MEDIAN of consecutive measurement windows.

    `in_flight` concurrent clients keep the chip busy (device compute
    serializes; host merge and device->host fetch round-trips overlap — a
    single synchronous client measures tunnel latency, not chip throughput).
    Measured through query_batch_arrays (gids/scores/distances as numpy
    arrays — the TPU-native serving API): the SearchResult object path costs
    ~8 ms of GIL-serialized Python per 512-query batch, which caps ANY number
    of clients at ~64k QPS regardless of the chip. Pass arrays=False to
    measure the object API instead.

    Windowing (r5, VERDICT r4 #1): identical back-to-back windows in one
    quiet process span 25.7-41.5k QPS on this host — axon tunnel/session
    variance (benchmarks/probe_serving_host.py). A single window is therefore
    noise-dominated: a real 17% regression would be indistinguishable from
    the band. The clients run continuously; counts are sampled at `windows`
    consecutive window boundaries of `seconds` each, the FIRST window is
    discarded (first timed loop of a fresh program reads 3-10x slow even
    after warmup, CLAUDE.md), and the result is (median, lo, hi) over the
    remaining windows.

    Every call's query block is perturbed by a fresh per-call scalar: the
    axon runtime MEMOIZES repeated identical executions (CLAUDE.md), and a
    window cycling a handful of slices repeats each dozens of times — the
    memoizer hits inflate QPS by a program-structure-dependent amount
    (measured in r5: two serving variants read 28k vs 21k on repeated
    slices but 35k vs 34k on unique ones). The ~0.15 ms numpy add per call
    is real host work a real client would also do to build its batch."""
    import threading

    call = idx.query_batch_arrays if arrays else idx.query_batch
    call(queries[:batch], k, params)  # compile warmup
    # the first query schedules the background sync-ladder warm (~15-25 s
    # of remote compiles); let it finish before the measured windows
    idx.wait_sync_ladder()
    stop = [False]
    counts = [0] * in_flight

    def client(i):
        done = 0
        while not stop[0]:
            off = (i * batch + done) % (len(queries) - batch)
            uniq = np.float32(i * 1_000_003 + done) * np.float32(1e-7)
            call(queries[off : off + batch] + uniq, k, params)
            done += batch
            counts[i] += batch

    threads = [threading.Thread(target=client, args=(i,)) for i in range(in_flight)]
    for t in threads:
        t.start()
    samples = []
    last, t_last = 0, time.perf_counter()
    for _ in range(max(2, windows)):
        time.sleep(seconds)
        now, t_now = sum(counts), time.perf_counter()
        samples.append((now - last) / (t_now - t_last))
        last, t_last = now, t_now
    stop[0] = True
    for t in threads:
        t.join()
    meas = samples[1:]  # discard the first window (warm-in)
    return statistics.median(meas), min(meas), max(meas)


def bench_sift100k():
    rng = np.random.default_rng(42)
    n, d, k = 100_000, 128, 10
    centers = rng.normal(size=(512, d)).astype(np.float32) * 4
    x = centers[rng.integers(0, 512, n)] + rng.normal(size=(n, d)).astype(np.float32)

    idx, gids = build_index(x, d, seg_size=n, pq_m=PQ_M, pq_k=PQ_K, degree=32,
                            breadth=64)  # first build compiles the kernels
    idx.close()
    t_build0 = time.time()  # warm build: what production sealing costs
    idx, gids = build_index(x, d, seg_size=n, pq_m=PQ_M, pq_k=PQ_K, degree=32,
                            breadth=64)
    build_s = time.time() - t_build0

    # recall@10 vs brute-force ground truth on 128 held-out queries
    q = centers[rng.integers(0, 512, 256)] + rng.normal(size=(256, d)).astype(
        np.float32
    )
    from vectorsearch_tpu.params import Mode, SearchParams

    # explicit per-call tuning (third config tier): a wide beam converges in
    # ~1 frontier step on TPU (one straggler query otherwise keeps the whole
    # batch looping); ef=150/beam=128 reaches recall ~0.99 on this corpus
    params = SearchParams(ef_search=150, beam_width=128, max_iters=6,
                          max_explore=150, mode=Mode.BEST_FIRST)
    res = idx.query_batch(q[:128], k, params)
    hits = 0
    for i, r in enumerate(res):
        truth = set(np.argsort(np.linalg.norm(x - q[i], axis=1))[:k].tolist())
        hits += len(truth & {s.gid for s in r})
    recall = hits / (128 * k)

    queries = np.concatenate([q] * 16)
    qps, lo, hi = measure_qps(idx, queries, k, batch=512, params=params)
    idx.close()
    return {
        "metric": f"sift100k_qps_per_chip_arrays_k10_recall{recall:.2f}_build{build_s:.0f}s",
        "value": round(qps, 1),
        "unit": "queries/s",
        "band": [round(lo, 1), round(hi, 1)],
        "vs_baseline": vs_prior("sift100k", qps),
    }


def bench_sift1m():
    """The full north-star shape: 1M vectors as 10 SEALED 100k segments."""
    rng = np.random.default_rng(42)
    n, d, k = 1_000_000, 128, 10
    centers = rng.normal(size=(2048, d)).astype(np.float32) * 4
    x = centers[rng.integers(0, 2048, n)] + rng.normal(size=(n, d)).astype(np.float32)
    t0 = time.time()
    idx, gids = build_index(x, d, seg_size=100_000, pq_m=PQ_M, pq_k=PQ_K,
                            degree=32, breadth=64)
    build_s = time.time() - t0
    from vectorsearch_tpu.params import Mode, SearchParams

    params = SearchParams(ef_search=150, beam_width=128, max_iters=6,
                          max_explore=150, mode=Mode.BEST_FIRST)
    q = centers[rng.integers(0, 2048, 512)] + rng.normal(size=(512, d)).astype(
        np.float32
    )
    res = idx.query_batch(q[:128], k, params)
    hits = 0
    for i, r in enumerate(res):
        truth = set(np.argsort(np.linalg.norm(x - q[i], axis=1))[:k].tolist())
        hits += len(truth & {s.gid for s in r})
    recall = hits / (128 * k)
    qps, lo, hi = measure_qps(idx, np.concatenate([q] * 8), k, batch=512,
                              params=params)
    idx.close()
    return {
        "metric": f"sift1m_qps_per_chip_arrays_k10_recall{recall:.2f}_build{build_s:.0f}s",
        "value": round(qps, 1),
        "unit": "queries/s",
        "band": [round(lo, 1), round(hi, 1)],
        "vs_baseline": vs_prior("sift1m", qps),
    }


def bench_ref():
    rng = np.random.default_rng(42)
    n, d, k = 1100, 8, 10
    x = rng.normal(size=(n, d)).astype(np.float32)
    idx, gids = build_index(x, d, seg_size=500, pq_m=4, pq_k=16, degree=16,
                            breadth=64)
    probe = idx.query_batch(x[:100], k)
    recall = sum(
        1 for i, r in enumerate(probe) if gids[i] in [s.gid for s in r]
    ) / 100
    assert recall >= 0.9, f"self-recall gate failed: {recall}"
    queries = rng.normal(size=(8192, d)).astype(np.float32)
    qps, lo, hi = measure_qps(idx, queries, k, batch=512)
    idx.close()
    return {
        "metric": "e2e_best_first_qps_1100x8_k10_arrays",
        "value": round(qps, 1),
        "unit": "queries/s",
        "band": [round(lo, 1), round(hi, 1)],
        "vs_baseline": vs_prior("ref", qps),
    }


def bench_glove():
    """BASELINE.json bench config #4: online inserts with strict-cap rotation
    and MIXED brute-force/sealed search on a GloVe-1.2M-shaped cosine corpus
    (1.2M x 100, cosine metric). QPS is measured while the tail of the corpus
    is still being inserted/sealed — every batch touches both the brute-force
    ACTIVE segment and the sealed ones, the reference's mixed dispatch
    (fdb/FdbVectorIndex.java:640-668)."""
    import threading

    import vectorsearch_tpu as vs
    from vectorsearch_tpu.core.index import VectorIndex
    from vectorsearch_tpu.core.persist import MemoryStorage
    from vectorsearch_tpu.params import Mode, SearchParams

    rng = np.random.default_rng(42)
    # VSTPU_GLOVE_N: scale override for CPU smoke runs of this harness
    n = int(os.environ.get("VSTPU_GLOVE_N", 1_200_000))
    d, k = 100, 10
    seg = max(1000, n // 12)
    preload = n - seg
    n_centers = max(64, n // 600)
    centers = rng.normal(size=(n_centers, d)).astype(np.float32)
    x = centers[rng.integers(0, n_centers, n)] + 0.25 * rng.normal(
        size=(n, d)
    ).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    idx = VectorIndex.create_or_open(
        vs.VectorIndexConfig(
            storage=MemoryStorage(), name="glove", dimension=d, metric="COSINE",
            max_segment_size=seg, pq_m=20, pq_k=256, graph_degree=32,
            graph_build_breadth=64, local_worker_threads=1,
            graph_build_mode="skip_for_flat",
            sealed_search_mode=SEALED_MODE,  # exact (default) or flat
            pq_build_mode=PQ_BUILD,
        )
    )
    # Pre-load all but one segment's worth (sealed via the background
    # worker); the rest feeds the live-insert window so the mixed
    # brute+sealed dispatch is always hot.
    t0 = time.time()
    gids = idx.add_all(x[:preload])
    idx.await_indexing_complete(timeout=3600)
    build_s = time.time() - t0

    params = SearchParams(ef_search=150, beam_width=128, max_iters=6,
                          max_explore=150, mode=Mode.BEST_FIRST)
    q = x[rng.integers(0, preload, 512)] + 0.05 * rng.normal(
        size=(512, d)
    ).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    idx.query_batch(q, k, params)  # warm sealed-only shape
    idx.wait_sync_ladder()  # ~15-25 s of background compiles must not land
    #                         inside the measured windows

    stop = [False]

    def writer():
        off = preload
        step = max(200, seg // 50)
        while not stop[0] and off < n:
            idx.add_all(x[off : off + step])
            off += step
            time.sleep(0.01)

    wt = threading.Thread(target=writer, daemon=True)
    wt.start()
    time.sleep(1.0)  # let the ACTIVE segment fill so the mix is real
    qps, lo, hi = measure_qps(idx, np.concatenate([q] * 8), k, batch=512,
                              params=params, in_flight=8)
    stop[0] = True
    wt.join()

    # recall@10 vs brute-force cosine ground truth on the sealed prefix
    res = idx.query_batch(q[:128], k, params)
    hits = 0
    for i, r in enumerate(res):
        sims = x @ q[i]
        truth = {int(t) for t in np.argsort(-sims)[:k] if t < len(gids)}
        got = {s.gid for s in r}
        hits += len({gids[t] for t in truth} & got)
    recall = hits / (128 * k)
    idx.close()
    return {
        "metric": (
            f"glove{n}_cosine_mixed_qps_arrays_k10_recall{recall:.2f}"
            f"_build{build_s:.0f}s"
        ),
        "value": round(qps, 1),
        "unit": "queries/s",
        "band": [round(lo, 1), round(hi, 1)],
        "vs_baseline": vs_prior("glove", qps),
    }


def bench_deep10m():
    """BASELINE.json bench config #5: maintenance under churn at Deep10M
    scale — 10M x 96 (Deep1B's shape), tombstone deletes, cooldown-aware
    vacuum, compaction, with recall stability checked after the churn
    window. Heavy (builds ~10 1M-row sealed segments first); opt-in via
    VSTPU_BENCH=deep10m; VSTPU_DEEP_N scales it down for smoke runs."""
    import threading

    import vectorsearch_tpu as vs
    from vectorsearch_tpu.core.index import VectorIndex
    from vectorsearch_tpu.core.persist import MemoryStorage
    from vectorsearch_tpu.params import Mode, SearchParams

    rng = np.random.default_rng(42)
    n = int(os.environ.get("VSTPU_DEEP_N", 10_000_000))
    d, k = 96, 10
    seg = max(1000, n // 10)
    n_centers = 4096
    centers = rng.normal(size=(n_centers, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # chunked generation keeps the transient numpy peak ~1 chunk
    x = np.empty((n, d), np.float32)
    for off in range(0, n, 1_000_000):
        hi = min(off + 1_000_000, n)
        c = centers[rng.integers(0, n_centers, hi - off)]
        x[off:hi] = c + 0.18 * rng.normal(size=(hi - off, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    idx = VectorIndex.create_or_open(
        vs.VectorIndexConfig(
            storage=MemoryStorage(), name="deep10m", dimension=d, metric="L2",
            max_segment_size=seg, pq_m=16, pq_k=256, graph_degree=32,
            graph_build_breadth=64, local_worker_threads=1,
            local_maintenance_worker_threads=1,
            sealed_search_mode=SEALED_MODE,
            graph_build_mode="skip_for_flat",
            pq_build_mode=PQ_BUILD,
            vacuum_min_deleted_ratio=0.1, vacuum_cooldown_s=5.0,
        )
    )
    t0 = time.time()
    gids = idx.add_all(x)
    idx.await_indexing_complete(timeout=7200)
    build_s = time.time() - t0

    params = SearchParams(ef_search=150, beam_width=128, max_iters=6,
                          max_explore=150, mode=Mode.BEST_FIRST)
    q = x[rng.integers(0, n, 512)] + 0.02 * rng.normal(size=(512, d)).astype(
        np.float32
    )
    # Warm EVERY serving shape the churn phase will dispatch: one row in the
    # ACTIVE segment compiles the brute program too (an empty ACTIVE is
    # skipped from dispatch, so a sealed-only warm would leave that compile
    # to land inside the measured window — minutes at this scale through
    # the axon tunnel; warm-process numbers are the real ones, CLAUDE.md),
    # and one delete warms the tombstone flag-update programs.
    idx.add_all(x[:1])
    idx.delete_all([gids[300]])  # outside the recall/leak check ranges
    t_warm = time.time()
    idx.query_batch(q, k, params)
    idx.query_batch(q, k, params)
    idx.wait_sync_ladder()
    warm_s = time.time() - t_warm

    stop = [False]
    mutations = [0]
    # PINNED offered load (r5): the writer used to run flat-out with a
    # fixed 0.05 s sleep, so every round's writer-path optimization RAISED
    # the mutation rate the serving number was measured under (r4 ~25k/s,
    # r5 unpinned ~66k/s after the chunked-sync work) — the bench compared
    # serving capacity at different offered loads. 24k mutations/s matches
    # the r4/early-r5 effective rate; override with VSTPU_CHURN_RATE.
    churn_rate = float(os.environ.get("VSTPU_CHURN_RATE", 24000.0))
    loop_budget = 4000.0 / churn_rate

    def writer():
        wrng = np.random.default_rng(7)
        next_del = n // 2
        while not stop[0]:
            t_loop = time.perf_counter()
            fresh = centers[wrng.integers(0, n_centers, 2000)] + 0.18 * (
                wrng.normal(size=(2000, d)).astype(np.float32)
            )
            idx.add_all(fresh)
            idx.delete_all(list(range(next_del, next_del + 2000)))
            next_del += 2000
            mutations[0] += 4000
            time.sleep(max(0.01, loop_budget - (time.perf_counter() - t_loop)))

    wt = threading.Thread(target=writer, daemon=True)
    wt.start()
    time.sleep(1.0)
    # 9 windows: >=1M mutations land inside the run at the pinned 24k/s
    # rate (the churn-capacity claim is "serving X QPS with >=1M live
    # mutations applied", ROADMAP r4/r5; 8 windows measured 988k)
    qps, lo, hi = measure_qps(idx, np.concatenate([q] * 4), k, batch=512,
                              seconds=5.0, windows=9, params=params,
                              in_flight=8)
    stop[0] = True
    wt.join()

    # recall stability on the stable prefix AFTER churn + deletes stay dead
    idx.await_indexing_complete(timeout=7200)
    res = idx.query_batch(x[:256], k, params)
    recall = sum(
        1 for i, r in enumerate(res) if gids[i] in [s.gid for s in r]
    ) / 256
    dead = idx.query_batch(x[n // 2 : n // 2 + 64], 20, params)
    leaked = sum(
        1 for i, r in enumerate(dead) if gids[n // 2 + i] in [s.gid for s in r]
    )
    idx.close()
    return {
        "metric": (
            f"deep{n}_churn_qps_arrays_k10_selfrecall{recall:.2f}"
            f"_leaked{leaked}_mutations{mutations[0]}"
            f"_rate{churn_rate / 1000:.0f}k_build{build_s:.0f}s"
            f"_warm{warm_s:.0f}s"
        ),
        "value": round(qps, 1),
        "unit": "queries/s",
        "band": [round(lo, 1), round(hi, 1)],
        "vs_baseline": vs_prior("deep10m", qps),
    }


def bench_churn():
    """r5: the small 200k/10s churn variant is DELETED (VERDICT r4 weak #8).
    After the r4 warm fix it read 340-584 QPS across runs — writer-rate- and
    session-dominated at that window size, i.e. acknowledged noise; a bench
    mode whose output is noise invites misreading. The churn scenario class
    (BASELINE.json workload #5) is measured by the deep10m bench, which runs
    adds+deletes+vacuum live at 10M rows over 6x5s windows and reports a
    median+band. VSTPU_BENCH=churn now runs that (VSTPU_DEEP_N still scales
    it down for smoke runs)."""
    return bench_deep10m()


def main():
    from vectorsearch_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    which = os.environ.get("VSTPU_BENCH", "sift1m")
    fn = {"sift100k": bench_sift100k, "sift1m": bench_sift1m, "ref": bench_ref,
          "churn": bench_churn, "glove": bench_glove,
          "deep10m": bench_deep10m}[which]
    print(json.dumps(fn()))


if __name__ == "__main__":
    main()
