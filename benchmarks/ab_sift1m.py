"""Interleaved A/B: SIFT1M sealed_search_mode flat (PQ/ADC scan) vs exact
(raw-vector MXU scan) on the real chip — the round-3 north-star evidence
(VERDICT r2 #1).

Measurement discipline (CLAUDE.md): both indexes live in ONE process; each
mode gets a compile+warm call, then the first timed window per mode is
DISCARDED and the remaining windows alternate flat/exact so drift hits both
equally. Also reports per-batch device-side latency (dependency-free loop,
block_until_ready per call) to separate chip time from serving overheads —
on this 1-core host with an ~25 ms-RTT tunnel, serving QPS is host-bound
near ~40k regardless of corpus size; batch latency shows the chip truth.

Run: python benchmarks/ab_sift1m.py  (quiet machine: nothing else running)

r4 PROTOCOL CAVEAT: timings below rely on block_until_ready and/or
repeated identical-args calls, both shown unreliable through the axon
runtime in r4 (CLAUDE.md measurement trap; some programs return without
executing). Numbers from this harness were historically consistent for
FULL composed paths, but cross-check anything load-bearing with the
fetch-forced dependency-chain protocol (benchmarks/probe_exact_v3.py).
"""

import json
import time

import numpy as np

N, D, K, SEG = 1_000_000, 128, 10, 100_000
WINDOWS = 3  # timed windows per mode (after the discarded first)
WINDOW_S = 4.0


def build(mode):
    import vectorsearch_tpu as vs
    from vectorsearch_tpu.core.index import VectorIndex
    from vectorsearch_tpu.core.persist import MemoryStorage

    idx = VectorIndex.create_or_open(
        vs.VectorIndexConfig(
            storage=MemoryStorage(), name=f"ab_{mode}", dimension=D,
            metric="L2", max_segment_size=SEG, pq_m=16, pq_k=256,
            graph_degree=32, graph_build_breadth=64,
            sealed_search_mode=mode,
            graph_build_mode="skip_for_flat",  # neither mode traverses
            pq_build_mode="skip_for_exact" if mode == "exact" else "always",
        )
    )
    return idx


def main():
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(2048, D)).astype(np.float32) * 4
    x = centers[rng.integers(0, 2048, N)] + rng.normal(size=(N, D)).astype(
        np.float32
    )
    q = centers[rng.integers(0, 2048, 512)] + rng.normal(size=(512, D)).astype(
        np.float32
    )
    from vectorsearch_tpu.params import Mode, SearchParams

    params = SearchParams(ef_search=150, beam_width=128, max_iters=6,
                          max_explore=150, mode=Mode.BEST_FIRST)

    idxs, build_s, gids = {}, {}, {}
    for mode in ("exact", "flat"):
        t0 = time.time()
        idx = build(mode)
        gids[mode] = idx.add_all(x)
        while idx.build_queue.has_visible_unclaimed_tasks():
            c = idx.build_queue.await_and_claim(timeout=1)
            if c is None:
                break
            idx.build_service.build(c.payload.seg_id)
            c.complete()
        build_s[mode] = time.time() - t0
        idxs[mode] = idx
        print(f"built {mode} in {build_s[mode]:.0f}s", flush=True)

    # recall@10 vs numpy brute force at production batch size
    recall = {}
    for mode, idx in idxs.items():
        res = idx.query_batch(q[:128], K, params)  # also compiles+warms
        hits = 0
        for i, r in enumerate(res):
            truth = {
                int(t)
                for t in np.argsort(np.linalg.norm(x - q[i], axis=1))[:K]
            }
            got = {s.gid for s in r}
            hits += len({gids[mode][t] for t in truth} & got)
        recall[mode] = hits / (128 * K)
        print(f"recall {mode}: {recall[mode]:.4f}", flush=True)

    # device-side per-batch latency: synchronous loop, discard first 3
    lat_ms = {}
    for mode, idx in idxs.items():
        idx.query_batch_arrays(q, K, params)  # warm the arrays path
        ts = []
        for it in range(13):
            qv = q + np.float32(it)  # defeat any caching, same shape
            t0 = time.perf_counter()
            idx.query_batch_arrays(qv, K, params)
            ts.append((time.perf_counter() - t0) * 1000)
        lat_ms[mode] = float(np.median(ts[3:]))
        print(f"batch512 latency {mode}: {lat_ms[mode]:.1f} ms "
              f"(all: {[round(t, 1) for t in ts]})", flush=True)

    # serving QPS: interleaved windows, first window per mode discarded
    from bench import measure_qps

    qq = np.concatenate([q] * 8)
    qps_runs = {"flat": [], "exact": []}
    for w in range(WINDOWS + 1):
        for mode in ("flat", "exact"):
            v = measure_qps(idxs[mode], qq, K, batch=512, seconds=WINDOW_S,
                            params=params)
            if w > 0:
                qps_runs[mode].append(v)
            print(f"window {w} {mode}: {v:.0f} qps", flush=True)

    out = {}
    for mode in ("flat", "exact"):
        out[mode] = {
            "qps_median": round(float(np.median(qps_runs[mode])), 1),
            "qps_all": [round(v, 1) for v in qps_runs[mode]],
            "recall_at_10": round(recall[mode], 4),
            "batch512_ms": round(lat_ms[mode], 2),
            "build_s": round(build_s[mode], 1),
        }
    print(json.dumps({"ab_sift1m": out}))


if __name__ == "__main__":
    import sys
    import pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    main()
