"""Serving-host diagnosis (r4, VERDICT #2/#6): where does a 512-batch's
wall time go at sift100k-exact, and how much does QPS swing WITHIN one
session vs across sessions?

Emits JSON lines:
  - rtt_ms: raw axon tunnel round-trip (tiny op + fetch, median of 50)
  - window_i: 8 consecutive 4 s serving windows (8 pipelined clients,
    query_batch_arrays) — the within-session variance band
  - single_client_batch_ms: synchronous per-batch wall (RTT + host + chip)
  - profile_top: top host functions by tottime from one profiled window

Run: python -u benchmarks/probe_serving_host.py
"""

import cProfile
import io
import json
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import vectorsearch_tpu as vs
    from vectorsearch_tpu.core.persist import MemoryStorage

    rng = np.random.default_rng(42)
    n, d, k = 100_000, 128, 10
    centers = rng.normal(size=(512, d)).astype(np.float32) * 4
    x = centers[rng.integers(0, 512, n)] + rng.normal(size=(n, d)).astype(
        np.float32
    )
    idx = vs.VectorIndex.create_or_open(vs.VectorIndexConfig(
        storage=MemoryStorage(), name="probe", dimension=d,
        max_segment_size=n, sealed_search_mode="exact",
        pq_build_mode="skip_for_exact", graph_build_mode="skip_for_flat",
        local_worker_threads=1,
    ))
    idx.add_all(x)
    idx.await_indexing_complete()
    q = centers[rng.integers(0, 512, 512 * 16)] + rng.normal(
        size=(512 * 16, d)
    ).astype(np.float32)

    # raw tunnel RTT: tiny dependent op + item fetch
    tiny = jax.jit(lambda a: jnp.sum(a) * 1e-20)
    buf = jnp.arange(128, dtype=jnp.float32)
    float(tiny(buf))
    rtts = []
    for _ in range(50):
        t0 = time.perf_counter()
        float(tiny(buf + rtts[-1] if rtts else buf))
        rtts.append((time.perf_counter() - t0) * 1e3)
    print(json.dumps({"metric": "rtt_ms",
                      "median": round(float(np.median(rtts)), 2),
                      "p90": round(float(np.percentile(rtts, 90)), 2)}),
          flush=True)

    idx.query_batch_arrays(q[:512], k)  # warm compile

    def window(seconds=4.0, in_flight=8):
        import threading

        stop = [False]
        counts = [0] * in_flight

        def client(i):
            done = 0
            while not stop[0]:
                off = (i * 512 + done) % (len(q) - 512)
                # per-call-unique block: the axon memoizer inflates windows
                # repeating identical calls (CLAUDE.md r5 trap) — the r4
                # 25.7-41.5k "session band" was measured WITHOUT this
                uniq = np.float32(i * 1_000_003 + done) * np.float32(1e-7)
                idx.query_batch_arrays(q[off:off + 512] + uniq, k)
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

    window(2.0)  # discard first (first-loop slowness, CLAUDE.md)
    vals = [round(window(), 1) for _ in range(8)]
    print(json.dumps({"metric": "qps_windows_8x4s", "values": vals,
                      "median": round(float(np.median(vals)), 1)}),
          flush=True)

    # single synchronous client: per-batch wall
    ts = []
    for i in range(20):
        off = (i * 512) % (len(q) - 512)
        qb = q[off:off + 512] + np.float32(i) * np.float32(1e-7)  # unique
        t0 = time.perf_counter()
        idx.query_batch_arrays(qb, k)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(json.dumps({"metric": "single_client_batch_ms",
                      "median": round(float(np.median(ts)), 1)}), flush=True)

    # host CPU breakdown: profile one window
    prof = cProfile.Profile()
    prof.enable()
    qps_prof = window()
    prof.disable()
    s = io.StringIO()
    stats = pstats.Stats(prof, stream=s).sort_stats("tottime")
    stats.print_stats(18)
    lines = [ln for ln in s.getvalue().splitlines() if ln.strip()][4:24]
    print(json.dumps({"metric": "profiled_window_qps",
                      "value": round(qps_prof, 1)}), flush=True)
    for ln in lines:
        print("PROF", ln, flush=True)
    idx.close()


if __name__ == "__main__":
    main()
