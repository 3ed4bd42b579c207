"""Why does the packed kernel HALVE production sift1m serving (16.6k vs
37.1k, r5 bench A/B) when the isolated chained composition measures it
FASTER (3.28 vs 3.52 ms)? Reproduce with the REAL production program
shapes in one process: the unified exact query over the actual stack
groups (8x100k + 2x100k), packed vs two-plane, chained; plus synchronous
full-API batches.

Run: python -u benchmarks/probe_packed_prod.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(label, step, qs, k_short=4, k_long=12):
    import jax.numpy as jnp

    def run(k):
        prev = jnp.float32(0.0)
        t0 = time.perf_counter()
        for i in range(k):
            prev = step(qs[i % len(qs)], prev)
        float(prev)
        return (time.perf_counter() - t0) * 1e3

    run(2)
    ts = sorted(run(k_short) for _ in range(2))
    tl = sorted(run(k_long) for _ in range(2))
    per = (tl[0] - ts[0]) / (k_long - k_short)
    print(json.dumps({"metric": label, "ms_per_call": round(per, 2)}),
          flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp

    import vectorsearch_tpu as vs
    from vectorsearch_tpu.core.index import VectorIndex
    from vectorsearch_tpu.core.persist import MemoryStorage
    from vectorsearch_tpu.ops import traversal as tr
    from vectorsearch_tpu.ops.pallas import exact as pe
    from vectorsearch_tpu.params import Mode, SearchParams
    from vectorsearch_tpu.types import SegmentState

    rng = np.random.default_rng(42)
    n, d, k = 1_000_000, 128, 10
    centers = rng.normal(size=(2048, d)).astype(np.float32) * 4
    x = centers[rng.integers(0, 2048, n)] + rng.normal(size=(n, d)).astype(
        np.float32
    )
    idx = VectorIndex.create_or_open(vs.VectorIndexConfig(
        storage=MemoryStorage(), name="pp", dimension=d, metric="L2",
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
    q = centers[rng.integers(0, 2048, 512)] + rng.normal(
        size=(512, d)).astype(np.float32)

    # synchronous full-API batches (packed default per env)
    idx.query_batch_arrays(q, k, params)
    ts = []
    for i in range(10):
        qq = q + np.float32(i) * np.float32(1e-6)
        t0 = time.perf_counter()
        idx.query_batch_arrays(qq, k, params)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(json.dumps({
        "metric": "full_api_sync_batch_ms",
        "packed_env": os.environ.get("VSTPU_EXACT_PACKED", "1"),
        "median": round(float(np.median(ts)), 1),
        "all": [round(t, 1) for t in ts],
    }), flush=True)

    # the real stacks the production dispatch uses
    sealed = [s for s in idx.store.segments.values()
              if s.state == SegmentState.SEALED]
    assert len(sealed) == 10
    st8 = idx._stacks.sealed(sealed[:8], lean=True)
    st2 = idx._stacks.sealed(sealed[8:10], lean=True)
    qd = jnp.asarray(q)
    perturb = jax.jit(lambda qq, i: qq + i * 1e-7)
    qs = [jax.block_until_ready(perturb(qd, float(i))) for i in range(8)]

    def consume(*arrs):
        s = jnp.float32(0.0)
        for a in arrs:
            fin = jnp.where(jnp.isfinite(a.astype(jnp.float32)),
                            a.astype(jnp.float32), 0.0)
            s = s + jnp.sum(fin) * 1e-20
        return s

    def unified(packed):
        # big operands as ARGS — closures embed them as HLO constants and
        # blow the remote-compile body limit (CLAUDE.md trap)
        def f(qq, v2, al, x2, prev):
            ps, pi = pe.exact_pool_scored_pallas(
                qq + prev * 1e-32, v2, al, ef_buf=64, xn2=x2, packed=packed)
            sc, di, iv = tr.exact_finalize(qq, ps, pi, 64, "L2")
            return consume(sc, iv)
        return jax.jit(f)

    def flat(stack):
        s_count, nn, dd = stack.vectors.shape
        return (stack.vectors.reshape(s_count * nn, dd),
                stack.alive.reshape(-1), stack.xn2.reshape(-1))

    v8, a8, x8 = flat(st8)
    v2_, a2, x2_ = flat(st2)
    for packed in (False, True):
        tag = "packed" if packed else "twoplane"
        fn = unified(packed)
        chain_time(f"unified8_{tag}",
                   lambda qq, prev, fn=fn: fn(qq, v8, a8, x8, prev), qs)
        chain_time(f"unified2_{tag}",
                   lambda qq, prev, fn=fn: fn(qq, v2_, a2, x2_, prev), qs)
    idx.close()


if __name__ == "__main__":
    main()
