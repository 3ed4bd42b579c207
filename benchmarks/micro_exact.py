"""Exact-path stage profiler at the serving shape (Q=512, N=1M): separates
the fused scan kernel, the stage-2 top-k, and the exact re-rank so the
headline bench's device time is attributable (ROADMAP r3: ~13 ms/batch
device-side vs a ~1.3 ms scan roofline — find the gap).

Run on the chip: python benchmarks/micro_exact.py  [VSTPU_ME_N rows]
Measurement discipline per CLAUDE.md: per-program warmup + median over
reps, interleaved variants.

r4 PROTOCOL CAVEAT: timings below rely on block_until_ready and/or
repeated identical-args calls, both shown unreliable through the axon
runtime in r4 (CLAUDE.md measurement trap; some programs return without
executing). Numbers from this harness were historically consistent for
FULL composed paths, but cross-check anything load-bearing with the
fetch-forced dependency-chain protocol (benchmarks/probe_exact_v3.py).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_median(fn, reps=12, discard=3):
    import jax

    jax.block_until_ready(fn())  # compile + first-exec
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts[discard:]))


def main():
    import jax
    import jax.numpy as jnp

    from vectorsearch_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    from vectorsearch_tpu.ops.pallas import exact as pe
    from vectorsearch_tpu.ops import traversal as traversal_ops

    rng = np.random.default_rng(0)
    n = int(os.environ.get("VSTPU_ME_N", 1_000_000))
    d, qn, k, ef = 128, 512, 10, 32
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(qn, d)).astype(np.float32))
    valid = jnp.ones(n, bool)
    out = []

    # stage 1 kernel alone, tile sweep (interleaved: one rep each, repeated)
    tiles = [512, 1024, 2048]
    fns = {}
    for t in tiles:
        try:
            fns[t] = (lambda t=t: pe.exact_bin_pool(q, x, valid, tile_n=t))
            jax.block_until_ready(fns[t]())
        except Exception as e:
            print(json.dumps({"metric": f"bin_pool_tile{t}", "error": repr(e)[:120]}))
            fns.pop(t, None)
    times = {t: [] for t in fns}
    for rep in range(10):
        for t in fns:
            t0 = time.perf_counter()
            jax.block_until_ready(fns[t]())
            times[t].append(time.perf_counter() - t0)
    for t in fns:
        out.append({"metric": f"bin_pool_q{qn}_n{n}_tile{t}",
                    "value": round(float(np.median(times[t][2:])) * 1e3, 2),
                    "unit": "ms"})

    # stage 1 + stage 2 (the full candidate pool)
    sec = timed_median(lambda: pe.exact_pool_topk_pallas(
        q, x, valid, ef_buf=ef))
    out.append({"metric": f"pool_topk_q{qn}_n{n}_ef{ef}",
                "value": round(sec * 1e3, 2), "unit": "ms"})

    # re-rank alone on a fixed candidate set (gather [Q, ef] rows + matmul)
    cand = pe.exact_pool_topk_pallas(q, x, valid, ef_buf=ef)
    cand = jax.block_until_ready(cand)
    sec = timed_median(lambda: traversal_ops.exact_rerank(
        q, x, valid, cand, k, "L2"))
    out.append({"metric": f"rerank_q{qn}_n{n}_ef{ef}_k{k}",
                "value": round(sec * 1e3, 2), "unit": "ms"})

    # pool + rerank fused in one jit (what the query path dispatches)
    @jax.jit
    def full(q, x, valid):
        c = pe.exact_pool_topk_pallas(q, x, valid, ef_buf=ef)
        return traversal_ops.exact_rerank(q, x, valid, c, k, "L2")

    sec = timed_median(lambda: full(q, x, valid))
    out.append({"metric": f"full_exact_q{qn}_n{n}",
                "value": round(sec * 1e3, 2), "unit": "ms"})

    for r in out:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
