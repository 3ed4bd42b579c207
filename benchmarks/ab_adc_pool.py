"""A/B the flat-path candidate pool on the chip: scores scan + approx_max_k
(the r2 path) vs the fused scan+binned-pool kernel (adc_pool_pallas), at the
serving shape Q=512 over one 100k segment and at N=1M (ROADMAP #3's [Q, N]
intermediate eliminated). Chained in-jit timings per CLAUDE.md; recall of
each pool is scored against the exact ADC ranking (the pool's only job).

Run: python -u benchmarks/ab_adc_pool.py  [VSTPU_AB_N rows]

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

REPS = 8


def run_chain(label, fn, q, args, reps=REPS):
    import jax
    import jax.numpy as jnp

    def chained(q, *args):
        def body(i, acc):
            out = fn(q + acc * 1e-30, *args)
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-32

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    cj = jax.jit(chained)
    jax.block_until_ready(cj(q, *args))  # compile + first exec (discarded)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        jax.block_until_ready(cj(q, *args))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts[1:]))
    print(json.dumps({"metric": label, "value": round(med / reps * 1e3, 2),
                      "unit": "ms/iter"}), flush=True)
    return med / reps


def main():
    import jax
    import jax.numpy as jnp

    from vectorsearch_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    from vectorsearch_tpu.ops import pq as pq_ops
    from vectorsearch_tpu.ops.pallas import adc as pa

    n = int(os.environ.get("VSTPU_AB_N", 100_000))
    d, m, k, qn, ef = 128, 16, 256, 512, 128
    rng = np.random.default_rng(0)
    cb = jnp.asarray(rng.normal(size=(m, k, d // m)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, k, size=(n, m)).astype(np.uint8))
    q = jnp.asarray(rng.normal(size=(qn, d)).astype(np.float32))
    valid = jnp.ones(n, bool)
    lut0 = pq_ops.build_lut(q, cb)

    # recall of each pool vs the exact ADC top-10 (on a 4k query subsample
    # of the ADC matrix to keep the truth computation cheap)
    qs = q[:64]
    luts = pq_ops.build_lut(qs, cb)
    ref = np.asarray(pq_ops.adc_scan(luts, codes, valid))
    truth = np.argsort(ref, axis=1)[:, :10]

    def pool_recall(idx):
        idx = np.asarray(idx)
        return round(float(np.mean(
            [len(set(idx[i]) & set(truth[i])) / 10 for i in range(len(truth))]
        )), 4)

    old_idx = jax.lax.approx_max_k(
        pq_ops.adc_scan_scores_auto(luts, codes, valid), ef,
        recall_target=0.95)[1]
    print(json.dumps({"metric": "old_pool_recall10",
                      "value": pool_recall(old_idx)}), flush=True)
    new_idx = pa.adc_pool_pallas(luts, codes, valid, ef_buf=ef)[1]
    print(json.dumps({"metric": "fused_pool_recall10",
                      "value": pool_recall(new_idx)}), flush=True)

    # interleaved chained timings (each fn compiled once, then timed in
    # round-robin so slow-first-measurement bias can't pick a winner)
    def old_pool(q, codes, valid):
        lut = pq_ops.build_lut(q, cb)
        neg = pq_ops.adc_scan_scores_auto(lut, codes, valid)
        return jax.lax.approx_max_k(neg, ef, recall_target=0.95)[1]

    def fused(tile):
        def f(q, codes, valid):
            lut = pq_ops.build_lut(q, cb)
            return pa.adc_pool_pallas(
                lut, codes, valid, ef_buf=ef, tile_n=tile)[1]
        return f

    variants = {"old_scan_amk": old_pool}
    for t in (1024, 2048):
        variants[f"fused_tile{t}"] = fused(t)
    variants["fused_auto"] = (
        lambda q, codes, valid: pa.adc_pool_pallas(
            pq_ops.build_lut(q, cb), codes, valid, ef_buf=ef)[1])

    import jax.numpy as jnp

    def chained(fn):
        def c(q, codes, valid):
            def body(i, acc):
                out = fn(q + acc * 1e-30, codes, valid)
                return acc + jnp.sum(out.astype(jnp.float32)) * 1e-32
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))
        return jax.jit(c)

    jitted = {}
    for name, fn in variants.items():
        try:
            jitted[name] = chained(fn)
            jax.block_until_ready(jitted[name](q, codes, valid))
        except Exception as e:
            print(json.dumps({"metric": name, "error": repr(e)[:160]}),
                  flush=True)
    times = {nm: [] for nm in jitted}
    for rep in range(6):
        for nm in jitted:
            t0 = time.perf_counter()
            jax.block_until_ready(jitted[nm](q, codes, valid))
            times[nm].append(time.perf_counter() - t0)
    for nm in jitted:
        print(json.dumps({
            "metric": f"{nm}_q{qn}_n{n}",
            "value": round(float(np.median(times[nm][1:])) / REPS * 1e3, 2),
            "unit": "ms/iter"}), flush=True)


if __name__ == "__main__":
    main()
