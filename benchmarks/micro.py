"""Micro-benchmarks — the analogue of the reference's JMH suite
(src/jmh/.../DistanceAndPqBenchmark.java:21-134): distance kernels at
dim 128/768, PQ encode (M=16, K=256, d=128), and ADC LUT distance.

Run: python benchmarks/micro.py  (prints one JSON line per benchmark)

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


def timed(fn, reps=50):
    import jax

    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    from vectorsearch_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    from vectorsearch_tpu.ops import distance as d
    from vectorsearch_tpu.ops import pq

    rng = np.random.default_rng(0)
    results = []

    # batched distance kernels (the reference benches single pairs; the TPU
    # unit of work is a [Q, N] block — report ns per pair)
    for dim in (128, 768):
        q = jnp.asarray(rng.normal(size=(128, dim)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(8192, dim)).astype(np.float32))
        pairs = 128 * 8192
        sec = timed(jax.jit(lambda q=q, x=x: d.pairwise_l2_squared(q, x)))
        results.append({"metric": f"l2sq_dim{dim}", "value": round(sec / pairs * 1e9, 3),
                        "unit": "ns/pair"})
        sec = timed(jax.jit(lambda q=q, x=x: d.pairwise_cosine(q, x)))
        results.append({"metric": f"cosine_dim{dim}", "value": round(sec / pairs * 1e9, 3),
                        "unit": "ns/pair"})

    # PQ encode, M=16 K=256 d=128 (reference :107-110)
    x = jnp.asarray(rng.normal(size=(100_352, 128)).astype(np.float32))
    valid = jnp.ones(100_352, bool)
    cb = pq.pq_train(x, valid, m=16, k=256, iters=3, key=jax.random.PRNGKey(0))
    sec = timed(lambda: pq.pq_encode(x, cb, valid), reps=10)
    results.append({"metric": "pq_encode_m16_k256_d128", "value": round(sec / 100_352 * 1e9, 2),
                    "unit": "ns/vector"})

    # ADC scan (LUT distance, reference :116-123)
    codes = pq.pq_encode(x, cb, valid)
    q = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32))
    lut = pq.build_lut(q, cb)
    sec = timed(lambda: pq.adc_scan_auto(lut, codes, valid), reps=10)
    results.append({"metric": "adc_scan_q128_n100k_m16", "value": round(sec / (128 * 100_352) * 1e9, 3),
                    "unit": "ns/distance"})

    # flat-path pool build at the serving shape (Q=512): scan + global top-ef
    # in ONE program — in-program deltas are the only trustworthy comparison
    # (standalone op timings hide dispatch/fusion effects; see CLAUDE.md)
    q512 = jnp.asarray(rng.normal(size=(512, 128)).astype(np.float32))
    lut512 = pq.build_lut(q512, cb)

    @jax.jit
    def flat_pool_f32(lut, codes, valid):
        approx = pq.adc_scan_auto(lut, codes, valid)
        return jax.lax.approx_max_k(-approx, 256, recall_target=0.95)

    @jax.jit
    def flat_pool_fused(lut, codes, valid):
        neg = pq.adc_scan_scores_auto(lut, codes, valid)
        return jax.lax.approx_max_k(neg, 256, recall_target=0.95)

    @jax.jit
    def flat_pool_binned(lut, codes, valid):
        # the r3 default on TPU: top-k fused into the scan (no [Q, N] matrix)
        return pq.adc_pool_auto(lut, codes, valid, ef_buf=256)

    sec = timed(lambda: flat_pool_f32(lut512, codes, valid), reps=10)
    results.append({"metric": "flat_pool_q512_n100k_f32scan", "value": round(sec * 1e3, 3),
                    "unit": "ms"})
    sec = timed(lambda: flat_pool_fused(lut512, codes, valid), reps=10)
    results.append({"metric": "flat_pool_q512_n100k_fusedscores", "value": round(sec * 1e3, 3),
                    "unit": "ms"})
    sec = timed(lambda: flat_pool_binned(lut512, codes, valid), reps=10)
    results.append({"metric": "flat_pool_q512_n100k_binnedpool", "value": round(sec * 1e3, 3),
                    "unit": "ms"})

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
