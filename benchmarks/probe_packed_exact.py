"""Packed score|slot exact kernel vs the r4 two-plane path (r5, VERDICT #2).

Times the FULL composed exact tail (stage 1 + stage 2 + finalize) with the
fetch-forced chain protocol (probe_exact_v3 / CLAUDE.md): distinct
device-resident query buffers per call (axon memoizes identical executions),
checksum chained through the jit, differenced across two chain lengths.

Correctness: recall@10 of BOTH paths against numpy brute force on 128
queries at the production batch shape (Q=512, N=1M, d=128) — a TPU-only
data bug once passed every small-Q probe (CLAUDE.md), so the gate runs at
the production shape and full corpus.

Run: python -u benchmarks/probe_packed_exact.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, QN, K, EF = 1_000_000, 128, 512, 10, 64


def chain_time(label, step, qs, rest, k_short=4, k_long=12):
    import jax.numpy as jnp

    def run(k):
        prev = jnp.float32(0.0)
        t0 = time.perf_counter()
        for i in range(k):
            prev = step(qs[i % len(qs)], *rest, prev)
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

    from vectorsearch_tpu.ops import traversal as tr
    from vectorsearch_tpu.ops.pallas import exact as pe

    rng = np.random.default_rng(0)
    centers = rng.normal(size=(2048, D)).astype(np.float32) * 4
    xh = centers[rng.integers(0, 2048, N)] + rng.normal(size=(N, D)).astype(
        np.float32
    )
    qh = centers[rng.integers(0, 2048, QN)] + rng.normal(
        size=(QN, D)
    ).astype(np.float32)
    x = jnp.asarray(xh)
    q0 = jnp.asarray(qh)
    valid = jnp.ones(N, bool)
    xn2 = jax.block_until_ready(jnp.sum(x * x, axis=1))
    perturb = jax.jit(lambda q, i: q + i * 1e-7)
    qs = [jax.block_until_ready(perturb(q0, float(i))) for i in range(8)]

    def consume(*arrs):
        s = jnp.float32(0.0)
        for a in arrs:
            fin = jnp.where(jnp.isfinite(a.astype(jnp.float32)),
                            a.astype(jnp.float32), 0.0)
            s = s + jnp.sum(fin) * 1e-20
        return s

    def tail(packed):
        def f(q, x_, v_, n2_, prev):
            ps, pi = pe.exact_pool_scored_pallas(
                q + prev * 1e-32, x_, v_, ef_buf=EF, xn2=n2_, packed=packed)
            sc, di, iv = tr.exact_finalize(q, ps, pi, K, "L2")
            return consume(sc, iv)
        return f

    # --- correctness at the production shape, BEFORE timing ---
    for packed in (False, True):
        ps, pi = pe.exact_pool_scored_pallas(
            q0, x, valid, ef_buf=EF, xn2=xn2, packed=packed)
        sc, di, iv = tr.exact_finalize(q0, ps, pi, K, "L2")
        iv = np.asarray(iv)
        di = np.asarray(di)
        hits, derr = 0, 0.0
        for i in range(128):
            dd = np.linalg.norm(xh - qh[i], axis=1)
            truth = set(np.argpartition(dd, K)[:K].tolist())
            hits += len(truth & set(iv[i].tolist()))
            derr = max(derr, float(np.abs(
                np.linalg.norm(xh[iv[i]] - qh[i], axis=1) - di[i]
            ).max()))
        print(json.dumps({
            "metric": f"recall_at10_{'packed' if packed else 'twoplane'}",
            "recall": hits / (128 * K), "max_dist_err": round(derr, 5),
        }), flush=True)

    chain_time("twoplane_full_tail", jax.jit(tail(False)), qs,
               (x, valid, xn2))
    chain_time("packed_full_tail", jax.jit(tail(True)), qs, (x, valid, xn2))


if __name__ == "__main__":
    main()
