"""Stage-2 variants over the packed pool (r5): approx_max_k costs ~0.9 ms
of the 3.28 ms composed exact tail at the sift1m shape. exact_finalize
re-top-ks the [Q, ef] pool anyway, so approx_max_k's final aggregation
sort (aggregate_to_topk=True) may be redundant — its unaggregated output
is just a larger candidate set the finalize top_k can eat directly.

Run: python -u benchmarks/probe_stage2_variants.py
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

    MIN_W = max(16384, 4 * EF)

    def tail(agg, rt):
        def f(q, x_, v_, n2_, prev):
            pool, step = pe.exact_bin_pool_packed(
                q + prev * 1e-32, x_, v_, xn2=n2_, min_w=MIN_W)
            pv, pos = jax.lax.approx_max_k(
                pool, EF, recall_target=rt, aggregate_to_topk=agg)
            ps, pi = pe.decode_packed_pool(
                pv, pos.astype(jnp.int32), step, q, "L2",
                d=D, n=N, qn=QN, tile_n=None, fold=None, min_w=MIN_W)
            sc, di, iv = tr.exact_finalize(q, ps, pi, K, "L2")
            return consume(sc, iv)
        return f

    # recall gates first (16 queries, one BLAS gemm truth)
    nq_gate = 128
    s_true = 2.0 * (qh[:nq_gate] @ xh.T) - (xh ** 2).sum(1)[None, :]
    truth = [set(np.argpartition(-s_true[i], K)[:K].tolist())
             for i in range(nq_gate)]
    del s_true
    for agg, rt in ((True, 0.99), (False, 0.99), (False, 0.95)):
        pool, step = pe.exact_bin_pool_packed(
            q0, x, valid, xn2=xn2, min_w=MIN_W)
        pv, pos = jax.lax.approx_max_k(
            pool, EF, recall_target=rt, aggregate_to_topk=agg)
        ps, pi = pe.decode_packed_pool(
            pv, pos.astype(jnp.int32), step, q0, "L2",
            d=D, n=N, qn=QN, tile_n=None, fold=None, min_w=MIN_W)
        _sc, _di, iv = tr.exact_finalize(q0, ps, pi, K, "L2")
        iv = np.asarray(iv)
        hits = sum(len(truth[i] & set(iv[i].tolist()))
                   for i in range(nq_gate))
        print(json.dumps({
            "metric": f"recall_agg{agg}_rt{rt}",
            "recall": hits / (nq_gate * K),
            "out_width": int(pv.shape[1]),
        }), flush=True)

    chain_time("agg_rt99", jax.jit(tail(True, 0.99)), qs, (x, valid, xn2))
    chain_time("noagg_rt99", jax.jit(tail(False, 0.99)), qs, (x, valid, xn2))
    chain_time("noagg_rt95", jax.jit(tail(False, 0.95)), qs, (x, valid, xn2))


if __name__ == "__main__":
    main()
