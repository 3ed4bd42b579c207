"""On-chip validation of the gather-free exact path (scored pool +
exact_finalize) at production batch size, per CLAUDE.md discipline:
correctness FIRST (recall@10 + distance error vs numpy brute force at
Q=512 over 1M rows — TPU-only data bugs have passed every CPU test), then
dependency-chained timings of new vs old pipeline, interleaved.

Run: python benchmarks/validate_exact_chip.py [VSTPU_VE_N rows]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 8


def chain(label, fn, q, args, reps=REPS):
    import jax
    import jax.numpy as jnp

    def chained(q, *args):
        def body(i, acc):
            out = fn(q + acc * 1e-30, *args)
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-32

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    cj = jax.jit(chained)
    jax.block_until_ready(cj(q, *args))
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        jax.block_until_ready(cj(q, *args))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts[1:])) / reps * 1e3
    print(json.dumps({"metric": label, "value": round(med, 2),
                      "unit": "ms/iter"}), flush=True)
    return med


def main():
    import jax
    import jax.numpy as jnp

    from vectorsearch_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    from vectorsearch_tpu.ops.pallas import exact as pe
    from vectorsearch_tpu.ops import traversal as tr

    rng = np.random.default_rng(0)
    n = int(os.environ.get("VSTPU_VE_N", 1_000_000))
    d, qn, k, ef = 128, 512, 10, 32
    xh = rng.normal(size=(n, d)).astype(np.float32)
    qh = (xh[rng.integers(0, n, qn)]
          + 0.3 * rng.normal(size=(qn, d))).astype(np.float32)
    x = jnp.asarray(xh)
    q0 = jnp.asarray(qh)
    valid = jnp.ones(n, bool)

    # ---- correctness: full new path vs numpy brute force -------------------
    @jax.jit
    def new_path(q, x, valid):
        # x/valid as ARGS, never closed over: a closed-over device array is
        # embedded as an HLO constant — 512 MB of it once wedged this compile
        # for 10+ minutes through the axon tunnel
        ps, pi = pe.exact_pool_scored_pallas(q, x, valid, ef_buf=ef)
        return tr.exact_finalize(q, ps, pi, k, "L2")

    sc, di, iv = map(np.asarray,
                     jax.block_until_ready(new_path(q0, x, valid)))
    # numpy truth, chunked (a full [Q, N] argsort swaps out the 1-core host)
    xsq = (xh ** 2).sum(1)
    truth = np.empty((qn, k), np.int64)
    true_d = np.empty((qn, k), np.float32)
    for lo in range(0, qn, 64):
        qb = qh[lo : lo + 64]
        d2 = (qb ** 2).sum(1)[:, None] - 2.0 * qb @ xh.T + xsq[None, :]
        part = np.argpartition(d2, k, axis=1)[:, :k]
        order = np.argsort(np.take_along_axis(d2, part, axis=1), axis=1)
        truth[lo : lo + 64] = np.take_along_axis(part, order, axis=1)
        true_d[lo : lo + 64] = np.sqrt(np.maximum(np.take_along_axis(
            d2, np.maximum(iv[lo : lo + 64], 0), axis=1), 0.0))
    recall = np.mean([
        len(set(iv[i]) & set(truth[i])) / k for i in range(qn)
    ])
    derr = float(np.max(np.abs(di - true_d) / np.maximum(true_d, 1e-3)))
    ordered = bool(np.all(np.diff(di, axis=1) >= -1e-5))
    print(json.dumps({"metric": "exact_new_recall@10", "value": round(float(recall), 5),
                      "n": n, "q": qn}), flush=True)
    print(json.dumps({"metric": "exact_new_dist_relerr_max", "value": round(derr, 6),
                      "ordered": ordered}), flush=True)
    assert recall >= 0.99, f"recall regression: {recall}"
    assert derr < 5e-3, f"distance error too large: {derr}"

    # ---- chained timings, interleaved new/old ------------------------------
    def old_path(q, x, v):
        pi = pe.exact_pool_topk_pallas(q, x, v, ef_buf=ef)
        return tr.exact_rerank(q, x, v, pi, k, "L2")[0]

    def new_full(q, x, v):
        ps, pi = pe.exact_pool_scored_pallas(q, x, v, ef_buf=ef)
        return tr.exact_finalize(q, ps, pi, k, "L2")[0]

    def pool_only(q, x, v):
        return pe.exact_bin_pool(q, x, v)[0]

    results = {}
    for rep in range(2):  # interleave per CLAUDE.md (discard-first handled in chain)
        for name, fn in (("new_full", new_full), ("old_full", old_path),
                         ("pool_only", pool_only)):
            t = chain(f"chain_{name}_n{n}_r{rep}", fn, q0, (x, valid))
            results.setdefault(name, []).append(t)
    for name, ts in results.items():
        print(json.dumps({"metric": f"{name}_best_ms", "value": round(min(ts), 2)}),
              flush=True)


if __name__ == "__main__":
    main()
