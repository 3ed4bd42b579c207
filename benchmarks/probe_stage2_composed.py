"""Composed stage-2 decomposition (r4 close-out, feeds the r5 packed-score
decision): of the ~2 ms the exact path spends after stage 1 at the sift1m
shape, how much is approx_max_k itself vs the outi take_along_axis vs
exact_finalize glue? Variants run the REAL stage-1 kernel then swap the
tail, timed with the fetch-forced chain protocol (probe_exact_v3).

Run: python -u benchmarks/probe_stage2_composed.py
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

    from vectorsearch_tpu.ops.pallas import exact as pe
    from vectorsearch_tpu.ops import traversal as tr

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    q0 = jnp.asarray(rng.normal(size=(QN, D)).astype(np.float32))
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

    def s1(q, x_, v_, n2_, prev):
        # all big operands are ARGS — a closure would embed them as HLO
        # constants and blow the remote-compile body limit (CLAUDE.md trap)
        return pe.exact_bin_pool(q + prev * 1e-32, x_, v_, xn2=n2_)

    # A: stage 1 only (pool consumed directly)
    def a(q, x_, v_, n2_, prev):
        outs, outi = s1(q, x_, v_, n2_, prev)
        return consume(outs, outi)

    # B: + approx_max_k (no id gather, no finalize)
    def b(q, x_, v_, n2_, prev):
        outs, outi = s1(q, x_, v_, n2_, prev)
        neg, pos = jax.lax.approx_max_k(outs, EF, recall_target=0.99)
        return consume(neg, pos) + consume(outi[:, :1])

    # C: + take_along_axis id gather
    def c(q, x_, v_, n2_, prev):
        outs, outi = s1(q, x_, v_, n2_, prev)
        neg, pos = jax.lax.approx_max_k(outs, EF, recall_target=0.99)
        rows = jnp.take_along_axis(outi, pos, axis=1)
        return consume(neg, rows)

    # D: full production tail (mask + finalize)
    def d(q, x_, v_, n2_, prev):
        ps, pi = pe.exact_pool_scored_pallas(
            q + prev * 1e-32, x_, v_, ef_buf=EF, xn2=n2_)
        sc, di, iv = tr.exact_finalize(q, ps, pi, K, "L2")
        return consume(sc, iv)

    for label, fn in (("A_stage1_only", a), ("B_plus_approx", b),
                      ("C_plus_gather", c), ("D_full_tail", d)):
        chain_time(label, jax.jit(fn), qs, (x, valid, xn2))


if __name__ == "__main__":
    main()
