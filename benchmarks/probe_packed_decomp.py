"""Packed-kernel decomposition + fold/rt sweep (r5).

A: packed stage 1 only; B: + approx_max_k; C: full tail (decode+finalize).
Also re-times the two-plane stage 1 for the same-session comparison.
Chain protocol per CLAUDE.md.

Run: python -u benchmarks/probe_packed_decomp.py
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

    def a_pool(q, x_, v_, n2_, prev):
        pool, step = pe.exact_bin_pool_packed(
            q + prev * 1e-32, x_, v_, xn2=n2_)
        return consume(pool, step)

    def b_approx(q, x_, v_, n2_, prev):
        pool, step = pe.exact_bin_pool_packed(
            q + prev * 1e-32, x_, v_, xn2=n2_)
        pv, pos = jax.lax.approx_max_k(pool, EF, recall_target=0.99)
        return consume(pv, pos) + consume(step)

    def c_full(q, x_, v_, n2_, prev):
        ps, pi = pe.exact_pool_scored_pallas(
            q + prev * 1e-32, x_, v_, ef_buf=EF, xn2=n2_, packed=True)
        sc, di, iv = tr.exact_finalize(q, ps, pi, K, "L2")
        return consume(sc, iv)

    def t_pool(q, x_, v_, n2_, prev):
        outs, outi = pe.exact_bin_pool(q + prev * 1e-32, x_, v_, xn2=n2_)
        return consume(outs, outi)

    chain_time("A_packed_pool_only", jax.jit(a_pool), qs, (x, valid, xn2))
    chain_time("B_plus_approx", jax.jit(b_approx), qs, (x, valid, xn2))
    chain_time("C_full_tail", jax.jit(c_full), qs, (x, valid, xn2))
    chain_time("T_twoplane_pool_only", jax.jit(t_pool), qs, (x, valid, xn2))


if __name__ == "__main__":
    main()
