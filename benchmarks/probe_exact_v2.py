"""On-chip measurement of the PRODUCTION exact path (r4 rework): cached
xn2 column terms + output-revisit folding + exact top_k stage 2. Chained
fetch-forced timing (the only protocol that survived validation on this
box — see probe_exact_v3.py docstring and CLAUDE.md r4 trap) + recall vs
cached 1M ground truth.

Run: python -u benchmarks/probe_exact_v2.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, QN, K, EF = 1_000_000, 128, 512, 10, 64
TRUTH = "/tmp/exact_truth_1m_ef64.npz"


def ensure_truth(xh, qh):
    if os.path.exists(TRUTH):
        return np.load(TRUTH)["truth"]
    xsq = (xh ** 2).sum(1)
    truth = np.empty((QN, K), np.int64)
    for lo in range(0, QN, 64):
        qb = qh[lo:lo + 64]
        d2 = (qb ** 2).sum(1)[:, None] - 2.0 * qb @ xh.T + xsq[None, :]
        part = np.argpartition(d2, K, axis=1)[:, :K]
        order = np.argsort(np.take_along_axis(d2, part, axis=1), axis=1)
        truth[lo:lo + 64] = np.take_along_axis(part, order, axis=1)
    np.savez(TRUTH, truth=truth)
    return truth


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
    xh = rng.normal(size=(N, D)).astype(np.float32)
    qh = (xh[rng.integers(0, N, QN)]
          + 0.3 * rng.normal(size=(QN, D))).astype(np.float32)
    truth = ensure_truth(xh, qh)
    x = jnp.asarray(xh)
    q0 = jnp.asarray(qh)
    valid = jnp.ones(N, bool)
    xn2 = jax.block_until_ready(jnp.sum(x * x, axis=1))
    perturb = jax.jit(lambda q, i: q + i * 1e-7)
    qs = [jax.block_until_ready(perturb(q0, float(i))) for i in range(8)]

    def make_step(fold=None, rt=0.99, halve=0):
        def step(q, x, v, n2, prev):
            ps, pi = pe.exact_pool_scored_pallas(
                q + prev * 1e-32, x, v, ef_buf=EF, xn2=n2, fold=fold,
                stage2_rt=rt, stage2_halve=halve)
            sc, di, iv = tr.exact_finalize(q, ps, pi, K, "L2")
            fin = jnp.where(jnp.isfinite(sc), sc, 0.0)
            return jnp.sum(fin) * 1e-20 + jnp.sum(iv) * 1e-24
        return jax.jit(step)

    def recall_of(fold=None, rt=0.99, halve=0):
        ps, pi = pe.exact_pool_scored_pallas(
            q0, x, valid, ef_buf=EF, xn2=xn2, fold=fold, stage2_rt=rt,
            stage2_halve=halve)
        iv = np.asarray(tr.exact_finalize(q0, ps, pi, K, "L2")[2])
        return float(np.mean(
            [len(set(iv[i]) & set(truth[i])) / K for i in range(QN)]
        ))

    for fold, rt in ((None, 0.99), (None, 0.95), (4, 0.99), (2, 0.99)):
        rec = recall_of(fold=fold, rt=rt)
        chain_time(f"full_fold{fold}_rt{rt}_recall{rec:.5f}",
                   make_step(fold=fold, rt=rt), qs, (x, valid, xn2))


if __name__ == "__main__":
    main()
