"""Deep-scale (8M-row subgroup) fold sweep for the packed exact kernel
(r5, VERDICT r4 #4): at 10M rows the production pool folds only 8x, leaving
W ~ 125k per 8M-row subgroup — a [512, 125k] pool write + approx_max_k read
that the 1M-shape measurements never saw. Sweeps fold 8/16/32/64 on the
full packed tail, the two-plane tail at fold 8 (r4 production), and a
single fused 10M-row scan vs the production 8M+2M+merge split.

Fold-64 packing cost: SQ = 2^23/512 = 16k quantization steps (slot takes
9 bits) — the probe prints recall so the precision trade is measured, not
assumed.

Run: python -u benchmarks/probe_deep_fold.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N8, N2, D, QN, K, EF = 8_000_000, 2_000_000, 128, 512, 10, 64


def chain_time(label, step, qs, rest, k_short=3, k_long=9):
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
    centers = rng.normal(size=(4096, D)).astype(np.float32)
    xh = np.empty((N8 + N2, D), np.float32)
    for off in range(0, N8 + N2, 1_000_000):
        hi = min(off + 1_000_000, N8 + N2)
        c = centers[rng.integers(0, 4096, hi - off)]
        xh[off:hi] = c + 0.18 * rng.normal(size=(hi - off, D)).astype(
            np.float32
        )
    qh = centers[rng.integers(0, 4096, QN)] + 0.18 * rng.normal(
        size=(QN, D)
    ).astype(np.float32)
    x8 = jnp.asarray(xh[:N8])
    x2 = jnp.asarray(xh[N8:])
    q0 = jnp.asarray(qh)
    v8 = jnp.ones(N8, bool)
    v2 = jnp.ones(N2, bool)
    xn8 = jax.block_until_ready(jnp.sum(x8 * x8, axis=1))
    xn2_ = jax.block_until_ready(jnp.sum(x2 * x2, axis=1))
    perturb = jax.jit(lambda q, i: q + i * 1e-7)
    qs = [jax.block_until_ready(perturb(q0, float(i))) for i in range(6)]

    def consume(*arrs):
        s = jnp.float32(0.0)
        for a in arrs:
            fin = jnp.where(jnp.isfinite(a.astype(jnp.float32)),
                            a.astype(jnp.float32), 0.0)
            s = s + jnp.sum(fin) * 1e-20
        return s

    def tail8(packed, fold):
        def f(q, x_, v_, n2_, prev):
            ps, pi = pe.exact_pool_scored_pallas(
                q + prev * 1e-32, x_, v_, ef_buf=EF, xn2=n2_, packed=packed,
                fold=fold)
            sc, di, iv = tr.exact_finalize(q, ps, pi, K, "L2")
            return consume(sc, iv)
        return f

    def split_prod(fold):
        # production shape: 8M subgroup + 2M subgroup + host-free merge
        def f(q, xa, va, na, xb, vb, nb, prev):
            qq = q + prev * 1e-32
            pa, ia = pe.exact_pool_scored_pallas(
                qq, xa, va, ef_buf=EF, xn2=na, packed=True, fold=fold)
            pb, ib = pe.exact_pool_scored_pallas(
                qq, xb, vb, ef_buf=EF, xn2=nb, packed=True, fold=fold)
            sa, da, va_ = tr.exact_finalize(q, pa, ia, K, "L2")
            sb, db, vb_ = tr.exact_finalize(q, pb, ib, K, "L2")
            s = jnp.concatenate([sa, sb], axis=1)
            d_ = jnp.concatenate([da, db], axis=1)
            iv = jnp.concatenate([va_, vb_ + N8], axis=1)
            top, pos = jax.lax.top_k(s, K)
            return consume(top, jnp.take_along_axis(iv, pos, axis=1),
                           jnp.take_along_axis(d_, pos, axis=1))
        return f

    # ground truth once: one BLAS gemm (16 queries x 8M) beats 8M-row
    # np.linalg.norm loops by ~50x on this 1-core host
    nq_gate = 16
    s_true = 2.0 * (qh[:nq_gate] @ xh[:N8].T) - (xh[:N8] ** 2).sum(1)[None, :]
    truth = [set(np.argpartition(-s_true[i], K)[:K].tolist())
             for i in range(nq_gate)]
    del s_true

    # recall gates (packed fold 8/64 on the 8M subgroup)
    for fold in (8, 64):
        ps, pi = pe.exact_pool_scored_pallas(
            q0, x8, v8, ef_buf=EF, xn2=xn8, packed=True, fold=fold)
        _sc, _di, iv = tr.exact_finalize(q0, ps, pi, K, "L2")
        iv = np.asarray(iv)
        hits = sum(
            len(truth[i] & set(iv[i].tolist())) for i in range(nq_gate)
        )
        print(json.dumps({"metric": f"recall_at10_packed_fold{fold}_8M",
                          "recall": hits / (nq_gate * K)}), flush=True)

    for fold in (8, 16, 32, 64):
        chain_time(f"packed8M_fold{fold}", jax.jit(tail8(True, fold)), qs,
                   (x8, v8, xn8))
    chain_time("twoplane8M_fold8", jax.jit(tail8(False, 8)), qs,
               (x8, v8, xn8))
    chain_time("prod_split_8M_2M_merge_fold64", jax.jit(split_prod(64)), qs,
               (x8, v8, xn8, x2, v2, xn2_))


if __name__ == "__main__":
    main()
