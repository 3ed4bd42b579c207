"""Decompose the exact-path cost with self-contained kernel VARIANTS (r4):
the production kernel vs (no bin-reduce), (1 bf16 MXU pass), (no epilogue),
at several tiles, plus stage-2 approx_max_k in isolation.

TIMING PROTOCOL (the only one that survived validation on this box —
CLAUDE.md r4 trap): python-level dependency chain (call i+1's query input
consumes call i's checksum INSIDE the jit), terminated by a HOST FETCH of
the final scalar, differencing two chain lengths to cancel the RTT and
fixed costs. block_until_ready does NOT reliably wait through the axon
tunnel (an 8192^3 matmul "completed" in 0.03 ms by block; the same chain
protocol measures 5.86 ms vs 5.6 ms theoretical bf16 peak). Checksums must
reduce ALL output elements — XLA slices dead output regions out of the
program (sum(out[:1,:8]) turned the matmul into a one-row matmul).

Run: python -u benchmarks/probe_exact_v3.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, QN = 1_000_000, 128, 512


def chain_time(label, step, qs, rest, k_short=4, k_long=12):
    """step(q, *rest, prev) -> scalar checksum; returns per-call ms."""
    def run(k):
        import jax.numpy as jnp

        prev = jnp.float32(0.0)
        t0 = time.perf_counter()
        for i in range(k):
            prev = step(qs[i % len(qs)], *rest, prev)
        float(prev)  # fetch forces the whole chain
        return (time.perf_counter() - t0) * 1e3

    run(2)  # warm compile + first-exec slowness (CLAUDE.md)
    ts = sorted(run(k_short) for _ in range(2))
    tl = sorted(run(k_long) for _ in range(2))
    per = (tl[0] - ts[0]) / (k_long - k_short)
    print(json.dumps({"metric": label, "ms_per_call": round(per, 2),
                      "t_short": round(ts[0], 1), "t_long": round(tl[0], 1)}),
          flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    q0 = jnp.asarray(rng.normal(size=(QN, D)).astype(np.float32))
    xn2 = jax.block_until_ready(jnp.sum(x * x, axis=1))
    perturb = jax.jit(lambda q, i: q * (1.0 + i * 1e-7))
    qs = [jax.block_until_ready(perturb(q0, float(i))) for i in range(8)]

    def make_kernel(tile, chunk, bins, passes, reduce, epilogue, fold):
        def kern(q_ref, x_ref, aux_ref, outs_ref):
            nt = pl.program_id(0)
            qf = q_ref[:]
            qhi = qf.astype(jnp.bfloat16)
            qlo = (qf - qhi.astype(jnp.float32)).astype(jnp.bfloat16)
            dn = (((1,), (1,)), ((), ()))
            m = jnp.full((qf.shape[0], bins), -jnp.inf, dtype=jnp.float32)
            a = jnp.zeros(m.shape, dtype=jnp.int32)
            g = 0
            for c in range(tile // chunk):
                xf = x_ref[c * chunk : (c + 1) * chunk, :]
                xhi = xf.astype(jnp.bfloat16)
                cross = jax.lax.dot_general(
                    qhi, xhi, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                if passes == 3:
                    xlo = (xf - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
                    cross += jax.lax.dot_general(
                        qhi, xlo, dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
                    cross += jax.lax.dot_general(
                        qlo, xhi, dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
                if epilogue:
                    s = cross - aux_ref[0, c * chunk : (c + 1) * chunk][None, :]
                else:
                    s = cross
                if reduce:
                    for t in range(chunk // bins):
                        st = s[:, t * bins : (t + 1) * bins]
                        better = st > m
                        m = jnp.where(better, st, m)
                        a = jnp.where(better, g, a)
                        g += 1
                else:
                    m = jnp.maximum(m, s[:, :bins])  # touch s, skip arg work
            ids = nt * tile + a * bins
            if fold == 1:
                outs_ref[:] = m + ids.astype(jnp.float32) * 1e-30
            else:
                @pl.when(nt % fold == 0)
                def _():
                    outs_ref[:] = m + ids.astype(jnp.float32) * 1e-30

                @pl.when(nt % fold != 0)
                def _():
                    outs_ref[:] = jnp.maximum(
                        outs_ref[:], m + ids.astype(jnp.float32) * 1e-30)
        return kern

    def build(tile=2048, chunk=1024, passes=3, reduce=True, epilogue=True,
              fold=1):
        bins = 128 * max(1, tile // 1024)
        nn = -(-N // tile)
        w = (-(-nn // fold)) * bins

        @jax.jit
        def f(q, x, xadj, prev):
            pad_n = nn * tile - N
            aux = jnp.pad(xadj, (0, pad_n), constant_values=jnp.inf)[None, :]
            outs = pl.pallas_call(
                make_kernel(tile, chunk, bins, passes, reduce, epilogue, fold),
                grid=(nn,),
                in_specs=[
                    pl.BlockSpec((QN, D), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, D), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (QN, bins), lambda i, f=fold: (0, i // f),
                    memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((QN, w), jnp.float32),
            )(q * (2.0 + prev * 1e-32), x, aux)
            fin = jnp.where(jnp.isfinite(outs), outs, 0.0)
            return jnp.sum(fin) * 1e-20
        return f

    for label, kw in (
        ("v_full_t2048", {}),
        ("v_noreduce_t2048", {"reduce": False}),
        ("v_1pass_t2048", {"passes": 1}),
        ("v_noepi_t2048", {"epilogue": False}),
        ("v_1pass_noreduce", {"passes": 1, "reduce": False}),
        ("v_full_t4096", {"tile": 4096}),
        ("v_full_t1024", {"tile": 1024}),
        ("v_full_chunk512", {"chunk": 512}),
        ("v_full_fold4", {"fold": 4}),
        ("v_full_fold8", {"fold": 8}),
    ):
        try:
            chain_time(label, build(**kw), qs, (x, xn2))
        except Exception as e:
            print(json.dumps({"metric": label, "error": repr(e)[:160]}),
                  flush=True)

    # stage 2 in isolation: chain through the pool values
    for w in (125_000, 62_500, 15_625):
        base = jnp.asarray(rng.normal(size=(QN, w)).astype(np.float32))
        pools = [jax.block_until_ready(perturb(base, float(i)))
                 for i in range(8)]
        for rt in (0.95, 0.99):
            def s2(p, prev, rt=rt):
                neg, _ = jax.lax.approx_max_k(
                    p + prev * 1e-32, 64, recall_target=rt)
                return jnp.sum(neg) * 1e-20
            chain_time(f"s2_w{w}_rt{rt}", jax.jit(s2), pools, ())

        def s2t(p, prev):
            return jnp.sum(jax.lax.top_k(p + prev * 1e-32, 64)[0]) * 1e-20
        chain_time(f"s2_w{w}_topk", jax.jit(s2t), pools, ())


if __name__ == "__main__":
    main()
