"""Chunk/fold micro-tune for the exact kernel at the sift1m shape, using
the validated fetch-forced chain protocol (probe_exact_v3 docstring).
probe_exact_v3 read chunk=512 at 2.19 ms vs chunk=1024 at 2.76 (fold 1);
this sweeps chunk x fold on the REAL production entry point via tile_n
overrides... chunk is not independently exposed, so this uses the v3-style
inline kernel builder for (tile, chunk, fold) and then confirms the best
config against the production kernel's auto choice.

Run: python -u benchmarks/probe_exact_chunk.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, QN = 1_000_000, 128, 512


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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    q0 = jnp.asarray(rng.normal(size=(QN, D)).astype(np.float32))
    xn2 = jax.block_until_ready(jnp.sum(x * x, axis=1))
    perturb = jax.jit(lambda q, i: q * (1.0 + i * 1e-7))
    qs = [jax.block_until_ready(perturb(q0, float(i))) for i in range(8)]

    def make_kernel(tile, chunk, bins, fold):
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
                xlo = (xf - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
                cross = jax.lax.dot_general(
                    qhi, xhi, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                cross += jax.lax.dot_general(
                    qhi, xlo, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                cross += jax.lax.dot_general(
                    qlo, xhi, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                s = cross - aux_ref[0, c * chunk : (c + 1) * chunk][None, :]
                for t in range(chunk // bins):
                    st = s[:, t * bins : (t + 1) * bins]
                    better = st > m
                    m = jnp.where(better, st, m)
                    a = jnp.where(better, g, a)
                    g += 1
            ids = nt * tile + a * bins
            val = m + ids.astype(jnp.float32) * 1e-30
            if fold == 1:
                outs_ref[:] = val
            else:
                @pl.when(nt % fold == 0)
                def _():
                    outs_ref[:] = val

                @pl.when(nt % fold != 0)
                def _():
                    outs_ref[:] = jnp.maximum(outs_ref[:], val)
        return kern

    def build(tile, chunk, fold):
        bins = 128 * max(1, tile // 1024)
        nn = -(-N // tile)
        w = (-(-nn // fold)) * bins

        @jax.jit
        def f(q, x, xadj, prev):
            pad_n = nn * tile - N
            aux = jnp.pad(xadj, (0, pad_n), constant_values=jnp.inf)[None, :]
            outs = pl.pallas_call(
                make_kernel(tile, chunk, bins, fold),
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

    for tile, chunk, fold in (
        (2048, 1024, 8), (2048, 512, 8), (2048, 256, 8), (1024, 512, 16),
        (2048, 512, 1), (2048, 2048, 8),
    ):
        try:
            chain_time(f"t{tile}_c{chunk}_f{fold}", build(tile, chunk, fold),
                       qs, (x, xn2))
        except Exception as e:
            print(json.dumps({"metric": f"t{tile}_c{chunk}_f{fold}",
                              "error": repr(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
