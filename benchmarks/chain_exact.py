"""Dependency-chained timings for the exact-path stages (CLAUDE.md: trust
only chained loops for in-jit costs — standalone op timings mislead through
the axon tunnel). Each variant runs REPS iterations inside ONE jit program,
with iteration i+1's input perturbed by iteration i's output, so the device
cannot overlap or elide work; reported = (chained - baseline) / REPS.

Run: python benchmarks/chain_exact.py [VSTPU_CE_N rows]

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

REPS = 8


def run_chain(label, fn, q, args, reps=REPS):
    """fn(q, *args) -> scalar-reducible output; chain via q perturbation."""
    import jax
    import jax.numpy as jnp

    def chained(q, *args):
        def body(i, acc):
            out = fn(q + acc * 1e-30, *args)
            # 1e-32 (NOT 0.0): a zero multiplier lets XLA DCE the whole
            # chain — tile sweeps once read 0.0 ms for a 1M-row scan
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-32

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    cj = jax.jit(chained)
    jax.block_until_ready(cj(q, *args))  # compile + first exec (discarded)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        jax.block_until_ready(cj(q, *args))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts[1:]))
    print(json.dumps({"metric": label, "value": round(med / reps * 1e3, 2),
                      "unit": "ms/iter"}), flush=True)
    return med / reps


def main():
    import jax
    import jax.numpy as jnp

    from vectorsearch_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    from vectorsearch_tpu.ops.pallas import exact as pe
    from vectorsearch_tpu.ops import traversal as traversal_ops

    rng = np.random.default_rng(0)
    n = int(os.environ.get("VSTPU_CE_N", 1_000_000))
    d, qn, k, ef = 128, 512, 10, 32
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    q0 = jnp.asarray(rng.normal(size=(qn, d)).astype(np.float32))
    valid = jnp.ones(n, bool)

    # stage 1: fused scan+binned pool, tile sweep (chained)
    for t in (512, 1024, 2048):
        try:
            run_chain(
                f"chain_bin_pool_n{n}_tile{t}",
                lambda q, x, v, t=t: pe.exact_bin_pool(q, x, v, tile_n=t)[0],
                q0, (x, valid),
            )
        except Exception as e:  # VMEM overflow at big tiles etc.
            print(json.dumps({"metric": f"chain_bin_pool_tile{t}",
                              "error": repr(e)[:140]}), flush=True)

    # stage 1+2: full candidate pool
    run_chain(
        f"chain_pool_topk_n{n}_ef{ef}",
        lambda q, x, v: pe.exact_pool_topk_pallas(q, x, v, ef_buf=ef),
        q0, (x, valid),
    )

    # rerank alone on fixed candidates (chained on q)
    cand = jax.block_until_ready(
        pe.exact_pool_topk_pallas(q0, x, valid, ef_buf=ef))
    run_chain(
        f"chain_rerank_n{n}_ef{ef}_k{k}",
        lambda q, x, v, c: traversal_ops.exact_rerank(q, x, v, c, k, "L2")[0],
        q0, (x, valid, cand),
    )

    # the raw gather alone: vectors[cand] (the suspected 15 ns/elem crawl)
    run_chain(
        f"chain_gather_n{n}_c{ef}",
        lambda q, x, c: jnp.sum(x[jnp.maximum(c, 0)], axis=-1)
        + 0.0 * jnp.sum(q[:1, :1]),
        q0, (x, cand),
    )

    # full exact path as dispatched
    def full(q, x, v):
        c = pe.exact_pool_topk_pallas(q, x, v, ef_buf=ef)
        return traversal_ops.exact_rerank(q, x, v, c, k, "L2")[0]

    run_chain(f"chain_full_exact_n{n}", full, q0, (x, valid))


if __name__ == "__main__":
    main()
