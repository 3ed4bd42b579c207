"""Sweep the exact path's stage-2 (pool top-k) configs on the chip, one
SUBPROCESS per config with a hard timeout — a pathological Mosaic compile
(see ops/pallas/exact._auto_tile's bins note) then costs one bounded child,
not the whole session. Ground truth is computed once and cached to npz.

Run: python benchmarks/sweep_exact_stage2.py

r4 PROTOCOL CAVEAT: timings below rely on block_until_ready and/or
repeated identical-args calls, both shown unreliable through the axon
runtime in r4 (CLAUDE.md measurement trap; some programs return without
executing). Numbers from this harness were historically consistent for
FULL composed paths, but cross-check anything load-bearing with the
fetch-forced dependency-chain protocol (benchmarks/probe_exact_v3.py).
"""

import json
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N, D, QN, K, EF = 1_000_000, 128, 512, 10, 32
TRUTH = "/tmp/exact_truth_1m.npz"

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
import numpy as np, jax, jax.numpy as jnp
from vectorsearch_tpu.ops.pallas import exact as pe
from vectorsearch_tpu.ops import traversal as tr

tile, rt = {tile}, {rt}
n, d, qn, k, ef = {n}, {d}, {qn}, {k}, {ef}
rng = np.random.default_rng(0)
xh = rng.normal(size=(n, d)).astype(np.float32)
qh = (xh[rng.integers(0, n, qn)] + 0.3 * rng.normal(size=(qn, d))).astype(np.float32)
x, q0, valid = jnp.asarray(xh), jnp.asarray(qh), jnp.ones(n, bool)

def full(q, x, v):
    ps, pi = pe.exact_pool_scored_pallas(
        q, x, v, ef_buf=ef, tile_n=tile, stage2_rt=rt)
    return tr.exact_finalize(q, ps, pi, k, "L2")

out = jax.block_until_ready(jax.jit(full)(q0, x, valid))
iv = np.asarray(out[2])
truth = np.load({truth!r})["truth"]
recall = float(np.mean([len(set(iv[i]) & set(truth[i])) / k for i in range(qn)]))

def timed(q, x, v):
    return full(q, x, v)[0]

def chained(q, x, v):
    def body(i, acc):
        o = timed(q + acc * 1e-30, x, v)
        return acc + jnp.sum(o.astype(jnp.float32)) * 1e-32
    return jax.lax.fori_loop(0, 8, body, jnp.float32(0.0))

cj = jax.jit(chained)
jax.block_until_ready(cj(q0, x, valid))
ts = []
for _ in range(6):
    t0 = time.perf_counter()
    jax.block_until_ready(cj(q0, x, valid))
    ts.append(time.perf_counter() - t0)
ms = float(np.median(ts[1:])) / 8 * 1e3
print(json.dumps({{"tile": tile, "rt": rt, "recall": round(recall, 5),
                  "full_ms": round(ms, 2)}}), flush=True)
"""


def ensure_truth():
    if os.path.exists(TRUTH):
        return
    rng = np.random.default_rng(0)
    xh = rng.normal(size=(N, D)).astype(np.float32)
    qh = (xh[rng.integers(0, N, QN)]
          + 0.3 * rng.normal(size=(QN, D)).astype(np.float32)).astype(np.float32)
    xsq = (xh ** 2).sum(1)
    truth = np.empty((QN, K), np.int64)
    for lo in range(0, QN, 64):
        qb = qh[lo:lo + 64]
        d2 = (qb ** 2).sum(1)[:, None] - 2.0 * qb @ xh.T + xsq[None, :]
        part = np.argpartition(d2, K, axis=1)[:, :K]
        order = np.argsort(np.take_along_axis(d2, part, axis=1), axis=1)
        truth[lo:lo + 64] = np.take_along_axis(part, order, axis=1)
    np.savez(TRUTH, truth=truth)
    print("truth cached", flush=True)


def main():
    ensure_truth()
    configs = [(4096, 0.999), (4096, 0.99), (4096, 0.95),
               (8192, 0.999), (8192, 0.99)]
    env = {**os.environ, "VSTPU_COMPILE_CACHE": "off"}
    for tile, rt in configs:
        src = RUNNER.format(root=ROOT, tile=tile, rt=rt, n=N, d=D, qn=QN,
                            k=K, ef=EF, truth=TRUTH)
        try:
            p = subprocess.run([sys.executable, "-u", "-c", src], env=env,
                               capture_output=True, text=True, timeout=300)
            line = [l for l in p.stdout.splitlines() if l.startswith("{")]
            print(line[-1] if line else json.dumps(
                {"tile": tile, "rt": rt, "error": p.stderr[-200:]}), flush=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({"tile": tile, "rt": rt, "error": "TIMEOUT"}),
                  flush=True)


if __name__ == "__main__":
    main()
