"""How much does each sync_device update-program bucket cost to compile
through the axon tunnel? (r5 churn attribution: the adds_only phase served
0 QPS — hypothesis: every NEW bucket size of _update_rows/_update_flags is
a fresh remote compile landing on the serving path's dev lock.)

Run: python -u benchmarks/probe_sync_compile.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vectorsearch_tpu.core.segment import (
    _update_flags, _update_range_1d, _update_rows,
)


def main():
    cap_pad, d_pad = 1 << 20, 128
    dst = jnp.zeros((cap_pad, d_pad), jnp.float32)
    fl = jnp.zeros((cap_pad,), jnp.bool_)
    jax.block_until_ready((dst, fl))

    for span in (256, 2048, 4096, 16384, 65536, 262144):
        rows = jnp.zeros((span, 96), jnp.float32)
        jax.block_until_ready(rows)
        t0 = time.perf_counter()
        r = _update_rows(dst, rows, jnp.int32(0))
        jax.block_until_ready(r)
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = _update_rows(dst, rows, jnp.int32(1))
        jax.block_until_ready(r)
        t_second = time.perf_counter() - t0
        print(json.dumps({"prog": "rows", "span": span,
                          "first_ms": round(t_first * 1e3, 1),
                          "second_ms": round(t_second * 1e3, 1)}), flush=True)

    for span in (256, 4096, 65536):
        vals = jnp.zeros((span,), jnp.bool_)
        jax.block_until_ready(vals)
        t0 = time.perf_counter()
        r = _update_range_1d(fl, vals, jnp.int32(0))
        jax.block_until_ready(r)
        t_first = time.perf_counter() - t0
        print(json.dumps({"prog": "range1d", "span": span,
                          "first_ms": round(t_first * 1e3, 1)}), flush=True)

    for span in (64, 2048, 16384):
        packed = jnp.zeros((3, span), jnp.int32)
        jax.block_until_ready(packed)
        t0 = time.perf_counter()
        a, e = _update_flags(fl, fl, packed)
        jax.block_until_ready((a, e))
        t_first = time.perf_counter() - t0
        print(json.dumps({"prog": "flags", "span": span,
                          "first_ms": round(t_first * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
