"""Graph-build scaling evidence (r2 VERDICT #5): a 500k-row Vamana-style
build must complete in bounded time. The XLA top-L candidate path
materializes a [B, N] distance matrix per block (write+read of GBs of f32);
past FUSED_KNN_MIN_ROWS the candidates come from the fused binned-pool
kernel instead (ops/graph.py::_knn_block_fused), which keeps score tiles in
VMEM. Prints one JSON line with build seconds and a recall gate of the
resulting graph's top-1 edges vs brute-force neighbors on a sample.

Run on the chip: python benchmarks/graph_build_scale.py  [N rows via
VSTPU_GBS_N, default 500_000]
"""

import json
import os
import time

import numpy as np


def main():
    import jax.numpy as jnp

    from vectorsearch_tpu.ops import graph as g

    rng = np.random.default_rng(42)
    n = int(os.environ.get("VSTPU_GBS_N", 500_000))
    d, degree, breadth = 128, 32, 64
    centers = rng.normal(size=(2048, d)).astype(np.float32) * 4
    x = centers[rng.integers(0, 2048, n)] + rng.normal(size=(n, d)).astype(
        np.float32
    )
    xd = jnp.asarray(x)
    valid = jnp.ones(n, bool)

    t0 = time.time()
    adj = g.build_graph(xd, valid, degree=degree, l_build=breadth, alpha=1.2)
    adj = np.asarray(adj)
    build_s = time.time() - t0

    # quality gate: sampled nodes' nearest stored edge should be the true
    # nearest neighbor most of the time (candidates are near-exact top-L)
    sample = rng.integers(0, n, 256)
    hits = 0
    for i in sample.tolist():
        d2 = np.sum((x - x[i]) ** 2, axis=1)
        d2[i] = np.inf
        true_nn = int(np.argmin(d2))
        hits += int(true_nn in set(adj[i].tolist()))
    nn_recall = hits / len(sample)

    print(json.dumps({
        "metric": f"graph_build_{n}x{d}_deg{degree}",
        "build_s": round(build_s, 1),
        "nn_edge_recall": round(nn_recall, 4),
        "degree_used": int((adj >= 0).sum(1).mean()),
    }))


if __name__ == "__main__":
    import sys
    import pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    main()
