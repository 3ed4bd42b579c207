"""Traversal kernel unit tests: visited semantics, masking, batched queries,
legacy BEAM mode behavior."""

import jax.numpy as jnp
import numpy as np

from vectorsearch_tpu.ops import graph, pq, traversal


def expand(lut, codes, adj, valid, seed, seed_d, ef, beam, **kw):
    approx = pq.adc_scan(lut, codes, valid)
    return traversal.graph_expand(approx, adj, valid, seed, seed_d, ef, beam, **kw)


def line_graph_setup(n=16, d=4):
    """Points on a line; adjacency connects i <-> i+1. Exact PQ (centroid=point)."""
    x = np.zeros((n, d), np.float32)
    x[:, 0] = np.arange(n)
    adj = np.full((n, 2), -1, np.int32)
    adj[:-1, 0] = np.arange(1, n)
    adj[1:, 1] = np.arange(0, n - 1)
    m = 2
    xs = jnp.asarray(x)
    cb = xs.reshape(n, m, d // m).transpose(1, 0, 2)
    codes = pq.pq_encode(xs, cb, jnp.ones(n, bool))
    return x, xs, jnp.asarray(adj), cb, codes


def test_traversal_walks_the_line():
    x, xs, adj, cb, codes = line_graph_setup()
    n = len(x)
    q = np.zeros((1, 4), np.float32)
    q[0, 0] = n - 1  # target the far end
    lut = pq.build_lut(jnp.asarray(q), cb)
    # seed at node 0 — must walk the entire line to reach n-1
    seed = jnp.asarray([[0]], dtype=jnp.int32)
    seed_d = pq.adc_lookup(lut, codes[seed])
    cand_idx, cand_d = expand(
        lut, codes, adj, jnp.ones(n, bool), seed, seed_d,
        jnp.int32(n), jnp.int32(1), ef_buf=n, beam_buf=1, max_steps=n + 2,
    )
    got = set(int(v) for v in np.asarray(cand_idx)[0] if v >= 0)
    assert (n - 1) in got  # reached the far end
    assert len(got) == n  # visited everything exactly once (no dups)
    ids = [int(v) for v in np.asarray(cand_idx)[0] if v >= 0]
    assert len(ids) == len(set(ids))


def test_traversal_respects_row_valid():
    x, xs, adj, cb, codes = line_graph_setup()
    n = len(x)
    q = np.zeros((1, 4), np.float32)
    q[0, 0] = n - 1
    lut = pq.build_lut(jnp.asarray(q), cb)
    valid = np.ones(n, bool)
    valid[5] = False  # break the line at node 5
    seed = jnp.asarray([[0]], dtype=jnp.int32)
    seed_d = pq.adc_lookup(lut, codes[seed])
    cand_idx, _ = expand(
        lut, codes, adj, jnp.asarray(valid), seed, seed_d,
        jnp.int32(n), jnp.int32(1), ef_buf=n, beam_buf=1, max_steps=n + 2,
    )
    got = set(int(v) for v in np.asarray(cand_idx)[0] if v >= 0)
    assert got == {0, 1, 2, 3, 4}  # cannot cross the invalid node


def test_traversal_ef_limit_stops_exploration():
    x, xs, adj, cb, codes = line_graph_setup()
    n = len(x)
    q = np.zeros((1, 4), np.float32)
    lut = pq.build_lut(jnp.asarray(q), cb)
    seed = jnp.asarray([[0]], dtype=jnp.int32)
    seed_d = pq.adc_lookup(lut, codes[seed])
    cand_idx, _ = expand(
        lut, codes, adj, jnp.ones(n, bool), seed, seed_d,
        jnp.int32(4), jnp.int32(1), ef_buf=n, beam_buf=1, max_steps=n + 2,
    )
    got = [int(v) for v in np.asarray(cand_idx)[0] if v >= 0]
    # explored count capped around ef=4 (may overshoot by one beam*R batch)
    assert len(got) <= 4 + 2


def test_traversal_batched_queries_independent():
    x, xs, adj, cb, codes = line_graph_setup()
    n = len(x)
    q = np.zeros((2, 4), np.float32)
    q[0, 0] = 0.0
    q[1, 0] = n - 1
    lut = pq.build_lut(jnp.asarray(q), cb)
    seeds = jnp.asarray([[0], [0]], dtype=jnp.int32)
    seed_d = pq.adc_lookup(lut, codes[seeds])
    cand_idx, cand_d = expand(
        lut, codes, adj, jnp.ones(n, bool), seeds, seed_d,
        jnp.int32(n), jnp.int32(1), ef_buf=n, beam_buf=1, max_steps=n + 2,
    )
    scores, dists, idx = traversal.exact_rerank(jnp.asarray(q), xs, jnp.ones(n, bool), cand_idx, k=1)
    assert int(np.asarray(idx)[0, 0]) == 0
    assert int(np.asarray(idx)[1, 0]) == n - 1


def test_exact_rerank_drops_deleted():
    x, xs, adj, cb, codes = line_graph_setup()
    n = len(x)
    alive = np.ones(n, bool)
    alive[0] = False  # tombstoned
    q = np.zeros((1, 4), np.float32)
    cand = jnp.asarray([[0, 1, 2, -1]], dtype=jnp.int32)
    scores, dists, idx = traversal.exact_rerank(
        jnp.asarray(q), xs, jnp.asarray(alive), cand, k=3
    )
    idx = np.asarray(idx)[0]
    assert 0 not in idx.tolist()
    assert idx[0] == 1
    assert -1 in idx.tolist()  # only 2 valid results


def test_beam_mode_min_steps_forces_hops():
    x, xs, adj, cb, codes = line_graph_setup()
    n = len(x)
    q = np.zeros((1, 4), np.float32)
    lut = pq.build_lut(jnp.asarray(q), cb)
    seed = jnp.asarray([[0]], dtype=jnp.int32)
    seed_d = pq.adc_lookup(lut, codes[seed])
    # ef=1 would stop immediately, but min_steps=3 forces 3 hops (minHops floor)
    cand_idx, _ = expand(
        lut, codes, adj, jnp.ones(n, bool), seed, seed_d,
        jnp.int32(1), jnp.int32(1), ef_buf=8, beam_buf=1, max_steps=8,
        min_steps=3, refine_frontier=False,
    )
    got = [int(v) for v in np.asarray(cand_idx)[0] if v >= 0]
    assert len(got) >= 3
