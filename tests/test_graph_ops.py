"""Graph construction tests (parity with graph/GraphBuilderTest.java and
GraphBuilderPruningTest.java): degree limits, no self-loops, pruning effects,
and the recall@10 >= 0.80 quality gate vs brute force."""

import jax.numpy as jnp
import numpy as np

from vectorsearch_tpu.ops import graph, pq, traversal


def test_find_medoid(rng):
    x = rng.normal(size=(50, 4)).astype(np.float32)
    valid = np.ones(50, bool)
    med = int(graph.find_medoid(jnp.asarray(x), jnp.asarray(valid)))
    centroid = x.mean(axis=0)
    expect = int(np.argmin(np.sum((x - centroid) ** 2, axis=1)))
    assert med == expect


def test_find_medoid_ignores_invalid(rng):
    x = rng.normal(size=(20, 4)).astype(np.float32)
    x[3] = 0.0  # exactly at origin; would win if valid
    valid = np.ones(20, bool)
    valid[3] = False
    x_centered = x - x.mean()  # doesn't matter, just ensure 3 is excluded
    med = int(graph.find_medoid(jnp.asarray(x), jnp.asarray(valid)))
    assert med != 3


def test_knn_candidates_exact(rng):
    x = rng.normal(size=(30, 6)).astype(np.float32)
    idx, d2 = graph.knn_candidates(jnp.asarray(x), jnp.ones(30, bool), l=5, row_block=7)
    idx, d2 = np.asarray(idx), np.asarray(d2)
    for i in range(30):
        dists = np.sum((x - x[i]) ** 2, axis=1)
        dists[i] = np.inf
        expect = np.argsort(dists)[:5]
        assert set(idx[i]) == set(expect)
        assert i not in idx[i]  # no self loops
        assert np.all(np.diff(d2[i]) >= -1e-6)  # ascending


def test_knn_small_n_pads_with_minus_one(rng):
    x = rng.normal(size=(3, 4)).astype(np.float32)
    idx, d2 = graph.knn_candidates(jnp.asarray(x), jnp.ones(3, bool), l=8)
    idx = np.asarray(idx)
    assert np.all(np.sum(idx >= 0, axis=1) == 2)
    assert np.all(idx[:, 2:] == -1)


def test_build_graph_invariants(rng):
    x = rng.normal(size=(60, 8)).astype(np.float32)
    adj = np.asarray(
        graph.build_graph(jnp.asarray(x), jnp.ones(60, bool), degree=8, l_build=24, alpha=1.2)
    )
    assert adj.shape == (60, 8)
    for i in range(60):
        row = adj[i][adj[i] >= 0]
        assert i not in row  # no self loops
        assert len(set(row.tolist())) == len(row)  # no duplicates
        assert np.all(row < 60)


def test_alpha_pruning_reduces_edges_vs_knn(rng):
    # alpha<=1 -> kNN edges (always fills degree); alpha>1 prunes diversity.
    x = rng.normal(size=(80, 8)).astype(np.float32)
    knn_adj = np.asarray(
        graph.build_graph(jnp.asarray(x), jnp.ones(80, bool), degree=16, l_build=32, alpha=1.0)
    )
    pruned_adj = np.asarray(
        graph.build_graph(jnp.asarray(x), jnp.ones(80, bool), degree=16, l_build=32, alpha=1.2)
    )
    knn_edges = int(np.sum(knn_adj >= 0))
    pruned_edges = int(np.sum(pruned_adj >= 0))
    assert knn_edges == 80 * 16
    # Pruned graph keeps fewer or equal forward edges per node before reverse
    # fill; with reverse edges it can match but selection must differ.
    assert not np.array_equal(knn_adj, pruned_adj)
    assert pruned_edges > 0


def test_robust_prune_keeps_nearest(rng):
    # The nearest candidate is always selected first.
    x = rng.normal(size=(40, 6)).astype(np.float32)
    cand_idx, cand_d2 = graph.knn_candidates(jnp.asarray(x), jnp.ones(40, bool), l=10)
    adj = np.asarray(graph.robust_prune(jnp.asarray(x), cand_idx, cand_d2, degree=4, alpha=1.2))
    cand_idx = np.asarray(cand_idx)
    for i in range(40):
        assert adj[i, 0] == cand_idx[i, 0]


def brute_force_knn(x, q, k):
    d = np.linalg.norm(x - q, axis=1)
    return np.argsort(d)[:k]


def test_vamana_recall_gate(rng):
    """Recall@10 >= 0.80 vs brute force on 100 random 8-d vectors, R=16, L=64,
    alpha=1.2 — the reference's enforced floor (graph/GraphBuilderTest.java:80-121).

    Searched with the real traversal kernel using exact per-point codebooks
    (ADC == exact distances), seeded from the medoid like the reference's
    test-local greedy search.
    """
    n, d, r = 100, 8, 16
    x = rng.normal(size=(n, d)).astype(np.float32)
    xs = jnp.asarray(x)
    valid = jnp.ones(n, bool)
    adj = graph.build_graph(xs, valid, degree=r, l_build=64, alpha=1.2)

    # exact "codebook": trivial identity PQ with one centroid per point
    m = 4
    cb = xs.reshape(n, m, d // m).transpose(1, 0, 2)
    codes = pq.pq_encode(xs, cb, valid)

    hits, total = 0, 0
    med = int(graph.find_medoid(xs, valid))
    for t in range(20):
        q = rng.normal(size=(1, d)).astype(np.float32)
        lut = pq.build_lut(jnp.asarray(q), cb)
        approx = pq.adc_scan(lut, codes, valid)
        seed_idx = jnp.asarray([[med]], dtype=jnp.int32)
        seed_d = jnp.take_along_axis(approx, seed_idx, axis=1)
        cand_idx, cand_d = traversal.graph_expand(
            approx, adj, valid, seed_idx, seed_d,
            jnp.int32(64), jnp.int32(8),
            ef_buf=64, beam_buf=8, max_steps=64,
        )
        scores, dists, idx = traversal.exact_rerank(
            jnp.asarray(q), xs, valid, cand_idx, k=10
        )
        got = set(np.asarray(idx)[0].tolist())
        expect = set(brute_force_knn(x, q[0], 10).tolist())
        hits += len(got & expect)
        total += 10
    recall = hits / total
    assert recall >= 0.80, f"recall@10={recall}"
