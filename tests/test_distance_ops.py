"""Distance kernels vs numpy reference math (parity with util/DistancesTest.java)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vectorsearch_tpu.ops import distance as d
from vectorsearch_tpu.ops import topk


def np_l2sq(a, b):
    diff = a.astype(np.float64) - b.astype(np.float64)
    return float(np.sum(diff * diff))


def test_l2_squared_matches_numpy(rng):
    for _ in range(10):
        a = rng.normal(size=64).astype(np.float32)
        b = rng.normal(size=64).astype(np.float32)
        assert float(d.l2_squared(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(
            np_l2sq(a, b), rel=1e-5
        )


def test_l2_is_sqrt_of_l2sq(rng):
    a = rng.normal(size=16).astype(np.float32)
    b = rng.normal(size=16).astype(np.float32)
    assert float(d.l2(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(
        np.sqrt(np_l2sq(a, b)), rel=1e-5
    )


def test_dot_and_norm(rng):
    a = rng.normal(size=33).astype(np.float32)
    b = rng.normal(size=33).astype(np.float32)
    assert float(d.dot(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(
        float(np.dot(a, b)), rel=1e-5
    )
    assert float(d.norm(jnp.asarray(a))) == pytest.approx(float(np.linalg.norm(a)), rel=1e-5)


def test_cosine_zero_norm_returns_zero():
    a = jnp.zeros(8)
    b = jnp.ones(8)
    assert float(d.cosine(a, b)) == 0.0
    assert float(d.cosine(b, a)) == 0.0


def test_cosine_matches_numpy(rng):
    a = rng.normal(size=128).astype(np.float32)
    b = rng.normal(size=128).astype(np.float32)
    expected = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert float(d.cosine(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(expected, rel=1e-5)


def test_pairwise_l2sq_matches_loops(rng):
    q = rng.normal(size=(5, 24)).astype(np.float32)
    x = rng.normal(size=(17, 24)).astype(np.float32)
    got = np.asarray(d.pairwise_l2_squared(jnp.asarray(q), jnp.asarray(x)))
    for i in range(5):
        for j in range(17):
            assert got[i, j] == pytest.approx(np_l2sq(q[i], x[j]), rel=1e-4, abs=1e-4)


def test_pairwise_cosine_zero_rows(rng):
    q = np.zeros((2, 8), np.float32)
    q[1] = rng.normal(size=8)
    x = rng.normal(size=(4, 8)).astype(np.float32)
    x[2] = 0.0
    got = np.asarray(d.pairwise_cosine(jnp.asarray(q), jnp.asarray(x)))
    assert np.all(got[0] == 0.0)
    assert got[1, 2] == 0.0


def test_brute_force_topk_l2(rng):
    x = rng.normal(size=(50, 8)).astype(np.float32)
    q = rng.normal(size=(3, 8)).astype(np.float32)
    valid = np.ones(50, bool)
    valid[10] = False
    scores, dists, idx = topk.brute_force_topk(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), 5, "L2"
    )
    idx = np.asarray(idx)
    for i in range(3):
        full = np.linalg.norm(x - q[i], axis=1)
        full[10] = np.inf
        expect = np.argsort(full)[:5]
        assert list(idx[i]) == list(expect)
        assert np.allclose(np.asarray(dists)[i], full[expect], rtol=1e-4)
        assert np.allclose(np.asarray(scores)[i], -full[expect], rtol=1e-4)


def test_brute_force_topk_masks_everything():
    x = np.ones((4, 3), np.float32)
    q = np.zeros((1, 3), np.float32)
    scores, dists, idx = topk.brute_force_topk(
        jnp.asarray(q), jnp.asarray(x), jnp.zeros(4, bool), 2, "L2"
    )
    assert np.all(np.asarray(idx) == -1)
    assert np.all(np.isinf(np.asarray(dists)))


def test_merge_topk():
    s1 = jnp.asarray([[3.0, 1.0]])
    i1 = jnp.asarray([[10, 11]], dtype=jnp.int32)
    s2 = jnp.asarray([[2.5, 0.5]])
    i2 = jnp.asarray([[20, 21]], dtype=jnp.int32)
    scores, ids = topk.merge_topk([s1, s2], [i1, i2], 3)
    assert list(np.asarray(ids)[0]) == [10, 20, 11]
    assert list(np.asarray(scores)[0]) == [3.0, 2.5, 1.0]
