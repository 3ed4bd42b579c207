"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4: the mesh is the cluster simulator)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vectorsearch_tpu.ops import pq as pq_ops
from vectorsearch_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual devices"
    return pmesh.make_mesh(jax.devices()[:8])


def test_sharded_brute_force_matches_single(mesh8, rng):
    n, d, k = 256, 16, 10
    x = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(4, d)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[17] = False
    xs = pmesh.shard_rows(mesh8, jnp.asarray(x))
    vs = pmesh.shard_rows(mesh8, jnp.asarray(valid))
    fn = pmesh.sharded_brute_force_topk(mesh8, k)
    scores, dists, idx = fn(jnp.asarray(q), xs, vs)
    idx = np.asarray(idx)
    for i in range(4):
        full = np.linalg.norm(x - q[i], axis=1)
        full[17] = np.inf
        expect = np.argsort(full)[:k]
        assert list(idx[i]) == list(expect)
        assert np.allclose(np.asarray(dists)[i], full[expect], rtol=1e-4)


def test_sharded_adc_matches_single(mesh8, rng):
    n, d, m, kc, k = 256, 8, 4, 16, 12
    x = rng.normal(size=(n, d)).astype(np.float32)
    cb = rng.normal(size=(m, kc, d // m)).astype(np.float32)
    codes = np.asarray(
        pq_ops.pq_encode(jnp.asarray(x), jnp.asarray(cb), jnp.ones(n, bool))
    )
    q = rng.normal(size=(3, d)).astype(np.float32)
    lut = pq_ops.build_lut(jnp.asarray(q), jnp.asarray(cb))
    # single-device reference
    approx = np.asarray(pq_ops.adc_scan(lut, jnp.asarray(codes), jnp.ones(n, bool)))
    cs = pmesh.shard_rows(mesh8, jnp.asarray(codes))
    vs = pmesh.shard_rows(mesh8, jnp.ones(n, bool))
    fn = pmesh.sharded_adc_topk(mesh8, k)
    d_out, i_out = fn(lut, cs, vs)
    i_out = np.asarray(i_out)
    for qi in range(3):
        expect = np.argsort(approx[qi])[:k]
        got = i_out[qi]
        # top-k sets match (ties may reorder)
        assert np.allclose(
            np.sort(approx[qi][expect]), np.sort(np.asarray(d_out)[qi]), rtol=1e-4
        )


def test_sharded_pq_train_quality(mesh8, rng):
    # distributed k-means finds the 4 well-separated cluster centers
    centers = rng.normal(size=(4, 8)).astype(np.float32) * 3
    pts = np.concatenate(
        [c + 0.05 * rng.normal(size=(64, 8)).astype(np.float32) for c in centers]
    )
    perm = rng.permutation(len(pts))
    pts = pts[perm]
    xs = pmesh.shard_rows(mesh8, jnp.asarray(pts))
    vs = pmesh.shard_rows(mesh8, jnp.ones(len(pts), bool))
    fn = pmesh.sharded_pq_train(mesh8, m=1, k=4, iters=10)
    cb = np.asarray(fn(xs, vs, jax.random.PRNGKey(0)))[0]
    for c in centers:
        assert np.min(np.linalg.norm(cb - c, axis=1)) < 0.2


def test_sharded_encode_matches_single(mesh8, rng):
    n, d, m, kc = 128, 8, 2, 8
    x = rng.normal(size=(n, d)).astype(np.float32)
    cb = rng.normal(size=(m, kc, d // m)).astype(np.float32)
    single = np.asarray(
        pq_ops.pq_encode(jnp.asarray(x), jnp.asarray(cb), jnp.ones(n, bool))
    )
    fn = pmesh.sharded_pq_encode(mesh8)
    sharded = np.asarray(
        fn(pmesh.shard_rows(mesh8, jnp.asarray(x)), jnp.asarray(cb),
           pmesh.shard_rows(mesh8, jnp.ones(n, bool)))
    )
    assert np.array_equal(single, sharded)


def test_pad_rows_to_shards():
    a = np.ones((10, 3))
    p = pmesh.pad_rows_to_shards(a, 8)
    assert p.shape == (16, 3)
    assert pmesh.pad_rows_to_shards(np.ones((16, 3)), 8).shape == (16, 3)
