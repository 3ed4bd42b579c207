"""PQ pipeline tests (parity with pq/PqTrainerTest.java, pq/PqEncoderTest.java
and the ADC math of fdb/FdbVectorIndex.java:1057-1079)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vectorsearch_tpu.ops import pq


def make_clustered(rng, n_clusters=4, per=25, d=8, spread=0.05):
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32) * 3
    pts = np.concatenate(
        [c + spread * rng.normal(size=(per, d)).astype(np.float32) for c in centers]
    )
    return pts.astype(np.float32), centers


def test_pq_train_shapes(rng):
    x = rng.normal(size=(100, 16)).astype(np.float32)
    valid = np.ones(100, bool)
    cb = pq.pq_train(jnp.asarray(x), jnp.asarray(valid), m=4, k=8, iters=5,
                     key=jax.random.PRNGKey(42))
    assert cb.shape == (4, 8, 4)
    assert np.all(np.isfinite(np.asarray(cb)))


def test_pq_train_recovers_clusters(rng):
    # 1-subspace k-means on well-separated clusters should place centroids
    # near the true centers.
    x, centers = make_clustered(rng, n_clusters=4, per=50, d=8)
    cb = pq.pq_train(jnp.asarray(x), jnp.ones(len(x), bool), m=1, k=4, iters=10,
                     key=jax.random.PRNGKey(0))
    cb = np.asarray(cb)[0]  # [4, 8]
    for c in centers:
        best = np.min(np.linalg.norm(cb - c, axis=1))
        assert best < 0.2, f"centroid missing for center, dist={best}"


def test_pq_train_ignores_invalid_rows(rng):
    x, _ = make_clustered(rng, n_clusters=2, per=30, d=4)
    # Append wild outliers marked invalid — they must not influence centroids.
    outliers = 1000.0 * np.ones((20, 4), np.float32)
    allx = np.concatenate([x, outliers])
    valid = np.concatenate([np.ones(len(x), bool), np.zeros(20, bool)])
    cb = pq.pq_train(jnp.asarray(allx), jnp.asarray(valid), m=1, k=2, iters=8,
                     key=jax.random.PRNGKey(1))
    assert np.all(np.abs(np.asarray(cb)) < 100.0)


def test_pq_encode_nearest_centroid(rng):
    d, m, k = 8, 2, 4
    cb = rng.normal(size=(m, k, d // m)).astype(np.float32)
    x = rng.normal(size=(20, d)).astype(np.float32)
    codes = np.asarray(pq.pq_encode(jnp.asarray(x), jnp.asarray(cb), jnp.ones(20, bool)))
    assert codes.shape == (20, m)
    assert codes.dtype == np.uint8
    for i in range(20):
        for s in range(m):
            subv = x[i, s * 4 : (s + 1) * 4]
            dists = np.linalg.norm(cb[s] - subv, axis=1)
            assert codes[i, s] == np.argmin(dists)


def test_build_lut_matches_direct(rng):
    d, m, k = 8, 4, 3
    cb = rng.normal(size=(m, k, d // m)).astype(np.float32)
    q = rng.normal(size=(2, d)).astype(np.float32)
    lut = np.asarray(pq.build_lut(jnp.asarray(q), jnp.asarray(cb)))
    assert lut.shape == (2, m, k)
    for qi in range(2):
        for s in range(m):
            sub_q = q[qi, s * 2 : (s + 1) * 2]
            for c in range(k):
                expect = float(np.sum((sub_q - cb[s, c]) ** 2))
                assert lut[qi, s, c] == pytest.approx(expect, rel=1e-4, abs=1e-5)


def test_adc_scan_equals_lut_sum(rng):
    d, m, k, n = 8, 4, 4, 37
    cb = rng.normal(size=(m, k, d // m)).astype(np.float32)
    codes = rng.integers(0, k, size=(n, m)).astype(np.uint8)
    q = rng.normal(size=(3, d)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[5] = False
    lut = pq.build_lut(jnp.asarray(q), jnp.asarray(cb))
    approx = np.asarray(pq.adc_scan(lut, jnp.asarray(codes), jnp.asarray(valid)))
    lut_np = np.asarray(lut)
    for qi in range(3):
        for i in range(n):
            if i == 5:
                assert np.isinf(approx[qi, i])
                continue
            expect = sum(lut_np[qi, s, codes[i, s]] for s in range(m))
            assert approx[qi, i] == pytest.approx(expect, rel=1e-5)


def test_adc_scan_chunked_path(rng):
    d, m, k, n = 4, 2, 4, 100
    cb = rng.normal(size=(m, k, d // m)).astype(np.float32)
    codes = rng.integers(0, k, size=(n, m)).astype(np.uint8)
    q = rng.normal(size=(2, d)).astype(np.float32)
    lut = pq.build_lut(jnp.asarray(q), jnp.asarray(cb))
    full = np.asarray(pq.adc_scan(lut, jnp.asarray(codes), jnp.ones(n, bool)))
    chunked = np.asarray(pq.adc_scan(lut, jnp.asarray(codes), jnp.ones(n, bool), chunk=32))
    assert np.allclose(full, chunked)


def test_adc_scan_scores_negated_with_mask(rng):
    """adc_scan_scores_auto = -adc_scan with -inf at invalid rows; on the CPU
    backend it takes the XLA fallback (the Pallas kernel additionally pads
    the width with -inf columns — consumers only take approx_max_k and mask
    on > -inf, so padding is unobservable)."""
    d, m, k, n = 8, 4, 4, 37
    cb = rng.normal(size=(m, k, d // m)).astype(np.float32)
    codes = rng.integers(0, k, size=(n, m)).astype(np.uint8)
    q = rng.normal(size=(3, d)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[5] = False
    lut = pq.build_lut(jnp.asarray(q), jnp.asarray(cb))
    ref = np.asarray(pq.adc_scan(lut, jnp.asarray(codes), jnp.asarray(valid)))
    neg = np.asarray(
        pq.adc_scan_scores_auto(lut, jnp.asarray(codes), jnp.asarray(valid))
    ).astype(np.float32)
    fin = np.isfinite(ref)
    assert np.allclose(neg[:, :n][fin], -ref[fin], rtol=1e-2)
    assert np.all(neg[:, 5] == -np.inf)
    assert np.all(neg[:, n:] == -np.inf)  # padded columns, if any


def test_adc_approximates_true_distance(rng):
    # With K=N exact codebooks (one centroid per point), ADC distance equals
    # the true squared L2 distance.
    d, m = 8, 4
    x = rng.normal(size=(16, d)).astype(np.float32)
    cb = x.reshape(16, m, d // m).transpose(1, 0, 2)  # [M, 16, sub] — centroids = points
    codes = np.asarray(
        pq.pq_encode(jnp.asarray(x), jnp.asarray(cb), jnp.ones(16, bool))
    )
    q = rng.normal(size=(1, d)).astype(np.float32)
    lut = pq.build_lut(jnp.asarray(q), jnp.asarray(cb))
    approx = np.asarray(pq.adc_scan(lut, jnp.asarray(codes), jnp.ones(16, bool)))[0]
    true = np.sum((x - q[0]) ** 2, axis=1)
    assert np.allclose(approx, true, rtol=1e-3, atol=1e-3)


def test_zero_codebook():
    cb = pq.zero_codebook(4, 16, 2)
    assert cb.shape == (4, 16, 2)
    assert np.all(np.asarray(cb) == 0.0)


def test_jaxcache_enable_branches(tmp_path, monkeypatch):
    """enable_persistent_cache: explicit path, env default, and the
    VSTPU_COMPILE_CACHE=off opt-out (coverage r4: the module only ran on
    the TPU bench path before)."""
    import jax

    from vectorsearch_tpu.utils import jaxcache

    before = jax.config.jax_compilation_cache_dir
    try:
        jaxcache.enable_persistent_cache(str(tmp_path / "c"))
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "c")
        monkeypatch.setenv("VSTPU_COMPILE_CACHE", str(tmp_path / "d"))
        jaxcache.enable_persistent_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "d")
        monkeypatch.setenv("VSTPU_COMPILE_CACHE", "off")
        jaxcache.enable_persistent_cache(str(tmp_path / "e"))  # no-op
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "d")
    finally:
        jax.config.update("jax_compilation_cache_dir", before)
