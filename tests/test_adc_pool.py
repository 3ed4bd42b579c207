"""Fused ADC pool kernel (ops/pallas/adc.adc_pool_pallas) vs the XLA ADC
scan reference, in Pallas interpret mode on the CPU backend. The kernel
replaces scores-scan + approx_max_k on the flat sealed path
(fdb/FdbVectorIndex.java:744-784's ADC scan + candidate selection) without
ever materializing the [Q, N] score matrix."""

import numpy as np
import pytest

import jax.numpy as jnp

from vectorsearch_tpu.ops import pq as pq_ops
from vectorsearch_tpu.ops.pallas import adc as pa


def _setup(rng, n, d=64, m=8, k=128, qn=12):
    cb = rng.normal(size=(m, k, d // m)).astype(np.float32)
    codes = rng.integers(0, k, size=(n, m)).astype(np.uint8)
    q = rng.normal(size=(qn, d)).astype(np.float32)
    return jnp.asarray(cb), jnp.asarray(codes), jnp.asarray(q)


def _pool(lut, codes, valid, ef, tile=512):
    neg, idx = pa.adc_pool_pallas(
        lut, codes, jnp.asarray(valid), ef_buf=ef, tile_n=tile,
        interpret=True,
    )
    return np.asarray(neg), np.asarray(idx)


def test_pool_contains_true_adc_topk(rng):
    n = 4096 + 300  # non-divisible tail tile
    cb, codes, q = _setup(rng, n)
    valid = np.ones(n, bool)
    lut = pq_ops.build_lut(q, cb)
    ref = np.asarray(pq_ops.adc_scan(lut, codes, jnp.asarray(valid)))
    truth = np.argsort(ref, axis=1)[:, :10]
    neg, idx = _pool(lut, codes, valid, 64)
    hits = np.mean(
        [len(set(idx[i]) & set(truth[i])) / 10 for i in range(len(truth))]
    )
    assert hits >= 0.9, hits
    # returned scores are the (negated) ADC distances of the returned rows,
    # to bf16 matmul tolerance
    for i in range(len(truth)):
        got = -neg[i][idx[i] >= 0]
        want = ref[i][idx[i][idx[i] >= 0]]
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_invalid_rows_and_tail_never_returned(rng):
    n = 2048 + 77
    cb, codes, q = _setup(rng, n)
    valid = np.ones(n, bool)
    valid[:7] = False
    neg, idx = _pool(lut=pq_ops.build_lut(q, cb), codes=codes, valid=valid,
                     ef=32)
    returned = set(idx.ravel().tolist()) - {-1}
    assert not (returned & set(range(7)))
    assert all(0 <= v < n for v in returned)


def test_mostly_dead_pool_pads_minus_one(rng):
    n = 1024
    cb, codes, q = _setup(rng, n)
    valid = np.zeros(n, bool)
    valid[:3] = True
    neg, idx = _pool(pq_ops.build_lut(q, cb), codes, valid, 16)
    returned = set(idx.ravel().tolist()) - {-1}
    assert returned <= {0, 1, 2}
    assert (idx == -1).any()
    assert (neg[idx == -1] == -np.inf).all()


def test_use_fused_gating():
    # CPU backend in tests -> off regardless of shape
    assert not pa.use_fused_adc_pool(1_000_000, 16, 256, 128, 512)


def test_auto_pool_tile_shapes():
    """Auto-picked (tile, chunk) must honor chunk % bins == 0 and
    tile % chunk == 0 wherever a tile is offered; shapes that only fit
    step-overhead-bound tiny tiles return None (callers fall back)."""
    offered = 0
    for qp in (128, 512):
        for mk in (2048, 4096, 5120):
            tc = pa._auto_pool_tile(qp, mk, None)
            if tc is None:
                continue
            offered += 1
            t, c = tc
            bins = pa._BINS * max(1, t // 1024)
            assert c % bins == 0
            assert t % c == 0
    assert offered >= 5  # the production shapes all get a real tile
    # the serving shapes pick the big tile; glove's wider LUT steps down
    assert pa._auto_pool_tile(512, 4096, None) == (2048, 256)
    assert pa._auto_pool_tile(512, 5120, None) == (1024, 128)


def test_requested_tile_invariants_enforced():
    """Explicit tile_n must yield chunk % bins == 0 and tile % chunk == 0 —
    e.g. 2560 previously produced chunk=320 vs bins=256, silently skipping
    columns and corrupting global row ids (ADVICE r3 #4)."""
    for req in (2560, 2048, 1024, 512, 3072, 4096):
        t, c = pa._auto_pool_tile(512, 4096, req)
        bins = pa._BINS * max(1, t // 1024)
        assert t == req and c % bins == 0 and t % c == 0, (req, t, c)
    with pytest.raises(ValueError):
        pa._auto_pool_tile(512, 4096, 2176)  # not a multiple of its bins (256)


def test_requested_nonstandard_tile_returns_correct_ids(rng):
    """End-to-end guard for the ADVICE r3 #4 corruption: a tile that is a
    non-power-of-two bins multiple (2560) must return the same pool quality
    and in-range ids as the auto tile."""
    n = 2560 * 2 + 123
    cb, codes, q = _setup(rng, n)
    valid = np.ones(n, bool)
    lut = pq_ops.build_lut(q, cb)
    ref = np.asarray(pq_ops.adc_scan(lut, codes, jnp.asarray(valid)))
    truth = np.argsort(ref, axis=1)[:, :10]
    neg, idx = _pool(lut, codes, valid, 64, tile=2560)
    returned = set(idx.ravel().tolist()) - {-1}
    assert all(0 <= v < n for v in returned)
    hits = np.mean(
        [len(set(idx[i]) & set(truth[i])) / 10 for i in range(len(truth))]
    )
    assert hits >= 0.9, hits
    # ids must address the rows whose ADC distance matches the pool score
    for i in range(len(truth)):
        got = -neg[i][idx[i] >= 0]
        want = ref[i][idx[i][idx[i] >= 0]]
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_adc_fold_merges_tiles(rng):
    """Output-revisit folding on the ADC pool: same winners as a post-hoc
    merge of the unfolded pool, ids intact across tile boundaries (the
    exact-kernel fold test's ADC twin)."""
    n = 512 * 3 + 77
    cb, codes, q = _setup(rng, n)
    valid = np.ones(n, bool)
    valid[40:60] = False
    lut = pq_ops.build_lut(q, cb)
    s1, i1 = pa.adc_bin_pool(lut, codes, jnp.asarray(valid), tile_n=512,
                             interpret=True, fold=1)
    s2, i2 = pa.adc_bin_pool(lut, codes, jnp.asarray(valid), tile_n=512,
                             interpret=True, fold=2)
    s1, i1, s2, i2 = map(np.asarray, (s1, i1, s2, i2))
    bins = 128
    assert s2.shape[1] * 2 == s1.shape[1]
    for j in range(s2.shape[1] // bins):
        a = s1[:, (2 * j) * bins : (2 * j + 1) * bins]
        hi = (2 * j + 2) * bins
        b = (s1[:, (2 * j + 1) * bins : hi]
             if (2 * j + 1) * bins < s1.shape[1]
             else np.full_like(a, -np.inf))
        want = np.maximum(a, b)
        np.testing.assert_array_equal(s2[:, j * bins : (j + 1) * bins], want)
    returned = set(i2[np.isfinite(s2)].ravel().tolist())
    assert not (returned & set(range(40, 60)))
    assert all(0 <= v < n for v in returned)


def test_adc_scan_pallas_interpret_matches_xla(rng):
    """The full-scan kernels (fast bf16, precise hi/lo, fused scores) in
    interpret mode vs the XLA adc_scan reference — these compiled-only
    paths were previously untested off-TPU (coverage r4)."""
    n = 512 + 130  # non-divisible tail
    cb, codes, q = _setup(rng, n, qn=8)
    valid = np.ones(n, bool)
    valid[5:9] = False
    lut = pq_ops.build_lut(q, cb)
    ref = np.asarray(pq_ops.adc_scan(lut, codes, jnp.asarray(valid)))

    fast = np.asarray(pa.adc_scan_pallas(
        lut, codes, jnp.asarray(valid), tile_n=128, interpret=True))
    assert fast.shape == ref.shape
    np.testing.assert_allclose(fast[:, valid], ref[:, valid], rtol=2e-2,
                               atol=2e-2)
    assert np.isinf(fast[:, ~valid]).all()

    precise = np.asarray(pa.adc_scan_pallas(
        lut, codes, jnp.asarray(valid), tile_n=128, interpret=True,
        precise=True))
    np.testing.assert_allclose(precise[:, valid], ref[:, valid], rtol=2e-4,
                               atol=2e-4)
    # precise (hi/lo two-pass) must beat bf16 single-pass accuracy
    err_fast = np.abs(fast[:, valid] - ref[:, valid]).mean()
    err_precise = np.abs(precise[:, valid] - ref[:, valid]).mean()
    assert err_precise < err_fast

    neg = np.asarray(pa.adc_scan_scores_pallas(
        lut, codes, jnp.asarray(valid), tile_n=128, interpret=True))
    assert neg.shape[1] >= n and neg.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        -neg[:, :n][:, valid].astype(np.float32), ref[:, valid],
        rtol=2e-2, atol=2e-2,
    )
    assert np.isneginf(neg[:, :n][:, ~valid].astype(np.float32)).all()
    assert np.isneginf(neg[:, n:].astype(np.float32)).all()  # tile padding
