"""Metric-emission assertions (parity with the reference's in-memory OTel
tests, api/VectorIndexTest.java:58-65,645-662) + batcher behavior."""

import numpy as np
import pytest

from vectorsearch_tpu.core.batcher import QueryBatcher
from vectorsearch_tpu.utils.metrics import get_registry, reset_for_test

from tests.test_index_e2e import gaussian, make_index, run_builds


def test_query_metrics_emitted(storage, rng):
    reset_for_test()
    idx = make_index(storage, max_segment_size=50)
    x = gaussian(rng, 80)
    idx.add_all(x)
    run_builds(idx)
    m = get_registry()
    assert m.counter_value("vectorsearch.build.count") == 1
    assert len(m.histogram_values("vectorsearch.build.duration_ms")) == 1

    idx.query_batch(x[:4], 5)
    assert m.counter_value("vectorsearch.query.count") == 4
    assert len(m.histogram_values("vectorsearch.query.duration_ms")) == 1
    assert m.histogram_values("vectorsearch.query.segments_searched") == [2.0]
    assert m.histogram_values("vectorsearch.query.results_returned") == [5.0]
    idx.close()


def test_vacuum_and_compaction_metrics(storage, rng):
    reset_for_test()
    idx = make_index(storage, max_segment_size=30, vacuum_min_deleted_ratio=0.1,
                     compaction_min_fragmentation=0.0)
    x = gaussian(rng, 60)
    gids = idx.add_all(x)
    run_builds(idx)
    idx.delete_all(gids[:10])
    removed = idx.maintenance.vacuum_segment(0)
    assert removed == 10
    m = get_registry()
    assert m.counter_value("vectorsearch.vacuum.run") == 1
    assert m.counter_value("vectorsearch.vacuum.removed") == 10
    assert len(m.histogram_values("vectorsearch.vacuum.duration_ms")) >= 1

    assert idx.maintenance.mark_candidates_compacting([0, 1])
    assert idx.maintenance.compact_segments([0, 1]) is not None
    assert m.counter_value("vectorsearch.compaction.run") == 1
    idx.close()


def test_cache_gauges(storage, rng):
    reset_for_test()
    idx = make_index(storage, max_segment_size=40)
    x = gaussian(rng, 40)
    idx.add_all(x)
    run_builds(idx)
    idx.query(x[0], 3)  # prefetch: miss + load_success, then hits
    m = get_registry()
    cb = {"cache": "codebook"}
    assert m.counter_value("vectorsearch.cache.miss", cb) >= 1
    assert m.counter_value("vectorsearch.cache.load_success", cb) >= 1
    idx.query(x[1], 3)
    assert m.counter_value("vectorsearch.cache.hit", cb) >= 1
    idx.close()


def test_prefetch_sync_flag_accepted(storage, rng):
    # test-only synchronous prefetch mode (reference:
    # config/VectorIndexConfig.java:620-623): query must work and warm caches
    idx = make_index(storage, max_segment_size=40, prefetch_codebooks_sync=True)
    x = gaussian(rng, 40)
    gids = idx.add_all(x)
    run_builds(idx)
    assert idx.get_codebook_cache_size() == 0
    res = idx.query(x[3], 1)
    assert res[0].gid == gids[3]
    assert idx.get_codebook_cache_size() == 1
    idx.close()


def test_prefetch_disabled(storage, rng):
    idx = make_index(storage, max_segment_size=40, prefetch_codebooks_enabled=False)
    x = gaussian(rng, 40)
    gids = idx.add_all(x)
    run_builds(idx)
    res = idx.query(x[3], 1)  # codebook still loads lazily on use
    assert res[0].gid == gids[3]
    idx.close()


def test_query_batcher_coalesces(storage, rng):
    idx = make_index(storage, max_segment_size=100)
    x = gaussian(rng, 60)
    gids = idx.add_all(x)
    b = QueryBatcher(idx, max_batch=16, max_wait_ms=20.0)
    futs = [b.submit(x[i], 3) for i in range(20)]
    for i, f in enumerate(futs):
        res = f.result(timeout=60)
        assert res[0].gid == gids[i]
    b.close()
    with pytest.raises(RuntimeError):
        b.submit(x[0], 3)
    idx.close()


def test_query_batcher_separates_k(storage, rng):
    idx = make_index(storage)
    x = gaussian(rng, 20)
    gids = idx.add_all(x)
    b = QueryBatcher(idx, max_batch=8, max_wait_ms=5.0)
    f1 = b.submit(x[0], 1)
    f2 = b.submit(x[1], 5)
    assert len(f1.result(timeout=60)) == 1
    assert len(f2.result(timeout=60)) == 5
    b.close()
    idx.close()


def test_otel_bridge_and_spans(storage, rng):
    """The registry mirrors to the global OTel meter and the four reference
    spans exist (no-op without an SDK — reference README.md:94-96); span()
    records exceptions and re-raises."""
    from vectorsearch_tpu.utils import metrics as M

    # span: plain passage and exception passage
    with M.span("vectorsearch.query", {"a": "b"}):
        pass
    with pytest.raises(ValueError):
        with M.span("vectorsearch.build"):
            raise ValueError("boom")

    # mirroring path exercises otel instrument creation (no SDK: no-op)
    M.get_registry().inc("vectorsearch.query.count", attrs={"x": "y"})
    M.get_registry().record("vectorsearch.query.duration_ms", 1.5)
