"""Round-robin segment placement across the 8-device virtual mesh: segments
live on different devices, queries dispatch per device, results merge on host."""

import jax
import numpy as np
import pytest

from vectorsearch_tpu.config import VectorIndexConfig
from vectorsearch_tpu.core.index import VectorIndex
from vectorsearch_tpu.types import SegmentState

from tests.test_index_e2e import gaussian, run_builds


def test_round_robin_placement_and_query(storage, rng):
    assert len(jax.devices()) >= 4
    idx = VectorIndex.create_or_open(
        VectorIndexConfig(
            storage=storage, name="rr", dimension=8, max_segment_size=50,
            pq_m=4, pq_k=16, graph_degree=16, graph_build_breadth=64,
            device_placement="round_robin",
        )
    )
    x = gaussian(rng, 220)  # 4 sealed (50 each) + 1 active (20)
    gids = idx.add_all(x)
    run_builds(idx)

    devices = set()
    with idx.store.lock:
        for seg in idx.store.segments.values():
            devices.add(seg.device)
            if seg.state == SegmentState.SEALED:
                assert seg.vectors_dev.devices() == {seg.device}
    assert len(devices) >= 4  # spread across the mesh

    # queries touch every device, results merge correctly
    hits = 0
    res = idx.query_batch(x[:100], 10)
    for i, r in enumerate(res):
        if gids[i] in [s.gid for s in r]:
            hits += 1
    assert hits / 100 >= 0.9

    # deletes + resolve still work across devices
    idx.delete(gids[60])
    assert gids[60] not in [r.gid for r in idx.query(x[60], 50)]
    idx.close()


def test_per_device_build_locks(storage, rng):
    """Device-heavy builds serialize per DEVICE, not globally: segments on
    different chips build concurrently under round_robin placement."""
    from vectorsearch_tpu.core.build import SegmentBuildService

    d0, d1 = jax.devices()[0], jax.devices()[1]
    assert SegmentBuildService._compute_lock_for(d0) is (
        SegmentBuildService._compute_lock_for(d0)
    )
    assert SegmentBuildService._compute_lock_for(d0) is not (
        SegmentBuildService._compute_lock_for(d1)
    )

    # e2e: background worker threads + round_robin placement seal everything
    idx = VectorIndex.create_or_open(
        VectorIndexConfig(
            storage=storage, name="rrlocks", dimension=8, max_segment_size=40,
            pq_m=4, pq_k=16, graph_degree=8, graph_build_breadth=32,
            device_placement="round_robin", local_worker_threads=3,
        )
    )
    x = gaussian(rng, 170)  # 4 sealed + 1 active
    gids = idx.add_all(x)
    assert idx.await_indexing_complete(timeout=120)
    with idx.store.lock:
        sealed = [s for s in idx.store.segments.values()
                  if s.state == SegmentState.SEALED]
    assert len(sealed) == 4
    assert len({s.device for s in sealed}) >= 3
    res = idx.query_batch(x[:50], 10)
    hits = sum(1 for i, r in enumerate(res) if gids[i] in [s.gid for s in r])
    assert hits / 50 >= 0.9
    idx.close()


def test_round_robin_invalid_value(storage):
    with pytest.raises(ValueError, match="devicePlacement"):
        VectorIndexConfig(
            storage=storage, name="bad", dimension=8, pq_m=4, pq_k=16,
            device_placement="everywhere",
        )


def test_unified_search_returns_correct_results(storage, rng):
    """Opt-in unified cross-segment search: one disconnected graph, shared
    per-query budget — results stay correct (recall tradeoffs documented in
    ROADMAP.md)."""
    from vectorsearch_tpu.config import VectorIndexConfig
    from vectorsearch_tpu.core.index import VectorIndex
    from tests.test_index_e2e import run_builds

    idx = VectorIndex.create_or_open(
        VectorIndexConfig(
            storage=storage, name="uni", dimension=8, max_segment_size=60,
            pq_m=4, pq_k=16, graph_degree=16, graph_build_breadth=64,
            unified_search=True,
        )
    )
    x = gaussian(rng, 120)  # 2 sealed segments
    gids = idx.add_all(x)
    run_builds(idx)
    assert idx.store.segments[0].state == SegmentState.SEALED
    assert idx.store.segments[1].state == SegmentState.SEALED
    hits = 0
    res = idx.query_batch(x[:60], 10)
    for i, r in enumerate(res):
        assert r, i
        if r[0].gid == gids[i]:
            hits += 1
    assert hits / 60 >= 0.9
    # deletes respected through the unified path
    idx.delete(gids[5])
    assert gids[5] not in [r.gid for r in idx.query(x[5], 30)]
    idx.close()
