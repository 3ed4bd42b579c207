"""End-to-end API tests (parity with api/VectorIndexTest.java): insert -> seal
-> query self-recall gates, rotation at threshold, deletes, gid ordering,
WRITING invisibility, reopen validation."""

import numpy as np
import pytest

from vectorsearch_tpu.config import VectorIndexConfig
from vectorsearch_tpu.core.index import VectorIndex
from vectorsearch_tpu.core.build import SegmentBuildService
from vectorsearch_tpu.params import Mode, SearchParams
from vectorsearch_tpu.types import SegmentState


def make_index(storage, name="idx", **kw):
    base = dict(
        storage=storage, name=name, dimension=8, metric="L2",
        max_segment_size=100, pq_m=4, pq_k=16, graph_degree=16,
        graph_build_breadth=64, graph_alpha=1.2, oversample=2,
        local_worker_threads=0, local_maintenance_worker_threads=0,
    )
    base.update(kw)
    return VectorIndex.create_or_open(VectorIndexConfig(**base))


def gaussian(rng, n, d=8):
    return rng.normal(size=(n, d)).astype(np.float32)


def test_add_query_active_segment(storage, rng):
    idx = make_index(storage)
    x = gaussian(rng, 20)
    gids = idx.add_all(x, [f"p{i}".encode() for i in range(20)])
    assert gids == list(range(20))
    res = idx.query(x[3], 1)
    assert res[0].gid == 3
    assert res[0].payload == b"p3"
    assert res[0].distance == pytest.approx(0.0, abs=1e-4)
    assert res[0].score == pytest.approx(0.0, abs=1e-4)
    idx.close()


def test_rotation_at_threshold_enqueues_build(storage, rng):
    idx = make_index(storage, max_segment_size=10)
    idx.add_all(gaussian(rng, 25))
    with idx.store.lock:
        states = {sid: s.state for sid, s in idx.store.segments.items()}
    # 25 rows / cap 10 -> segments 0,1 full (PENDING), 2 ACTIVE with 5 rows
    assert states[0] == SegmentState.PENDING
    assert states[1] == SegmentState.PENDING
    assert states[2] == SegmentState.ACTIVE
    assert idx.store.segments[2].meta.count == 5
    # build tasks enqueued idempotently
    assert idx.build_queue.has_visible_unclaimed_tasks()
    idx.close()


def test_strict_cap_rotation_exact_fill(storage, rng):
    idx = make_index(storage, max_segment_size=10)
    idx.add_all(gaussian(rng, 10))
    # exactly-full segment rotates immediately (strict cap)
    assert idx.store.segments[0].state == SegmentState.PENDING
    assert idx.store.current_segment == 1
    idx.close()


def test_gid_ordering_across_rotations(storage, rng):
    idx = make_index(storage, max_segment_size=7)
    gids = idx.add_all(gaussian(rng, 23))
    assert gids == list(range(23))
    locs = idx.resolve_ids(gids)
    assert locs[0] == (0, 0)
    assert locs[7] == (1, 0)
    assert locs[22] == (3, 1)
    idx.close()


def run_builds(idx):
    """Deterministic sealing without worker pools (reference test pattern:
    api/VectorIndexTest.java:232-239 invokes SegmentBuildService directly)."""
    while idx.build_queue.has_visible_unclaimed_tasks():
        claim = idx.build_queue.await_and_claim(timeout=1.0)
        if claim is None:
            break
        idx.build_service.build(claim.payload.seg_id)
        claim.complete()


def test_self_recall_200_vectors(storage, rng):
    """Insert -> seal -> query self-recall@10 >= 0.9 on 200 Gaussian vectors
    (reference floor: api/VectorIndexTest.java:212-258)."""
    idx = make_index(storage, max_segment_size=100)
    x = gaussian(rng, 200)
    gids = idx.add_all(x)
    run_builds(idx)
    with idx.store.lock:
        sealed = [s.seg_id for s in idx.store.segments.values()
                  if s.state == SegmentState.SEALED]
    assert len(sealed) == 2

    hits = 0
    for i in range(200):
        res = idx.query(x[i], 10)
        if gids[i] in [r.gid for r in res]:
            hits += 1
    recall = hits / 200
    assert recall >= 0.9, f"self-recall@10 = {recall}"
    idx.close()


def test_self_recall_1000_vectors(storage, rng):
    idx = make_index(storage, max_segment_size=500)
    x = gaussian(rng, 1000)
    gids = idx.add_all(x)
    run_builds(idx)
    qs = x[:100]
    batches = idx.query_batch(qs, 10)
    hits = sum(1 for i, res in enumerate(batches) if gids[i] in [r.gid for r in res])
    recall = hits / 100
    assert recall >= 0.9, f"self-recall@10 = {recall}"
    idx.close()


def test_flat_pool_dominates_graph_pool(storage, rng):
    """sealed_search_mode=flat (the default) must recall at least as well as
    the graph traversal at equal ef: the flat pool is the GLOBAL ADC top-ef
    while the traversal ranks a visited subset by the same ADC distances."""
    x = gaussian(rng, 300)
    hits = {}
    for mode in ("flat", "graph"):
        idx = make_index(storage, name=f"fl-{mode}", max_segment_size=150,
                         sealed_search_mode=mode)
        gids = idx.add_all(x)
        run_builds(idx)
        res = idx.query_batch(x[:150], 10)
        hits[mode] = sum(
            1 for i, r in enumerate(res) if gids[i] in [s.gid for s in r]
        )
        # deletes respected through this path
        victim = idx.query(x[20], 1)[0].gid
        idx.delete(victim)
        assert victim not in [r.gid for r in idx.query(x[20], 20)]
        idx.close()
    assert hits["flat"] >= hits["graph"] >= 135  # 0.9 floor on 150


def test_sealed_search_mode_validation(storage):
    with pytest.raises(ValueError, match="sealedSearchMode"):
        VectorIndexConfig(
            storage=storage, name="bad", dimension=8, pq_m=4, pq_k=16,
            sealed_search_mode="hybrid",
        )


def test_beam_mode_uses_graph_even_in_flat_config(storage, rng):
    """Mode.BEAM is a traversal concept: it must keep working (and warning)
    under the flat default."""
    idx = make_index(storage, max_segment_size=50)
    x = gaussian(rng, 60)
    gids = idx.add_all(x)
    run_builds(idx)
    params = SearchParams(mode=Mode.BEAM, max_iters=4, beam_width=16,
                          ef_search=40)
    res = idx.query(x[7], 10, params)
    assert gids[7] in [r.gid for r in res]
    idx.close()


def test_query_batch_arrays_matches_object_api(storage, rng):
    """query_batch_arrays (the zero-object serving API) returns the same
    gids/scores as query_batch, with -1/-inf/inf padding for empty slots."""
    idx = make_index(storage, max_segment_size=60)
    x = gaussian(rng, 100)
    gids = idx.add_all(x)
    run_builds(idx)
    obj = idx.query_batch(x[:20], 5)
    ga, sa, da = idx.query_batch_arrays(x[:20], 5)
    assert ga.shape == (20, 5) and sa.shape == (20, 5) and da.shape == (20, 5)
    for i in range(20):
        got = [int(g) for g in ga[i] if g >= 0]
        assert got == [r.gid for r in obj[i]]
        assert sa[i][0] == pytest.approx(obj[i][0].score, abs=1e-5)
        assert da[i][0] == pytest.approx(obj[i][0].distance, abs=1e-5)
    # empty index: fully padded
    idx2 = make_index(storage, name="empty-arrays")
    ga, sa, da = idx2.query_batch_arrays(x[:3], 4)
    assert (ga == -1).all() and (sa == -np.inf).all() and (da == np.inf).all()
    idx2.close()
    idx.close()


def test_query_merges_brute_force_and_sealed(storage, rng):
    idx = make_index(storage, max_segment_size=50)
    x = gaussian(rng, 80)  # seg0 sealed-able (50), seg1 ACTIVE (30)
    gids = idx.add_all(x)
    run_builds(idx)
    assert idx.store.segments[0].state == SegmentState.SEALED
    assert idx.store.segments[1].state == SegmentState.ACTIVE
    # nearest of a vector in each segment must be itself
    for i in (5, 70):
        res = idx.query(x[i], 1)
        assert res[0].gid == gids[i]
    idx.close()


def test_delete_removes_from_results(storage, rng):
    idx = make_index(storage)
    x = gaussian(rng, 30)
    gids = idx.add_all(x)
    res = idx.query(x[4], 1)
    assert res[0].gid == gids[4]
    idx.delete(gids[4])
    res = idx.query(x[4], 30)
    assert gids[4] not in [r.gid for r in res]
    # gid mappings cleared
    assert idx.resolve_ids([gids[4]]) == [(-1, -1)]
    idx.close()


def test_delete_in_sealed_segment_filtered_at_rerank(storage, rng):
    idx = make_index(storage, max_segment_size=50)
    x = gaussian(rng, 50)
    gids = idx.add_all(x)
    run_builds(idx)
    assert idx.store.segments[0].state == SegmentState.SEALED
    idx.delete_all(gids[:5])
    res = idx.query(x[2], 50)
    got = [r.gid for r in res]
    assert not (set(gids[:5]) & set(got))
    idx.close()


def test_scores_l2_convention(storage, rng):
    idx = make_index(storage)
    x = gaussian(rng, 10)
    idx.add_all(x)
    res = idx.query(x[0], 3)
    for r in res:
        assert r.score == pytest.approx(-r.distance, rel=1e-5)
    assert res[0].score >= res[1].score >= res[2].score
    idx.close()


def test_scores_cosine_convention(storage, rng):
    idx = make_index(storage, metric="COSINE")
    x = gaussian(rng, 10)
    idx.add_all(x)
    res = idx.query(x[0], 3)
    for r in res:
        assert r.distance == pytest.approx(1.0 - r.score, rel=1e-5)
    assert res[0].score == pytest.approx(1.0, abs=1e-4)  # self-similarity
    idx.close()


def test_normalize_on_read_cosine(storage, rng):
    idx = make_index(storage, metric="COSINE", max_segment_size=50)
    x = gaussian(rng, 50)
    gids = idx.add_all(x)
    run_builds(idx)
    p = SearchParams.defaults(5, 2).replace(normalize_on_read=True)
    res = idx.query(x[7], 5, p)
    assert res[0].gid == gids[7]
    idx.close()


def test_beam_mode_works_and_warns_once(storage, rng, caplog):
    idx = make_index(storage, max_segment_size=50)
    x = gaussian(rng, 50)
    gids = idx.add_all(x)
    run_builds(idx)
    p = SearchParams.of(64, 8, 6, mode=Mode.BEAM)
    import logging

    with caplog.at_level(logging.WARNING, logger="vectorsearch_tpu.index"):
        r1 = idx.query(x[3], 5, p)
        r2 = idx.query(x[4], 5, p)
    warns = [r for r in caplog.records if "deprecated" in r.message]
    assert len(warns) == 1  # warn-once
    assert r1[0].gid == gids[3]
    idx.close()


def test_random_pivots_deterministic(storage, rng):
    from vectorsearch_tpu.params import SeedStrategy

    idx = make_index(storage, max_segment_size=50)
    x = gaussian(rng, 50)
    gids = idx.add_all(x)
    run_builds(idx)
    p = SearchParams.defaults(5, 2).replace(seed_strategy=SeedStrategy.RANDOM_PIVOTS)
    r1 = idx.query(x[9], 5, p)
    r2 = idx.query(x[9], 5, p)
    assert [r.gid for r in r1] == [r.gid for r in r2]  # deterministic
    assert r1[0].gid == gids[9]
    idx.close()


def test_writing_segment_invisible(storage, rng):
    """WRITING segments are skipped by search
    (reference: fdb/SearchIgnoresWritingSegmentTest.java)."""
    idx = make_index(storage)
    x = gaussian(rng, 20)
    idx.add_all(x)
    # inject a WRITING segment holding a perfect-match vector
    with idx.store.lock:
        wid = idx.store.max_segment_id + 1
        idx.store.max_segment_id = wid
        seg = idx.store._new_segment(wid, SegmentState.WRITING)
        seg.append_rows(x[:1], [None])
        idx.store.segments[wid] = seg
        idx.store.registry.append(wid)
    res = idx.query(x[0], 20)
    assert all(idx.resolve_ids([r.gid])[0][0] != wid for r in res)
    idx.close()


def test_await_indexing_complete(storage, rng):
    idx = make_index(storage, max_segment_size=10, local_worker_threads=2)
    x = gaussian(rng, 35)
    idx.add_all(x)
    assert idx.await_indexing_complete(timeout=30.0)
    with idx.store.lock:
        states = [idx.store.segments[sid].state for sid in (0, 1, 2)]
    assert states == [SegmentState.SEALED] * 3
    idx.close()


def test_reopen_validates_and_preserves(storage, rng):
    idx = make_index(storage, max_segment_size=50)
    x = gaussian(rng, 80)
    gids = idx.add_all(x)
    run_builds(idx)
    idx.checkpoint()
    idx.close()

    # reopen with same config: data intact
    idx2 = make_index(storage, max_segment_size=50)
    res = idx2.query(x[60], 1)
    assert res[0].gid == gids[60]
    assert idx2.store.next_gid == 80
    idx2.close()

    # reopen with mismatched dimension: throws
    with pytest.raises(ValueError, match="Dimension mismatch"):
        make_index(storage, max_segment_size=50, dimension=16, pq_m=4)
    # mismatched metric
    with pytest.raises(ValueError, match="Metric mismatch"):
        make_index(storage, max_segment_size=50, metric="COSINE")
    # mismatched maxSegmentSize
    with pytest.raises(ValueError, match="maxSegmentSize mismatch"):
        make_index(storage, max_segment_size=99)


def test_payload_rules(storage, rng):
    """addAll payload length-mismatch rules (reference: api/VectorIndex.java:78-88)."""
    idx = make_index(storage)
    x = gaussian(rng, 4)
    gids = idx.add_all(x, [b"a", b"b"])  # shorter: missing -> None
    res = idx.query(x[0], 1)
    assert res[0].payload == b"a"
    res = idx.query(x[3], 1)
    assert res[0].payload is None
    gids2 = idx.add_all(gaussian(rng, 2), [b"x", b"y", b"z"])  # extra ignored
    assert len(gids2) == 2
    idx.close()


def test_dimension_mismatch_raises(storage, rng):
    idx = make_index(storage)
    with pytest.raises(ValueError, match="dimension mismatch"):
        idx.add(np.zeros(5, np.float32))
    with pytest.raises(ValueError, match="dimension mismatch"):
        idx.query(np.zeros(5, np.float32), 3)
    idx.close()


def test_empty_segment_build_zero_codebook(storage):
    """Empty-segment build -> zero codebook + SEALED
    (reference: tasks/SegmentBuildService.java:116-120,143-157)."""
    idx = make_index(storage)
    with idx.store.lock:
        idx.store.segments[0].meta.state = SegmentState.PENDING
    idx.build_service.build(0)
    seg = idx.store.segments[0]
    assert seg.state == SegmentState.SEALED
    assert np.all(seg.codebook_np == 0.0)
    idx.close()


def test_build_idempotent(storage, rng):
    """build() twice is safe; SEALED is a no-op
    (reference: tasks/SegmentBuildServiceIdempotentTest.java)."""
    idx = make_index(storage, max_segment_size=30)
    x = gaussian(rng, 30)
    idx.add_all(x)
    idx.build_service.build(0)
    cb1 = np.array(idx.store.segments[0].codebook_np)
    idx.build_service.build(0)  # no-op
    assert np.array_equal(cb1, idx.store.segments[0].codebook_np)
    assert idx.store.segments[0].state == SegmentState.SEALED
    idx.close()


def test_build_writing_segment(storage, rng):
    """WRITING -> SEALED (reference: tasks/SegmentBuildServiceWritingTest.java)."""
    idx = make_index(storage)
    with idx.store.lock:
        idx.store.segments[0].append_rows(gaussian(rng, 10), [None] * 10)
        idx.store.segments[0].meta.state = SegmentState.WRITING
    idx.build_service.build(0)
    assert idx.store.segments[0].state == SegmentState.SEALED
    idx.close()


def test_cache_sizes_reported(storage, rng):
    idx = make_index(storage, max_segment_size=50)
    x = gaussian(rng, 50)
    idx.add_all(x)
    run_builds(idx)
    assert idx.get_codebook_cache_size() == 0  # nothing queried yet
    idx.query(x[0], 5)
    assert idx.get_codebook_cache_size() == 1
    # flat mode (default) never traverses, so adjacency is never uploaded —
    # the cache stays cold (HBM saved); graph mode loads it on first query
    assert idx.get_adjacency_cache_size() == 0
    idx.close()

    idx_g = make_index(storage, name="idx-g", max_segment_size=50,
                       sealed_search_mode="graph")
    idx_g.add_all(x)
    run_builds(idx_g)
    idx_g.query(x[0], 5)
    assert idx_g.get_codebook_cache_size() == 1
    assert idx_g.get_adjacency_cache_size() == 50
    idx_g.close()


def test_async_facade(storage, rng):
    """Future-returning variants mirror the reference's async surface
    (api/VectorIndex.java:56-191); query_async coalesces concurrent callers
    through the QueryBatcher."""
    idx = make_index(storage, max_segment_size=50)
    x = gaussian(rng, 80)
    fut = idx.add_all_async(x, [f"p{i}".encode() for i in range(80)])
    gids = fut.result(timeout=30)
    assert gids == list(range(80))
    run_builds(idx)

    futs = [idx.query_async(x[i], 5) for i in range(8)]
    for i, f in enumerate(futs):
        res = f.result(timeout=30)
        assert res[0].gid == gids[i]
        assert res[0].payload == f"p{i}".encode()

    idx.delete_async(gids[0]).result(timeout=30)
    assert idx.query_async(x[0], 5).result(timeout=30)[0].gid != gids[0]
    arr_res = idx.query_batch_async(x[:4], 5).result(timeout=30)
    assert len(arr_res) == 4
    assert idx.resolve_ids_async([gids[1]]).result(timeout=30)[0][0] >= 0
    assert idx.await_indexing_complete_async().result(timeout=30) is True
    idx.close()  # shuts the executor + batcher down cleanly


def test_random_pivots_append_diversified_seeds(storage, rng, monkeypatch):
    """The reference's RANDOM_PIVOTS contract (fdb/FdbVectorIndex.java:804-812):
    pivots append deterministic extra seeds beyond the ADC top-beam — a
    uniform rank in the approx order == a uniform valid row (see
    _search_sealed). Pinned at the traversal boundary: the seed set grows by
    exactly `pivots` rows, all of which exist, and is call-stable."""
    from vectorsearch_tpu.core import index as index_mod
    from vectorsearch_tpu.params import SeedStrategy

    idx = make_index(storage, max_segment_size=100, oversample=1)
    x = gaussian(rng, 100)
    idx.add_all(x)
    run_builds(idx)

    captured = []
    real_expand = index_mod.traversal_ops.graph_expand

    import jax

    def spy(approx, adjacency, exists, seed_idx, seed_d, *a, **kw):
        if not isinstance(seed_idx, jax.core.Tracer):  # eager calls only
            captured.append(np.asarray(seed_idx))
        return real_expand(approx, adjacency, exists, seed_idx, seed_d, *a, **kw)

    monkeypatch.setattr(index_mod.traversal_ops, "graph_expand", spy)
    base = SearchParams(ef_search=50, beam_width=8, max_iters=2,
                        max_explore=100, mode=Mode.BEAM,
                        seed_strategy=SeedStrategy.RANDOM_PIVOTS)
    idx.query(x[7], 10, base.replace(pivots=0))
    idx.query(x[7], 10, base.replace(pivots=6))
    idx.query(x[7], 10, base.replace(pivots=6))
    lean, rich, rich2 = captured
    assert rich.shape[1] == lean.shape[1] + 6  # exactly `pivots` extra seeds
    pivot_rows = rich[0, lean.shape[1]:]
    seg = idx.store.segments[0]
    assert all(seg.exists_np[v] for v in pivot_rows)  # valid rows only
    assert np.array_equal(rich, rich2)  # deterministic draw (seeded)
    idx.close()


def test_query_batch_pad_buckets_and_correctness(storage, rng):
    """config.query_batch_pad: ragged batch sizes must land on O(log Q)
    bucketed device shapes (compile-storm guard, VERDICT r3 #4), with pad
    rows invisible in the results."""
    idx = make_index(storage, max_segment_size=400)
    x = gaussian(rng, 300)
    gids = idx.add_all(x)
    idx.await_indexing_complete()
    assert idx._query_pad_bucket(1) == 8
    assert idx._query_pad_bucket(3) == idx._query_pad_bucket(8) == 8
    assert idx._query_pad_bucket(9) == idx._query_pad_bucket(16) == 16
    assert idx._query_pad_bucket(100) == 128
    # ragged batches: results match the single-query path row for row
    for qn in (1, 3, 5, 13):
        res = idx.query_batch(x[:qn], 5)
        assert len(res) == qn
        for i in range(qn):
            assert res[i][0].gid == gids[i]
    g, s, d = idx.query_batch_arrays(x[:7], 5)
    assert g.shape == (7, 5) and (g[:, 0] == np.asarray(gids[:7])).all()
    # pad <= 1 disables (config is frozen: rebuild via dataclasses.replace)
    import dataclasses

    object.__setattr__(idx.config, "query_batch_pad", 1)
    assert idx._query_pad_bucket(3) == 3
    idx.close()
