"""Maintenance chain tests: vacuum ratio/cooldown gating, compaction planner
behavioral suite, two-into-one merge, gid stability across compaction
(parity with tasks/CompactionPlannerAndThrottlingTest.java,
tasks/MaintenanceServiceCompactionFlowTest.java,
api/GidCompactionStabilityTest.java)."""

import numpy as np
import pytest

from vectorsearch_tpu.core.tasks import (
    CompactTask,
    FindCompactionCandidatesTask,
    VacuumTask,
)
from vectorsearch_tpu.types import SegmentMeta, SegmentState
from vectorsearch_tpu.utils.metrics import get_registry, reset_for_test

from tests.test_index_e2e import gaussian, make_index, run_builds


# ---------------------------------------------------------------- vacuum


def test_vacuum_scheduling_ratio_gate(storage, rng):
    reset_for_test()
    idx = make_index(storage, vacuum_min_deleted_ratio=0.5)
    x = gaussian(rng, 20)
    gids = idx.add_all(x)
    idx.delete_all(gids[:5])  # ratio 5/20 = 0.25 < 0.5 -> skipped
    m = get_registry()
    assert m.counter_value("vectorsearch.maintenance.vacuum.skipped") >= 1
    assert m.counter_value("vectorsearch.maintenance.vacuum.scheduled") == 0
    idx.delete_all(gids[5:11])  # 11/20 = 0.55 >= 0.5 -> scheduled
    assert m.counter_value("vectorsearch.maintenance.vacuum.scheduled") == 1
    assert idx.maintenance_queue.has_visible_unclaimed_tasks()
    idx.close()


def test_vacuum_cooldown_gate(storage, rng):
    reset_for_test()
    now = [1_000_000]
    idx = make_index(
        storage, vacuum_min_deleted_ratio=0.1, vacuum_cooldown_s=60.0,
        clock_ms=lambda: now[0],
    )
    x = gaussian(rng, 20)
    gids = idx.add_all(x)
    # stamp a recent vacuum
    with idx.store.lock:
        idx.store.segments[0].meta.last_vacuum_at_ms = now[0] - 10_000  # 10s ago
    idx.delete_all(gids[:10])
    m = get_registry()
    assert m.counter_value("vectorsearch.maintenance.vacuum.scheduled") == 0
    assert m.counter_value("vectorsearch.maintenance.vacuum.skipped") >= 1
    now[0] += 120_000  # cooldown elapsed
    idx.delete_all(gids[10:12])
    assert m.counter_value("vectorsearch.maintenance.vacuum.scheduled") == 1
    idx.close()


def test_vacuum_removes_tombstones(storage, rng):
    idx = make_index(storage, max_segment_size=50, vacuum_min_deleted_ratio=0.1)
    x = gaussian(rng, 50)
    gids = idx.add_all(x)
    run_builds(idx)
    idx.delete_all(gids[:20])
    seg = idx.store.segments[0]
    assert seg.meta.deleted_count == 20
    removed = idx.maintenance.vacuum_segment(0)
    assert removed == 20
    assert seg.meta.deleted_count == 0
    assert seg.meta.count == 30
    assert seg.meta.last_vacuum_at_ms > 0
    # vacuumed rows fully cleared
    assert not seg.exists_np[0]
    # remaining rows still searchable
    res = idx.query(x[30], 1)
    assert res[0].gid == gids[30]
    m = get_registry()
    assert m.counter_value("vectorsearch.vacuum.removed") >= 20
    idx.close()


def test_vacuum_ratio_guard_skips(storage, rng):
    idx = make_index(storage, max_segment_size=50)
    x = gaussian(rng, 50)
    gids = idx.add_all(x)
    run_builds(idx)
    idx.delete(gids[0])  # 1/50 = 0.02 < default 0.25
    assert idx.maintenance.vacuum_segment(0) == 0
    assert idx.store.segments[0].meta.deleted_count == 1
    idx.close()


def test_vacuum_under_half_triggers_find_candidates(storage, rng):
    idx = make_index(storage, max_segment_size=50, vacuum_min_deleted_ratio=0.1)
    x = gaussian(rng, 50)
    gids = idx.add_all(x)
    run_builds(idx)
    idx.delete_all(gids[:30])  # 20 live < 25 = max/2
    idx.maintenance.vacuum_segment(0)
    claim = idx.maintenance_queue.await_and_claim(timeout=1)
    found = []
    while claim is not None:
        found.append(claim.payload)
        claim.complete()
        claim = idx.maintenance_queue.await_and_claim(timeout=0.1)
    assert any(isinstance(p, FindCompactionCandidatesTask) for p in found)
    idx.close()


# ---------------------------------------------------------------- planner


def seed_sealed(idx, seg_id, count, deleted, created_ms):
    """Direct state injection (reference test pattern:
    tasks/CompactionPlannerAndThrottlingTest.java:63-80)."""
    with idx.store.lock:
        if seg_id not in idx.store.segments:
            seg = idx.store._new_segment(seg_id, SegmentState.SEALED)
            idx.store.segments[seg_id] = seg
            idx.store.registry.append(seg_id)
            idx.store.max_segment_id = max(idx.store.max_segment_id, seg_id)
        seg = idx.store.segments[seg_id]
        seg.meta = SegmentMeta(
            segment_id=seg_id, state=SegmentState.SEALED, count=count,
            deleted_count=deleted, created_at_ms=created_ms,
        )


def test_planner_requires_min_segments(storage):
    idx = make_index(storage, name="p1")
    seed_sealed(idx, 10, 40, 10, 1000)
    assert idx.maintenance.find_compaction_candidates() == []  # only 1 sealed
    idx.close()


def test_planner_age_bias(storage):
    idx = make_index(
        storage, name="p2", max_segment_size=100,
        compaction_age_bias_weight=1.0, compaction_size_bias_weight=0.0,
        compaction_frag_bias_weight=0.0, compaction_min_fragmentation=0.0,
        compaction_max_segments=2,
    )
    seed_sealed(idx, 1, 30, 0, 5000)  # newest
    seed_sealed(idx, 2, 30, 0, 1000)  # oldest -> highest age score
    seed_sealed(idx, 3, 30, 0, 3000)
    pick = idx.maintenance.find_compaction_candidates()
    assert pick[0] == 2  # oldest first
    assert len(pick) == 2
    idx.close()


def test_planner_size_bias(storage):
    idx = make_index(
        storage, name="p3", max_segment_size=100,
        compaction_age_bias_weight=0.0, compaction_size_bias_weight=1.0,
        compaction_frag_bias_weight=0.0, compaction_min_fragmentation=0.0,
    )
    seed_sealed(idx, 1, 90, 0, 1000)
    seed_sealed(idx, 2, 10, 0, 1000)  # smallest -> highest size score
    seed_sealed(idx, 3, 50, 0, 1000)
    pick = idx.maintenance.find_compaction_candidates()
    assert pick[0] == 2
    idx.close()


def test_planner_budget_stop(storage):
    # budget = 0.8 * 100 = 80 rows; greedy stops once sum >= budget
    idx = make_index(
        storage, name="p4", max_segment_size=100,
        compaction_size_bias_weight=1.0, compaction_age_bias_weight=0.0,
        compaction_frag_bias_weight=0.0, compaction_min_fragmentation=0.0,
        compaction_max_segments=8,
    )
    for sid, cnt in [(1, 45), (2, 40), (3, 44), (4, 42)]:
        seed_sealed(idx, sid, cnt, 0, 1000)
    pick = idx.maintenance.find_compaction_candidates()
    picked_rows = sum(idx.store.segments[s].meta.count for s in pick)
    assert picked_rows >= 80
    assert len(pick) == 2  # two smallest already reach 80
    idx.close()


def test_planner_min_fragmentation_threshold(storage):
    idx = make_index(
        storage, name="p5", max_segment_size=100,
        compaction_min_fragmentation=0.5,
    )
    seed_sealed(idx, 1, 40, 2, 1000)  # frag ~0.05
    seed_sealed(idx, 2, 40, 2, 2000)
    assert idx.maintenance.find_compaction_candidates() == []
    seed_sealed(idx, 3, 10, 40, 1500)  # heavy frag pulls average over 0.5?
    # avg frag = 44 / (90+44) = 0.328 < 0.5 still rejected
    assert idx.maintenance.find_compaction_candidates() == []
    idx.close()


def test_planner_max_segments_cap(storage):
    idx = make_index(
        storage, name="p6", max_segment_size=1000,
        compaction_max_segments=3, compaction_min_fragmentation=0.0,
    )
    for sid in range(1, 7):
        seed_sealed(idx, sid, 10, 0, 1000 + sid)
    pick = idx.maintenance.find_compaction_candidates()
    assert len(pick) == 3
    idx.close()


def test_planner_anchor_included(storage):
    idx = make_index(
        storage, name="p7", max_segment_size=1000,
        compaction_min_fragmentation=0.0, compaction_max_segments=2,
    )
    seed_sealed(idx, 1, 10, 0, 1000)
    seed_sealed(idx, 2, 10, 0, 2000)
    seed_sealed(idx, 3, 10, 0, 3000)
    pick = idx.maintenance.find_compaction_candidates(anchor_seg_id=3)
    assert 3 in pick
    idx.close()


def test_throttling_zero_disables(storage, rng):
    idx = make_index(storage, name="p8", max_concurrent_compactions=0)
    seed_sealed(idx, 1, 10, 0, 1000)
    seed_sealed(idx, 2, 10, 0, 2000)
    idx.dispatch_maintenance(FindCompactionCandidatesTask())
    assert not idx.maintenance_queue.has_visible_unclaimed_tasks()
    idx.close()


def test_mark_candidates_all_or_nothing(storage):
    idx = make_index(storage, name="p9")
    seed_sealed(idx, 1, 10, 0, 1000)
    seed_sealed(idx, 2, 10, 0, 2000)
    with idx.store.lock:
        idx.store.segments[2].meta.state = SegmentState.COMPACTING
    assert not idx.maintenance.mark_candidates_compacting([1, 2])
    assert idx.store.segments[1].state == SegmentState.SEALED  # untouched
    with idx.store.lock:
        idx.store.segments[2].meta.state = SegmentState.SEALED
    assert idx.maintenance.mark_candidates_compacting([1, 2])
    assert idx.store.segments[1].state == SegmentState.COMPACTING
    idx.close()


def test_request_compaction_idempotent_and_sorted(storage):
    idx = make_index(storage, name="p10")
    idx.request_compaction([3, 1, 2])
    idx.request_compaction([2, 3, 1])  # same set, different order -> suppressed
    n = 0
    claim = idx.maintenance_queue.await_and_claim(timeout=0.5)
    while claim is not None:
        if isinstance(claim.payload, CompactTask):
            n += 1
            assert claim.payload.seg_ids == (1, 2, 3)
        claim.complete()
        claim = idx.maintenance_queue.await_and_claim(timeout=0.1)
    assert n == 1
    idx.close()


# ---------------------------------------------------------------- compaction


def test_two_into_one_merge(storage, rng):
    """Two sealed segments merge into one; results stay correct and gids
    stable (reference: MaintenanceServiceCompactionFlowTest.java,
    GidCompactionStabilityTest.java)."""
    idx = make_index(storage, max_segment_size=30, compaction_min_fragmentation=0.0)
    x = gaussian(rng, 60)
    gids = idx.add_all(x)
    run_builds(idx)
    assert idx.store.segments[0].state == SegmentState.SEALED
    assert idx.store.segments[1].state == SegmentState.SEALED
    # delete enough that the merged live rows fit one maxSegmentSize dest
    # (30 live; an over-cap merge splits instead — see the split test below)
    idx.delete_all(gids[:15] + gids[30:45])

    assert idx.maintenance.mark_candidates_compacting([0, 1])
    new_id = idx.maintenance.compact_segments([0, 1])
    assert new_id == 3  # 0,1 sealed + 2 active -> dest = 3

    # sources gone, dest registered + sealed
    with idx.store.lock:
        assert 0 not in idx.store.segments and 1 not in idx.store.segments
        assert idx.store.segments[new_id].state == SegmentState.SEALED
        assert idx.store.segments[new_id].meta.count == 30

    # gid stability: surviving gids resolve to the new segment and queries
    # still return them
    locs = idx.resolve_ids(gids[15:30] + gids[45:60])
    assert all(l[0] == new_id for l in locs)
    for i in (17, 25, 47, 59):
        res = idx.query(x[i], 3)
        assert res[0].gid == gids[i], f"row {i}"
    # deleted gids stay gone
    assert idx.resolve_ids(gids[:15]) == [(-1, -1)] * 15
    idx.close()


def test_compaction_splits_oversized_destination(storage, rng):
    """Sources whose merged live rows exceed maxSegmentSize split into
    multiple capped destinations (r2 VERDICT #5): an oversized single
    segment would meet the O(N^2) graph builder and break mesh
    cap-divisibility. The reference's FDB segments have no physical cap so
    its single destination is safe there (MaintenanceService.java:254-271)."""
    idx = make_index(storage, max_segment_size=30,
                     compaction_min_fragmentation=0.0)
    x = gaussian(rng, 90)
    gids = idx.add_all(x)
    run_builds(idx)
    idx.delete_all(gids[:5])  # 85 live -> ceil(85/30) = 3 capped dests
    assert idx.maintenance.mark_candidates_compacting([0, 1, 2])
    first = idx.maintenance.compact_segments([0, 1, 2])
    assert first is not None

    with idx.store.lock:
        assert all(sid not in idx.store.segments for sid in (0, 1, 2))
        dests = [s for s in idx.store.segments.values() if s.seg_id >= first
                 and s.state == SegmentState.SEALED]
        assert len(dests) == 3
        assert sorted(d.meta.count for d in dests) == [25, 30, 30]
        assert all(d.capacity <= 30 for d in dests)
        dest_ids = {d.seg_id for d in dests}

    # gid stability: every survivor resolves into one of the capped dests
    locs = idx.resolve_ids(gids[5:])
    assert all(l[0] in dest_ids for l in locs)
    for i in (7, 33, 61, 89):
        res = idx.query(x[i], 3)
        assert res[0].gid == gids[i], f"row {i}"
    assert idx.resolve_ids(gids[:5]) == [(-1, -1)] * 5
    idx.close()


def test_compaction_sources_searchable_during(storage, rng):
    """COMPACTING sources remain searchable (reference: state machine
    invariant, tasks/MaintenanceService.java:254-271)."""
    idx = make_index(storage, max_segment_size=20)
    x = gaussian(rng, 40)
    gids = idx.add_all(x)
    run_builds(idx)
    assert idx.maintenance.mark_candidates_compacting([0, 1])
    res = idx.query(x[5], 1)  # mid-compaction state: still searchable
    assert res[0].gid == gids[5]
    idx.close()


def test_compaction_reapplies_concurrent_delete(storage, rng):
    """A delete landing on a source row between copy and swap is re-applied
    to the destination row."""
    idx = make_index(storage, max_segment_size=20, compaction_min_fragmentation=0.0)
    x = gaussian(rng, 40)
    gids = idx.add_all(x)
    run_builds(idx)
    assert idx.maintenance.mark_candidates_compacting([0, 1])

    # interpose: delete during the build phase by monkey-patching build
    orig_build = idx.build_service.build

    def build_and_delete(seg_id):
        orig_build(seg_id)
        idx.store.delete_batch([gids[3]])  # delete AFTER copy, BEFORE swap

    idx.build_service.build = build_and_delete
    new_id = idx.maintenance.compact_segments([0, 1])
    idx.build_service.build = orig_build
    assert new_id is not None

    assert idx.resolve_ids([gids[3]])[0] == (-1, -1)
    res = idx.query(x[3], 40)
    assert gids[3] not in [r.gid for r in res]
    idx.close()


def test_full_maintenance_chain_via_dispatch(storage, rng):
    """delete -> vacuum -> find candidates -> mark -> compact, all through
    the maintenance dispatcher."""
    idx = make_index(
        storage, max_segment_size=30, vacuum_min_deleted_ratio=0.1,
        compaction_min_fragmentation=0.0,
    )
    x = gaussian(rng, 60)
    gids = idx.add_all(x)
    run_builds(idx)
    idx.delete_all(gids[:20])  # seg0: 10 live
    # drain maintenance queue through the dispatcher until quiet
    for _ in range(10):
        claim = idx.maintenance_queue.await_and_claim(timeout=0.2)
        if claim is None:
            break
        idx.dispatch_maintenance(claim.payload)
        claim.complete()
    with idx.store.lock:
        # seg0+seg1 compacted into a new segment
        assert 0 not in idx.store.segments
        assert 1 not in idx.store.segments
    # all surviving vectors still found
    for i in (25, 45):
        assert idx.query(x[i], 1)[0].gid == gids[i]
    idx.close()


def test_vacuum_keeps_device_mirrors_resident(storage, rng):
    """Vacuum must NOT invalidate/re-upload the device bundle (r3: the full
    re-upload cost ~5 s per 1M-row segment through the axon tunnel and
    collapsed Deep10M churn serving). Device state stays query-correct
    because vacuumed rows were already tombstoned — alive=False reached the
    device through the delete path, and re-rank drops dead rows by alive."""
    idx = make_index(storage, max_segment_size=50, vacuum_min_deleted_ratio=0.1)
    x = gaussian(rng, 50)
    gids = idx.add_all(x)
    run_builds(idx)
    seg = idx.store.segments[0]
    # materialize mirrors (as a serving process would have)
    _ = idx.query(x[0], 1)
    idx.delete_all(gids[:20])
    _ = idx.query(x[30], 1)  # drain pending tombstone flag updates
    before_vec = seg._vectors_dev
    assert before_vec is not None
    assert idx.maintenance.vacuum_segment(0) == 20
    # same device buffers, no invalidation
    assert seg._vectors_dev is before_vec
    # deleted rows stay invisible, live rows stay searchable — with the
    # UNTOUCHED mirrors
    res = idx.query(x[5], 5)
    assert gids[5] not in [r.gid for r in res]
    assert idx.query(x[30], 1)[0].gid == gids[30]
    idx.close()


def test_vacuum_wal_record_replays_without_checkpoint(tmp_path, rng):
    """r5: vacuum journals a tiny "vac" WAL record instead of a full-segment
    checkpoint (a 1M-row checkpoint under the store lock measured 3.8 s of
    dead serving per vacuum, benchmarks/probe_vacuum_stall.py). The removal
    must survive a checkpoint-less reopen purely via WAL replay."""
    from tests.test_index_e2e import gaussian, make_index, run_builds
    from vectorsearch_tpu.core.persist import DiskStorage

    storage = DiskStorage(str(tmp_path / "vwal"), fsync=False)
    idx = make_index(storage, max_segment_size=100,
                     vacuum_min_deleted_ratio=0.05)
    x = gaussian(rng, 150)
    gids = idx.add_all(x)
    run_builds(idx)
    idx.delete_all(gids[:30])
    assert idx.maintenance.vacuum_segment(0) == 30
    seg0 = idx.store.segments[0]
    assert not seg0.exists_np[:30].any()  # physically removed
    # NO idx.checkpoint() — simulate a crash right after the vacuum: the
    # "vac" record (and the delete records before it) are all that persist
    idx.store.close()  # release the lease without checkpointing

    idx2 = make_index(storage, max_segment_size=100,
                      vacuum_min_deleted_ratio=0.05)
    s0 = idx2.store.segments[0]
    assert not s0.exists_np[:30].any()  # vac replayed over the checkpoint
    assert s0.meta.count == 70
    assert s0.meta.deleted_count == 0
    res = idx2.query(x[40], 5)
    assert res[0].gid == gids[40]
    assert not any(r.gid in set(gids[:30]) for r in res)
    idx2.close()


def test_vacuum_propagates_to_reader_via_wal_delta(storage, rng):
    """A passive reader picks a peer's vacuum up through the WAL delta pass
    (no segment reload: the "vac" record applies incrementally)."""
    from tests.test_index_e2e import gaussian, make_index, run_builds

    w = make_index(storage, max_segment_size=100,
                   vacuum_min_deleted_ratio=0.05)
    x = gaussian(rng, 120)
    gids = w.add_all(x)
    run_builds(w)
    reader = make_index(storage, max_segment_size=100,
                        vacuum_min_deleted_ratio=0.05)
    reader.refresh()
    w.delete_all(gids[:15])
    w.store.release_writer_lease()  # let the reader-side view vacuum-free
    assert w.maintenance.vacuum_segment(0) == 15
    reader.refresh()
    r0 = reader.store.segments[0]
    assert not r0.exists_np[:15].any()
    res = reader.query(x[20], 5)
    assert res[0].gid == gids[20]
    reader.close()
    w.close()
