"""Cross-process maintenance safety: vacuum/compaction refuse to run while a
live writer lease from ANOTHER process exists (VERDICT r1 #10; the reference's
FDB transactions make gid remaps atomic under concurrent writers,
tasks/MaintenanceService.java:326-386). Two VectorIndex instances over one
shared storage simulate two processes (same pattern as test_global_workers)."""

import numpy as np

from vectorsearch_tpu.utils.metrics import get_registry, reset_for_test

from tests.test_index_e2e import gaussian, make_index, run_builds


def _inject_foreign_lease(idx, ttl_ms=60_000, owner="deadbeef-foreign"):
    """Plants another process's live lease record directly in storage."""
    store = idx.store
    now = idx.config.effective.clock_ms()
    with store.storage.queue_lock(store.name, store._LEASE_KEY):
        leases = store.storage.read_queue(store.name, store._LEASE_KEY) or {}
        leases[owner] = now + ttl_ms
        store.storage.write_queue(store.name, store._LEASE_KEY, leases)


def _two_instances(storage, rng, **kw):
    writer = make_index(storage, max_segment_size=30,
                        vacuum_min_deleted_ratio=0.1, **kw)
    x = gaussian(rng, 60)
    gids = writer.add_all(x)  # heartbeats the writer lease
    run_builds(writer)
    writer.delete_all(gids[:10])  # deletes in segment 0, lease refreshed
    other = make_index(storage, max_segment_size=30,
                       vacuum_min_deleted_ratio=0.1, **kw)
    return writer, other, x, gids


def test_foreign_maintenance_refused_while_writer_live(storage, rng):
    reset_for_test()
    writer, other, x, gids = _two_instances(storage, rng)
    m = get_registry()

    # the "other process" must refuse the gid-remapping ops
    assert other.maintenance.vacuum_segment(0) == 0
    assert other.maintenance.mark_candidates_compacting([0, 1]) is False
    refused = m.counter_value(
        "vectorsearch.maintenance.refused_foreign_writer", attrs={"op": "vacuum"}
    )
    assert refused == 1
    # gid resolution stays intact in both instances
    assert writer.resolve_ids([gids[15]])[0][0] >= 0
    assert other.resolve_ids([gids[15]])[0][0] >= 0

    # the WRITER process itself may still run its own maintenance
    assert writer.maintenance.vacuum_segment(0) == 10

    other.close()
    writer.close()


def test_foreign_maintenance_allowed_after_writer_closes(storage, rng):
    reset_for_test()
    writer, other, x, gids = _two_instances(storage, rng)
    writer.close()  # releases the lease

    other2 = make_index(storage, max_segment_size=30,
                        vacuum_min_deleted_ratio=0.1, name="idx")
    # reopened instance sees the WAL'd deletes and may vacuum them
    removed = other2.maintenance.vacuum_segment(0)
    assert removed == 10
    assert other2.resolve_ids([gids[15]])[0][0] >= 0
    assert other2.resolve_ids([gids[0]]) == [(-1, -1)]
    other.close()
    other2.close()


def test_compaction_reverts_if_writer_appears_mid_flight(storage, rng):
    """A writer lease appearing between the COMPACTING flip and execution
    reverts sources to SEALED (the planner retries later)."""
    reset_for_test()
    idx = make_index(storage, max_segment_size=30,
                     compaction_min_fragmentation=0.0)
    x = gaussian(rng, 60)
    gids = idx.add_all(x)
    run_builds(idx)
    idx.delete_all(gids[:20])
    # no foreign writer yet (own lease doesn't count): flip succeeds
    assert idx.maintenance.mark_candidates_compacting([0, 1]) is True

    # simulate another process's live lease landing now (a second index can't
    # legitimately take it while ours is live — single-writer enforcement —
    # so inject the record the way a raced/partitioned process would leave it)
    _inject_foreign_lease(idx, ttl_ms=60_000)

    assert idx.maintenance.compact_segments([0, 1]) is None
    states = {sid: s.state.name for sid, s in idx.store.segments.items()}
    assert states[0] == "SEALED" and states[1] == "SEALED"
    idx.close()


def test_lease_disabled_means_no_refusal(storage, rng):
    reset_for_test()
    idx = make_index(storage, max_segment_size=30,
                     vacuum_min_deleted_ratio=0.1, writer_lease_ttl_ms=0)
    x = gaussian(rng, 60)
    gids = idx.add_all(x)
    run_builds(idx)
    idx.delete_all(gids[:10])
    assert idx.maintenance.vacuum_segment(0) == 10
    idx.close()


# --------------------------------------- single-writer enforcement (r3 #3)


def test_second_mutating_process_refused(storage, rng):
    """Two processes mutating the same index: the second deterministically
    fails instead of silently clobbering state / allocating duplicate gids
    (the reference allows this via FDB transactions,
    fdb/FdbVectorStore.java:575-601; the rebuild enforces one writer)."""
    import pytest

    from vectorsearch_tpu import ConcurrentWriterError

    first = make_index(storage, max_segment_size=100)
    gids1 = first.add_all(gaussian(rng, 10))

    second = make_index(storage, max_segment_size=100)
    with pytest.raises(ConcurrentWriterError):
        second.add_all(gaussian(rng, 5))
    with pytest.raises(ConcurrentWriterError):
        second.delete(gids1[0])

    # the established writer keeps going; no gid was consumed by the refusal
    gids2 = first.add_all(gaussian(rng, 5))
    assert sorted(gids1 + gids2) == list(range(15))
    second.close()
    first.close()


def test_writer_allowed_after_first_closes(storage, rng):
    first = make_index(storage, max_segment_size=100)
    first.add_all(gaussian(rng, 10))
    first.close()  # releases the lease

    second = make_index(storage, max_segment_size=100)
    second.refresh()
    gids = second.add_all(gaussian(rng, 5))
    assert gids == list(range(10, 15))  # fresh gids, counter continued
    second.close()


def test_wait_policy_blocks_until_release(storage, rng):
    """writer_conflict_policy="wait" parks the second writer until the lease
    lapses instead of raising."""
    import threading

    first = make_index(storage, max_segment_size=100)
    first.add_all(gaussian(rng, 10))

    second = make_index(storage, max_segment_size=100,
                        writer_conflict_policy="wait",
                        writer_conflict_wait_timeout_s=10.0)
    got = []
    t = threading.Thread(
        target=lambda: got.extend(second.add_all(gaussian(rng, 3)))
    )
    t.start()
    t.join(timeout=0.3)
    assert t.is_alive()  # still parked behind the live lease
    first.close()
    t.join(timeout=10.0)
    assert not t.is_alive()
    assert len(got) == 3 and min(got) >= 10
    second.close()


def test_idle_writer_lease_kept_alive_by_keeper(storage, rng):
    """An idle-but-open writer must not lapse: the background keeper
    heartbeats so foreign maintenance can't remap gids under it
    (ADVICE r2 store.py:78)."""
    import time as _time

    idx = make_index(storage, max_segment_size=30,
                     vacuum_min_deleted_ratio=0.1, writer_lease_ttl_ms=900)
    x = gaussian(rng, 60)
    gids = idx.add_all(x)
    run_builds(idx)
    idx.delete_all(gids[:10])

    _time.sleep(1.4)  # > ttl: without the keeper the lease would be expired

    other = make_index(storage, max_segment_size=30,
                       vacuum_min_deleted_ratio=0.1, writer_lease_ttl_ms=900)
    assert other.maintenance.vacuum_segment(0) == 0  # still refused
    other.close()
    idx.close()


def test_maintenance_holds_lease_during_vacuum(storage, rng):
    """A pure-maintenance process takes the writer lease for the op duration
    (a writer starting mid-vacuum would race the row remap) and releases it
    after, so it doesn't block the real writer between tasks."""
    writer = make_index(storage, max_segment_size=30,
                        vacuum_min_deleted_ratio=0.1)
    x = gaussian(rng, 60)
    gids = writer.add_all(x)
    run_builds(writer)
    writer.delete_all(gids[:10])
    writer.checkpoint()
    writer.close()

    maint = make_index(storage, max_segment_size=30,
                       vacuum_min_deleted_ratio=0.1)
    assert maint.maintenance.vacuum_segment(0) == 10
    # lease released right after the op: a new writer may proceed
    w2 = make_index(storage, max_segment_size=30)
    w2.refresh()
    w2.add_all(gaussian(rng, 3))
    w2.close()
    maint.close()
