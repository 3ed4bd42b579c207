"""Cross-process maintenance safety: vacuum/compaction refuse to run while a
live writer lease from ANOTHER process exists (VERDICT r1 #10; the reference's
FDB transactions make gid remaps atomic under concurrent writers,
tasks/MaintenanceService.java:326-386). Two VectorIndex instances over one
shared storage simulate two processes (same pattern as test_global_workers)."""

import numpy as np

from vectorsearch_tpu.utils.metrics import get_registry, reset_for_test

from tests.test_index_e2e import gaussian, make_index, run_builds


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

    # simulate another process's live lease landing now
    writer = make_index(storage, max_segment_size=30, name="idx")
    writer.add_all(gaussian(rng, 1))

    assert idx.maintenance.compact_segments([0, 1]) is None
    states = {sid: s.state.name for sid, s in idx.store.segments.items()}
    assert states[0] == "SEALED" and states[1] == "SEALED"
    writer.close()
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
