"""Maintenance under churn (BASELINE.md config #5, miniature): interleaved
inserts, tombstone deletes, cooldown-aware vacuum, and compaction — with
background worker pools running — while recall over the live set stays high
and gids stay stable."""

import numpy as np

from vectorsearch_tpu.types import SegmentState

from tests.test_index_e2e import gaussian, make_index


def test_churn_with_background_workers(storage, rng):
    idx = make_index(
        storage, max_segment_size=40,
        local_worker_threads=2, local_maintenance_worker_threads=1,
        vacuum_min_deleted_ratio=0.2, compaction_min_fragmentation=0.0,
    )
    live: dict[int, np.ndarray] = {}
    x_all = gaussian(rng, 400)
    cursor = 0

    for round_i in range(4):
        # insert a wave
        batch = x_all[cursor : cursor + 80]
        cursor += 80
        gids = idx.add_all(batch)
        for g, v in zip(gids, batch):
            live[g] = v
        # delete ~30% of the live set
        doomed = [g for i, g in enumerate(sorted(live)) if i % 3 == 0]
        idx.delete_all(doomed)
        for g in doomed:
            live.pop(g)

    assert idx.await_indexing_complete(timeout=300)
    # let maintenance (vacuum/compaction) drain
    assert idx.maintenance_queue.await_queue_empty(timeout=300)

    # recall over the live set: every surviving vector findable, deleted gone
    keys = sorted(live)
    probe = keys[:: max(1, len(keys) // 50)]
    hits = 0
    for g in probe:
        res = idx.query(live[g], 5)
        got = [r.gid for r in res]
        assert all(rg in live for rg in got), "deleted gid leaked"
        if g in got:
            hits += 1
    assert hits / len(probe) >= 0.9, f"churn recall {hits}/{len(probe)}"

    # gid locations may have been rewritten by compaction but must resolve
    locs = idx.resolve_ids(probe)
    assert all(l[0] >= 0 for l in locs)
    # lifecycle sanity: no segment stuck in COMPACTING/WRITING
    with idx.store.lock:
        states = [s.state for s in idx.store.segments.values()]
    assert all(
        s in (SegmentState.ACTIVE, SegmentState.PENDING, SegmentState.SEALED)
        for s in states
    ), states
    idx.close()
