"""Cross-process mutation visibility through refresh(): a second VectorIndex
over the SAME storage (the stand-in for another process — writer leases keyed
by owner_id make the store treat it as foreign) must pick up the writer's
adds, deletes, rotations, checkpoints, and — as a passive reader — vacuum/
compaction registry swaps. The reference gets all of this for free from FDB
(any process reads any range, fdb/FdbVectorStore.java); here the per-mutation
WAL doubles as the replication log and refresh() is the polling read."""

import numpy as np
import pytest

from vectorsearch_tpu.config import VectorIndexConfig
from vectorsearch_tpu.core.index import VectorIndex
from vectorsearch_tpu.types import SegmentState

from tests.test_index_e2e import gaussian, make_index, run_builds


def open_reader(storage, name="idx", **kw):
    """A second index handle over the same storage: never writes, so its
    store takes no writer lease (a passive reader)."""
    return make_index(storage, name=name, **kw)


def test_reader_sees_writer_adds_after_refresh(storage, rng):
    writer = make_index(storage)
    x = gaussian(rng, 30)
    gids = writer.add_all(x)

    reader = open_reader(storage)
    # rows added BEFORE the reader opened are visible immediately (WAL replay
    # at open); rows added after need a refresh
    g, _, _ = reader.query_batch_arrays(x[:4], 1)
    assert [int(v) for v in g[:, 0]] == gids[:4]

    y = gaussian(rng, 20)
    new_gids = writer.add_all(y)
    changed = reader.refresh()
    assert changed  # the ACTIVE segment picked up a WAL delta
    g, _, _ = reader.query_batch_arrays(y[:4], 1)
    assert [int(v) for v in g[:, 0]] == new_gids[:4]
    assert reader.resolve_ids([new_gids[0]]) != [(-1, -1)]
    writer.close()
    reader.close()


def test_reader_sees_writer_deletes_after_refresh(storage, rng):
    writer = make_index(storage)
    x = gaussian(rng, 25)
    gids = writer.add_all(x)
    reader = open_reader(storage)

    writer.delete_all(gids[:5])
    assert reader.resolve_ids([gids[0]]) != [(-1, -1)]  # stale until refresh
    changed = reader.refresh()
    assert changed
    assert reader.resolve_ids(gids[:5]) == [(-1, -1)] * 5
    g, _, _ = reader.query_batch_arrays(x[:5], 1)
    assert all(int(v) not in set(gids[:5]) for v in g[:, 0])
    writer.close()
    reader.close()


def test_reader_adopts_writer_rotation_and_builds(storage, rng):
    writer = make_index(storage, max_segment_size=20)
    reader = open_reader(storage, max_segment_size=20)

    x = gaussian(rng, 50)  # 2 rotations: segments 0,1 PENDING + 2 ACTIVE
    gids = writer.add_all(x)
    run_builds(writer)  # seals 0 and 1, checkpoints at seal
    changed = reader.refresh()
    assert changed
    segs = {s.seg_id: s.state for s in reader.store.snapshot_segments()}
    assert segs[0] == SegmentState.SEALED
    assert segs[1] == SegmentState.SEALED
    assert reader.store.current_segment == writer.store.current_segment
    # full-corpus self-recall through the reader
    g, _, _ = reader.query_batch_arrays(x, 1)
    hits = sum(int(g[i, 0]) == gids[i] for i in range(len(gids)))
    assert hits / len(gids) >= 0.9
    writer.close()
    reader.close()


def test_reader_handles_writer_checkpoint_wal_reset(storage, rng):
    writer = make_index(storage)
    x = gaussian(rng, 20)
    gids = writer.add_all(x)
    reader = open_reader(storage)
    reader.refresh()

    writer.delete(gids[0])
    writer.checkpoint()  # subsumes + resets the WAL: len(recs) < applied
    y = gaussian(rng, 5)
    new_gids = writer.add_all(y)
    changed = reader.refresh()
    assert changed
    assert reader.resolve_ids([gids[0]]) == [(-1, -1)]
    g, _, _ = reader.query_batch_arrays(y[:2], 1)
    assert [int(v) for v in g[:, 0]] == new_gids[:2]
    writer.close()
    reader.close()


def test_passive_reader_adopts_compaction_swap(storage, rng):
    writer = make_index(storage, max_segment_size=20,
                        vacuum_min_deleted_ratio=0.01,
                        compaction_min_segments=2)
    x = gaussian(rng, 40)  # segments 0,1 full
    gids = writer.add_all(x)
    run_builds(writer)
    reader = open_reader(storage, max_segment_size=20,
                         vacuum_min_deleted_ratio=0.01,
                         compaction_min_segments=2)
    before = {s.seg_id for s in reader.store.snapshot_segments()}
    assert {0, 1} <= before

    # delete most rows then compact 0+1 into a fresh segment
    writer.delete_all(gids[:15] + gids[20:35])
    for sid in (0, 1):
        writer.maintenance.vacuum_segment(sid, 0.01)
    assert writer.maintenance.mark_candidates_compacting([0, 1])
    dest = writer.maintenance.compact_segments([0, 1])
    assert dest is not None
    writer.checkpoint()
    survivors = [g for g in gids if writer.resolve_ids([g]) != [(-1, -1)]]
    assert survivors

    changed = reader.refresh()
    assert changed
    after = {s.seg_id for s in reader.store.snapshot_segments()}
    assert after == {s.seg_id for s in writer.store.snapshot_segments()}
    # gid stability across the adopted compaction: survivors resolve and the
    # deleted ones do not
    for g in survivors:
        assert reader.resolve_ids([g]) != [(-1, -1)]
    for g in gids[:15]:
        assert reader.resolve_ids([g]) == [(-1, -1)]
    # and queries still return the survivors' vectors
    probe = [g for g in survivors if g < 40][:3]
    res, _, _ = reader.query_batch_arrays(x[probe], 1)
    assert [int(v) for v in res[:, 0]] == probe
    writer.close()
    reader.close()


def test_writer_self_refresh_is_noop(storage, rng):
    writer = make_index(storage)
    x = gaussian(rng, 15)
    gids = writer.add_all(x)
    writer.delete(gids[0])
    assert writer.refresh() == []  # own mutations are already applied
    g, _, _ = writer.query_batch_arrays(x[1:3], 1)
    assert [int(v) for v in g[:, 0]] == gids[1:3]
    writer.close()


def test_two_writers_still_conflict_free_on_reads(storage, rng):
    """A second handle that NEVER mutates does not disturb the first even
    after many refresh cycles interleaved with writer mutations."""
    writer = make_index(storage, max_segment_size=10)
    reader = open_reader(storage, max_segment_size=10)
    rng2 = np.random.default_rng(7)
    all_gids = []
    for _ in range(5):
        g = writer.add_all(gaussian(rng2, 8))
        all_gids.extend(g)
        if len(all_gids) > 12:
            writer.delete(all_gids[len(all_gids) // 2])
        reader.refresh()
    run_builds(writer)
    reader.refresh()
    assert reader.store.next_gid == writer.store.next_gid
    assert [s.seg_id for s in reader.store.snapshot_segments()] == [
        s.seg_id for s in writer.store.snapshot_segments()
    ]
    writer.close()
    reader.close()
