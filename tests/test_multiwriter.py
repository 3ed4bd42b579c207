"""Concurrent multi-process writers (writer_conflict_policy="concurrent") —
the rebuild's equivalent of the reference's FDB-transactional N-writer
ingest (fdb/FdbVectorStore.java:425-492,575-601): per-writer ACTIVE
segments, shared gid/segment-id counters, merge-style state checkpoints,
overlay delete logs for cross-writer deletes, and maintenance deferring to
the exclusive slot. Thread-level tests share one MemoryStorage between two
VectorIndex handles (each with its own store/owner_id/lease — the same code
paths two processes execute); one true-subprocess DiskStorage test proves
the fcntl/file layer."""

import os
import sys

import numpy as np
import pytest

from tests.test_index_e2e import gaussian, make_index, run_builds
from vectorsearch_tpu.types import ConcurrentWriterError, SegmentState


def make_cw(storage, **kw):
    kw.setdefault("writer_conflict_policy", "concurrent")
    return make_index(storage, **kw)


def test_two_writers_interleaved_adds_disjoint_gids(storage, rng):
    w1 = make_cw(storage)
    w2 = make_cw(storage)
    g1 = w1.add_all(gaussian(rng, 30))
    g2 = w2.add_all(gaussian(rng, 30))
    assert len(set(g1) | set(g2)) == 60  # shared counter: no collisions
    # each writer appends to its OWN ACTIVE segment
    assert w1.store.current_segment != w2.store.current_segment
    s1 = w1.store.segments[w1.store.current_segment]
    s2 = w2.store.segments[w2.store.current_segment]
    assert s1.meta.owner == w1.store.owner_id
    assert s2.meta.owner == w2.store.owner_id
    w1.close()
    w2.close()


def test_peer_rows_visible_after_refresh(storage, rng):
    w1 = make_cw(storage)
    w2 = make_cw(storage)
    x1 = gaussian(rng, 12)
    x2 = gaussian(rng, 12)
    g1 = w1.add_all(x1)
    g2 = w2.add_all(x2)
    w1.refresh()
    w2.refresh()
    # each writer serves BOTH writers' rows (WAL doubles as replication)
    r = w1.query(x2[3], 1)
    assert r[0].gid == g2[3]
    r = w2.query(x1[5], 1)
    assert r[0].gid == g1[5]
    w1.close()
    w2.close()


def test_concurrent_rotations_unique_segment_ids(storage, rng):
    w1 = make_cw(storage, max_segment_size=10)
    w2 = make_cw(storage, max_segment_size=10)
    for _ in range(3):
        w1.add_all(gaussian(rng, 10))
        w2.add_all(gaussian(rng, 10))
    w1.refresh()
    w2.refresh()
    ids1 = set(w1.store.registry)
    ids2 = set(w2.store.registry)
    # merged registries agree and every segment id is unique
    assert ids1 == ids2
    assert len(w1.store.registry) == len(ids1)
    w1.close()
    w2.close()


def test_cross_writer_delete_via_overlay(storage, rng):
    w1 = make_cw(storage)
    w2 = make_cw(storage)
    x1 = gaussian(rng, 10)
    g1 = w1.add_all(x1)
    w2.refresh()
    # w2 deletes a row living in w1's segment -> overlay log, not w1's WAL
    w2.delete(g1[4])
    assert w2.query(x1[4], 1)[0].gid != g1[4]
    # the owner absorbs the overlay on refresh
    w1.refresh()
    assert w1.query(x1[4], 1)[0].gid != g1[4]
    assert w1.resolve_ids([g1[4]])[0] == (-1, -1)
    w1.close()
    w2.close()


def test_cross_writer_delete_unresolved_triggers_refresh(storage, rng):
    w1 = make_cw(storage)
    w2 = make_cw(storage)
    x1 = gaussian(rng, 8)
    g1 = w1.add_all(x1)
    # w2 never refreshed: delete_batch should self-refresh and still work
    w2.delete(g1[2])
    w1.refresh()
    assert w1.resolve_ids([g1[2]])[0] == (-1, -1)
    w1.close()
    w2.close()


def test_overlay_deletes_survive_reopen(storage, rng):
    w1 = make_cw(storage)
    w2 = make_cw(storage)
    x1 = gaussian(rng, 10)
    g1 = w1.add_all(x1)
    w2.refresh()
    w2.delete(g1[7])
    w1.close()
    w2.close()
    idx = make_cw(storage)
    assert idx.resolve_ids([g1[7]])[0] == (-1, -1)
    assert idx.query(x1[3], 1)[0].gid == g1[3]  # others intact
    idx.close()


def test_orphaned_active_rotated_by_next_writer(storage, rng):
    w1 = make_cw(storage)
    x = gaussian(rng, 20)
    g1 = w1.add_all(x)
    orphan_sid = w1.store.current_segment
    w1.close()  # lease released: the ACTIVE segment is now orphaned
    w2 = make_cw(storage)
    g2 = w2.add_all(gaussian(rng, 5))
    orphan = w2.store.segments[orphan_sid]
    assert orphan.state == SegmentState.PENDING  # flipped, not appended to
    assert w2.store.current_segment != orphan_sid
    run_builds(w2)
    assert orphan.state == SegmentState.SEALED
    assert w2.query(x[2], 1)[0].gid == g1[2]
    assert len(set(g1) | set(g2)) == 25
    w2.close()


def test_live_peer_active_not_stolen(storage, rng):
    w1 = make_cw(storage)
    w1.add_all(gaussian(rng, 5))
    sid1 = w1.store.current_segment
    w2 = make_cw(storage)
    w2.add_all(gaussian(rng, 5))
    # w1 holds a live lease: its ACTIVE must stay ACTIVE and unshared
    assert w1.store.segments[sid1].state == SegmentState.ACTIVE
    assert w2.store.current_segment != sid1
    w1.close()
    w2.close()


def test_maintenance_defers_while_peer_writer_live(storage, rng):
    from vectorsearch_tpu.utils.metrics import get_registry, reset_for_test

    reset_for_test()
    w1 = make_cw(storage, max_segment_size=10)
    w2 = make_cw(storage, max_segment_size=10)
    g1 = w1.add_all(gaussian(rng, 10))
    w2.add_all(gaussian(rng, 2))  # w2 takes a writer lease
    run_builds(w1)
    w1.delete_all(g1[:6])
    # w2's lease is live -> vacuum must refuse (remaps need exclusivity)
    assert w1.maintenance.vacuum_segment(0, min_ratio=0.1) == 0
    assert (
        get_registry().counter_value(
            "vectorsearch.maintenance.refused_foreign_writer"
        )
        >= 1
    )
    w2.close()
    # peer gone: the exclusive slot is attainable, vacuum proceeds
    assert w1.maintenance.vacuum_segment(0, min_ratio=0.1) == 6
    w1.close()


def test_exclusive_mode_still_raises(storage, rng):
    w1 = make_index(storage)  # default policy: raise
    w1.add_all(gaussian(rng, 4))
    w2 = make_index(storage)
    with pytest.raises(ConcurrentWriterError):
        w2.add_all(gaussian(rng, 4))
    w1.close()
    w2.close()


def test_merged_state_reopen_counts(storage, rng):
    w1 = make_cw(storage, max_segment_size=10)
    w2 = make_cw(storage, max_segment_size=10)
    w1.add_all(gaussian(rng, 25))
    w2.add_all(gaussian(rng, 17))
    w1.close()
    w2.close()
    idx = make_cw(storage, max_segment_size=10)
    total = sum(
        s.meta.count for s in idx.store.segments.values() if not s.is_stub
    )
    assert total == 42
    # gid stability: a fresh add must not recycle any assigned gid
    prior = set()
    for s in idx.store.segments.values():
        prior.update(int(g) for g in s.gids_np[s.gids_np >= 0])
    g_new = idx.add_all(gaussian(rng, 3))
    assert not (set(g_new) & prior)
    idx.close()


def test_builds_seal_both_writers_segments(storage, rng):
    w1 = make_cw(storage, max_segment_size=10)
    w2 = make_cw(storage, max_segment_size=10)
    x1 = gaussian(rng, 20)
    x2 = gaussian(rng, 20)
    g1 = w1.add_all(x1)
    g2 = w2.add_all(x2)
    run_builds(w1)
    run_builds(w2)
    w1.refresh()
    w2.refresh()
    # every full segment sealed (each writer built its own rotations)
    sealed = [
        s
        for s in w1.store.segments.values()
        if s.state == SegmentState.SEALED
    ]
    assert len(sealed) == 4  # 2 writers x 2 full segments of 10
    assert w1.query(x2[1], 1)[0].gid == g2[1]
    assert w2.query(x1[1], 1)[0].gid == g1[1]
    w1.close()
    w2.close()


def test_true_subprocess_two_writers_disk(tmp_path, rng):
    """Two real OS processes ingest concurrently into one DiskStorage dir
    (fcntl state-merge lock, shared counters, flocked WAL appends); the
    parent then opens the index and verifies both writers' rows."""
    import subprocess

    root = str(tmp_path / "mw")
    n_each = 60
    child = f"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import sys
import numpy as np
from vectorsearch_tpu.config import VectorIndexConfig
from vectorsearch_tpu.core.index import VectorIndex
from vectorsearch_tpu.core.persist import DiskStorage

seed = int(sys.argv[1])
rng = np.random.default_rng(seed)
idx = VectorIndex.create_or_open(VectorIndexConfig(
    storage=DiskStorage({root!r}, fsync=False), name="mw", dimension=8,
    metric="L2", max_segment_size=25, pq_m=4, pq_k=16, graph_degree=16,
    graph_build_breadth=64, local_worker_threads=0,
    local_maintenance_worker_threads=0,
    writer_conflict_policy="concurrent",
))
gids = []
for _ in range(6):
    gids.extend(idx.add_all(rng.normal(size=(10, 8)).astype(np.float32)))
idx.close()
print(",".join(map(str, gids)))
"""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", child, str(seed)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"}, cwd="/root/repo",
        )
        for seed in (1, 2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, err
        outs.append(out.strip().splitlines()[-1])
    gids_a = [int(g) for g in outs[0].split(",")]
    gids_b = [int(g) for g in outs[1].split(",")]
    assert len(gids_a) == n_each and len(gids_b) == n_each
    assert not (set(gids_a) & set(gids_b))

    from vectorsearch_tpu.config import VectorIndexConfig
    from vectorsearch_tpu.core.index import VectorIndex
    from vectorsearch_tpu.core.persist import DiskStorage

    idx = VectorIndex.create_or_open(VectorIndexConfig(
        storage=DiskStorage(root, fsync=False), name="mw", dimension=8,
        metric="L2", max_segment_size=25, pq_m=4, pq_k=16, graph_degree=16,
        graph_build_breadth=64, local_worker_threads=0,
        local_maintenance_worker_threads=0,
        writer_conflict_policy="concurrent",
    ))
    total = sum(
        s.meta.count for s in idx.store.segments.values() if not s.is_stub
    )
    assert total == 2 * n_each
    for g in (gids_a[0], gids_b[-1]):
        seg_id, vid = idx.resolve_ids([g])[0]
        assert seg_id >= 0
        assert idx.store.segments[seg_id].gids_np[vid] == g
    idx.close()
