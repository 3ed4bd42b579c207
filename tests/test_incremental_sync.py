"""Interleaved add/delete/query stress on one ACTIVE segment: exercises the
incremental host->device sync (row-range uploads + tombstone flips) and the
copy-on-write snapshot isolation."""

import numpy as np

from vectorsearch_tpu.utils.packing import bytes_to_floats, floats_to_bytes

from tests.test_index_e2e import gaussian, make_index


def test_interleaved_adds_queries_deletes(storage, rng):
    idx = make_index(storage, max_segment_size=500)
    x = gaussian(rng, 300)
    gids = []
    for wave in range(10):
        lo, hi = wave * 30, (wave + 1) * 30
        gids.extend(idx.add_all(x[lo:hi]))
        # query between every mutation batch: device mirror must include the
        # freshly appended rows and exclude earlier deletions
        probe = hi - 1
        res = idx.query(x[probe], 1)
        assert res[0].gid == gids[probe], f"wave {wave}"
        if wave % 2 == 1:
            victim = lo  # delete the first row of this wave
            idx.delete(gids[victim])
            res = idx.query(x[victim], 30)
            assert gids[victim] not in [r.gid for r in res]
    # all survivors still findable with exact self-match
    survivors = [g for i, g in enumerate(gids) if idx.resolve_ids([g])[0][0] >= 0]
    assert len(survivors) == 300 - 5
    hits = 0
    for i in range(0, 300, 17):
        if gids[i] not in survivors:
            continue
        if idx.query(x[i], 1)[0].gid == gids[i]:
            hits += 1
    assert hits == len(range(0, 300, 17)) - sum(
        1 for i in range(0, 300, 17) if gids[i] not in survivors
    )
    idx.close()


def test_float_packer_roundtrip(rng):
    v = rng.normal(size=33).astype(np.float32)
    b = floats_to_bytes(v)
    assert len(b) == 132
    back = bytes_to_floats(b)
    assert np.array_equal(v, back)
    # little-endian layout parity
    assert b[:4] == v[0].astype("<f4").tobytes()
    try:
        bytes_to_floats(b"\x00" * 5)
        assert False
    except ValueError:
        pass


def test_vacuum_exists_flips_reach_device_mirror(rng):
    """remove_rows (vacuum) must queue exists flips through the packed
    incremental flag transfer: a stale device exists=True keeps vacuumed rows
    in flat-mode candidate pools forever (ADVICE r3 #2)."""
    from vectorsearch_tpu.core.segment import Segment
    from vectorsearch_tpu.types import SegmentMeta, SegmentState

    seg = Segment(SegmentMeta(0, SegmentState.ACTIVE), capacity=256, dim=8)
    seg.append_rows(
        rng.normal(size=(64, 8)).astype(np.float32), [None] * 64
    )
    _ = seg.exists_dev, seg.alive_dev  # materialize mirrors
    assert bool(np.asarray(seg.exists_dev)[5])
    seg.tombstone(5)
    seg.tombstone(9)
    seg.remove_rows(np.array([5, 9]))  # vacuum path: tombstone then clear
    seg.sync_device()
    exists = np.asarray(seg.exists_dev)
    alive = np.asarray(seg.alive_dev)
    assert not exists[5] and not exists[9]  # pool slots reclaimed on device
    assert not alive[5] and not alive[9]
    assert exists[4] and alive[4]  # neighbors untouched
    # duplicate-id dedup: the last queued write (vacuum's exists=False) must
    # win over the earlier tombstone's exists=True despite a shared scatter
    assert np.array_equal(exists[:64], seg.exists_np[:64])
    assert np.array_equal(alive[:64], seg.alive_np[:64])


def test_background_flag_sync_off_query_path(storage, rng):
    """Deletes must reach the device mirror WITHOUT a query paying the
    transfer: store.notify_flag_sync applies pending flips on a background
    thread (VERDICT r3 #7 — churn syncs off the serving critical path)."""
    import time as _t

    idx = make_index(storage, max_segment_size=500)
    x = gaussian(rng, 100)
    gids = idx.add_all(x)
    idx.query(x[0], 1)  # materialize device mirrors
    seg = idx.store.segments[0]
    idx.delete(gids[7])
    deadline = _t.monotonic() + 5.0
    while _t.monotonic() < deadline:
        with seg._dev_lock:
            if not seg._pending_flag_updates:
                break
        _t.sleep(0.01)
    else:
        raise AssertionError("background flag sync never drained")
    with seg._dev_lock:  # read the mirror directly, no query-path sync
        alive = np.asarray(seg._alive_dev)
    assert not alive[7] and alive[6]
    idx.close()


def test_rotation_schedules_shape_warm(storage, rng):
    """A rotation pre-warms the new segment-set's query programs off the
    caller's thread: the next real query must not be the first to compile
    the changed shapes (r4 probe_cluster_churn: post-change compiles
    produced sub-1k-QPS serving windows)."""
    import time as _t

    from vectorsearch_tpu.utils.metrics import get_registry, reset_for_test

    reset_for_test()
    idx = make_index(storage, max_segment_size=50)
    x = gaussian(rng, 120)
    idx.add_all(x[:30])
    idx.query_batch(x[:4], 5)  # records the warm signature (Q=8 padded)
    before = get_registry().counter_value("vectorsearch.query.count")
    idx.add_all(x[30:])  # crosses the cap twice -> rotations -> warm
    deadline = _t.monotonic() + 10.0
    while _t.monotonic() < deadline:
        if get_registry().counter_value("vectorsearch.query.count") > before:
            break
        _t.sleep(0.02)
    else:
        raise AssertionError("no background shape-warm query ran")
    # warm queries ran the recorded signature, not a caller query
    assert idx._last_query_sig[1] == 5
    idx.close()


def test_no_warm_before_first_query(storage, rng):
    idx = make_index(storage, max_segment_size=40)
    idx.add_all(gaussian(rng, 90))  # rotations but no query yet
    assert idx._last_query_sig is None  # nothing scheduled, no crash
    idx.close()


def test_appends_sync_to_device_in_background(storage, rng):
    """add_all must queue the appended-rows device upload on the background
    syncer — the transfer otherwise lands on the NEXT query batch's
    latency path (r4 deep10m churn lever)."""
    import time as _t

    idx = make_index(storage, max_segment_size=500)
    x = gaussian(rng, 80)
    idx.add_all(x[:40])
    idx.query(x[0], 1)  # materialize mirrors
    idx.add_all(x[40:])  # appended AFTER the mirror exists
    seg = idx.store.segments[0]
    deadline = _t.monotonic() + 5.0
    while _t.monotonic() < deadline:
        with seg._dev_lock:
            if seg._dev_rows >= 80:
                break
        _t.sleep(0.01)
    else:
        raise AssertionError("background append sync never ran")
    with seg._dev_lock:
        # mirror is lane-padded (segment.pad_lane); logical columns only
        vec = np.asarray(seg._vectors_dev)[:80, : x.shape[1]]
    np.testing.assert_allclose(vec, x, rtol=1e-6)
    idx.close()
