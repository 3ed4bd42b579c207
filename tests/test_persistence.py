"""Durability backends: disk round-trip, crash-resume semantics
(the rebuild's explicit checkpoint story per SURVEY.md §5.4)."""

import numpy as np
import pytest

from vectorsearch_tpu.core.persist import DiskStorage, MemoryStorage
from vectorsearch_tpu.types import SegmentState

from tests.test_index_e2e import gaussian, make_index, run_builds


def test_memory_storage_roundtrip():
    s = MemoryStorage()
    s.write_meta("a", {"x": 1})
    assert s.read_meta("a") == {"x": 1}
    s.write_state("a", {"registry": [1, 2]})
    st = s.read_state("a")
    assert st["registry"] == [1, 2]
    st["registry"].append(99)  # mutation must not leak back
    assert s.read_state("a")["registry"] == [1, 2]
    s.write_segment("a", 0, {"v": np.ones((2, 2))}, [b"p"])
    rec = s.read_segment("a", 0)
    assert np.array_equal(rec["arrays"]["v"], np.ones((2, 2)))
    assert rec["payloads"] == [b"p"]
    s.delete_segment("a", 0)
    assert s.read_segment("a", 0) is None
    assert s.list_indexes() == ["a"]
    s.delete_index("a")
    assert s.list_indexes() == []


def test_disk_storage_roundtrip(tmp_path):
    s = DiskStorage(str(tmp_path / "store"))
    s.write_meta("idx/one", {"dimension": 8})
    assert s.read_meta("idx/one") == {"dimension": 8}
    s.write_segment("idx/one", 3, {"v": np.arange(6).reshape(2, 3)}, [b"x", None])
    rec = s.read_segment("idx/one", 3)
    assert np.array_equal(rec["arrays"]["v"], np.arange(6).reshape(2, 3))
    assert rec["payloads"] == [b"x", None]
    s.write_state("idx/one", {"next_gid": 7})
    assert s.read_state("idx/one")["next_gid"] == 7
    assert s.list_indexes() == ["idx/one"]


def test_index_survives_disk_reopen(tmp_path, rng):
    storage = DiskStorage(str(tmp_path / "d"))
    idx = make_index(storage, max_segment_size=30)
    x = gaussian(rng, 50)
    gids = idx.add_all(x)
    run_builds(idx)
    idx.delete(gids[10])
    idx.checkpoint()
    idx.close()

    # "crash" and reopen from a fresh storage object over the same directory
    storage2 = DiskStorage(str(tmp_path / "d"))
    idx2 = make_index(storage2, max_segment_size=30)
    # sealed artifacts restored
    assert idx2.store.segments[0].state == SegmentState.SEALED
    assert idx2.store.segments[0].codebook_np is not None
    # queries work; deleted row stays deleted
    assert idx2.query(x[5], 1)[0].gid == gids[5]
    assert gids[10] not in [r.gid for r in idx2.query(x[10], 50)]
    # gid counter resumes (no reuse)
    new_gid = idx2.add(gaussian(rng, 1)[0])
    assert new_gid == 50
    idx2.close()


def test_interrupted_build_resumes_from_queue(tmp_path, rng):
    """A PENDING segment whose build never ran is re-enqueued on reopen —
    the reference resumes interrupted builds from the FDB queue."""
    storage = DiskStorage(str(tmp_path / "d"))
    idx = make_index(storage, max_segment_size=10)
    x = gaussian(rng, 15)
    idx.add_all(x)  # seg0 -> PENDING, build task enqueued but never run
    idx.checkpoint()
    idx.close()

    idx2 = make_index(storage, max_segment_size=10)
    assert idx2.store.segments[0].state == SegmentState.PENDING
    # recovery: re-enqueue builds for PENDING/WRITING segments found on open
    assert idx2.build_queue.has_visible_unclaimed_tasks()
    run_builds(idx2)
    assert idx2.store.segments[0].state == SegmentState.SEALED
    idx2.close()
